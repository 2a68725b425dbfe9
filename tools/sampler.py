"""Symbolize tools/sampler.c output: map sampled PCs to functions.

Usage: python3 tools/sampler.py [/tmp/samples.txt /tmp/samples.maps]
Prints a sorted per-function sample histogram (our .so files get full
symbol resolution via nm; everything else aggregates per mapped file)."""
import bisect
import collections
import os
import subprocess
import sys


def load_maps(path):
    regions = []
    for line in open(path):
        parts = line.split()
        if len(parts) < 6 or "x" not in parts[1]:
            continue
        lo, hi = (int(v, 16) for v in parts[0].split("-"))
        off = int(parts[2], 16)
        regions.append((lo, hi, off, parts[5]))
    regions.sort()
    return regions


def nm_symbols(lib):
    syms = []
    try:
        out = subprocess.run(["nm", "--defined-only", "-n", lib],
                             capture_output=True, text=True).stdout
    except Exception:
        return syms
    for line in out.splitlines():
        parts = line.split()
        if len(parts) == 3 and parts[1] in ("t", "T"):
            syms.append((int(parts[0], 16), parts[2]))
    return syms


def main():
    samples = sys.argv[1] if len(sys.argv) > 1 else "/tmp/samples.txt"
    maps = sys.argv[2] if len(sys.argv) > 2 else "/tmp/samples.maps"
    regions = load_maps(maps)
    starts = [r[0] for r in regions]
    nm_cache = {}
    hist = collections.Counter()
    total = 0
    for line in open(samples):
        pc = int(line, 16)
        total += 1
        i = bisect.bisect_right(starts, pc) - 1
        if i < 0 or pc >= regions[i][1]:
            hist["<unmapped>"] += 1
            continue
        lo, hi, off, lib = regions[i]
        name = os.path.basename(lib)
        if lib.endswith(".so") and ("vvc" in name or "ffvvc" in name):
            if lib not in nm_cache:
                nm_cache[lib] = nm_symbols(lib)
            syms = nm_cache[lib]
            addr = pc - lo + off
            j = bisect.bisect_right([a for a, _ in syms], addr) - 1
            sym = syms[j][1] if j >= 0 else "?"
            hist[f"{name}:{sym}"] += 1
        else:
            hist[name] += 1
    for name, n in hist.most_common(40):
        print(f"{n:8d} {100.0 * n / max(total, 1):5.1f}% {name}")
    print(f"{total:8d} total")


if __name__ == "__main__":
    main()
