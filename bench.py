"""Decode benchmark: our decoder vs the reference CPU decoder (oracle).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = our fps / reference-C-decoder fps on the same stream
(the reference publishes no numbers of its own — BASELINE.md; the measured
config is BASELINE.md's 1080p all-intra target).

Env knobs: FFVVC_BENCH_SIZE (default "1920x1080"), FFVVC_BENCH_FRAMES (4),
FFVVC_BENCH_QP (30).
"""
import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ORACLE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".refbuild", "ffmpeg")


def main():
    from tools.forge import forge_stream
    from ffvvc_tpu.decoder import VVCDecoder
    from ffvvc_tpu.config import DecoderConfig

    from ffvvc_tpu.pipeline import decode_parallel

    w, h = (int(v) for v in os.environ.get(
        "FFVVC_BENCH_SIZE", "1920x1080").split("x"))
    n_frames = int(os.environ.get("FFVVC_BENCH_FRAMES", "4"))
    qp = int(os.environ.get("FFVVC_BENCH_QP", "30"))
    workers = int(os.environ.get("FFVVC_BENCH_WORKERS", os.cpu_count() or 1))

    # forging a 1080p stream through the Python encoder is minutes of CPU;
    # cache it on disk keyed by the bench parameters
    key = hashlib.sha256(f"v1:{w}x{h}:{n_frames}:{qp}".encode()).hexdigest()
    cache = f"/tmp/ffvvc_bench_{key[:16]}.bit"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            stream = f.read()
    else:
        stream = forge_stream(level=1, seed=0, width=w, height=h, qp=qp,
                              nframes=n_frames)
        with open(cache + ".tmp", "wb") as f:
            f.write(stream)
        os.replace(cache + ".tmp", cache)

    # warm run builds native libs / jit caches / forked-worker state, then
    # best-of-3 timed GOP-parallel decodes (noise-robust on shared hosts)
    decode_parallel(stream, workers=workers)
    best = None
    for _ in range(3):
        t0 = time.monotonic()
        yuvs = decode_parallel(stream, workers=workers)
        dt = time.monotonic() - t0
        best = dt if best is None or dt < best else best
    ours_fps = len(yuvs) / best
    ours_yuv = b"".join(yuvs)

    # reference decode timing (if the oracle is built)
    vs_baseline = 0.0
    if os.path.exists(ORACLE):
        bit, yuv = "/tmp/bench.bit", "/tmp/bench_ref.yuv"
        with open(bit, "wb") as f:
            f.write(stream)
        ref_best = None
        for _ in range(3):
            t0 = time.monotonic()
            subprocess.run([ORACLE, "-hide_banner", "-loglevel", "error",
                            "-f", "vvc", "-i", bit, "-f", "rawvideo", "-y",
                            yuv], check=True)
            dt = time.monotonic() - t0
            ref_best = dt if ref_best is None or dt < ref_best else ref_best
        ref_fps = len(yuvs) / ref_best
        with open(yuv, "rb") as f:
            assert f.read() == ours_yuv, "bench decode NOT bit-exact vs oracle"
        vs_baseline = ours_fps / ref_fps

    print(json.dumps({"metric": "decode_fps", "value": round(ours_fps, 4),
                      "unit": "frames/sec/chip",
                      "vs_baseline": round(vs_baseline, 4)}))


if __name__ == "__main__":
    main()
