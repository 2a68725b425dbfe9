"""Decode benchmark: our decoder vs the reference CPU decoder (oracle).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = our fps / reference-C-decoder fps on the same stream
(the reference publishes no numbers of its own — BASELINE.md).

Env knobs: FFVVC_BENCH_SIZE (default "256x256"), FFVVC_BENCH_FRAMES (2),
FFVVC_BENCH_QP (27).
"""
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
        "FFVVC_BENCH_SIZE", "256x256").split("x"))
    n_frames = int(os.environ.get("FFVVC_BENCH_FRAMES", "8"))
    qp = int(os.environ.get("FFVVC_BENCH_QP", "27"))
    workers = int(os.environ.get("FFVVC_BENCH_WORKERS", os.cpu_count() or 1))

    stream = forge_stream(level=1, seed=0, width=w, height=h, qp=qp,
                          nframes=n_frames)

    # warm run builds native libs / jit caches / forked-worker state, then a
    # timed GOP-parallel decode (host pipeline P1; device itx auto-dispatch)
    decode_parallel(stream, workers=workers)
    t0 = time.monotonic()
    yuvs = decode_parallel(stream, workers=workers)
    t1 = time.monotonic()
    ours_fps = len(yuvs) / (t1 - t0)
    ours_yuv = b"".join(yuvs)

    # reference decode timing (if the oracle is built)
    vs_baseline = 0.0
    if os.path.exists(ORACLE):
        bit, yuv = "/tmp/bench.bit", "/tmp/bench_ref.yuv"
        with open(bit, "wb") as f:
            f.write(stream)
        t0 = time.monotonic()
        subprocess.run([ORACLE, "-hide_banner", "-loglevel", "error",
                        "-f", "vvc", "-i", bit, "-f", "rawvideo", "-y", yuv],
                       check=True)
        t1 = time.monotonic()
        ref_fps = len(yuvs) / (t1 - t0)
        with open(yuv, "rb") as f:
            assert f.read() == ours_yuv, "bench decode NOT bit-exact vs oracle"
        vs_baseline = ours_fps / ref_fps

    print(json.dumps({"metric": "decode_fps", "value": round(ours_fps, 4),
                      "unit": "frames/sec/chip",
                      "vs_baseline": round(vs_baseline, 4)}))


if __name__ == "__main__":
    main()
