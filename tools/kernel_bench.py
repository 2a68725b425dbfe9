"""Per-kernel throughput bench: golden NumPy vs native C vs device.

The checkasm `bench_new` analogue (reference tests/checkasm/*.c): randomized
inputs, best-of-N timing, per-kernel MP/s.  Run from the repo root:

    PYTHONPATH= JAX_PLATFORMS=cpu python3 tools/kernel_bench.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best_of(fn, reps=5, inner=20):
    best = None
    for _ in range(reps):
        t0 = time.monotonic()
        for _ in range(inner):
            fn()
        dt = (time.monotonic() - t0) / inner
        best = dt if best is None or dt < best else best
    return best


def bench_mc(bd=8):
    from ffvvc_tpu.inter import InterPredictor
    rng = np.random.default_rng(0)
    plane = rng.integers(0, 1 << bd, (272, 480)).astype(np.int32)
    ip = InterPredictor.__new__(InterPredictor)
    ip.bd = bd
    w = h = 16
    n_blocks = 64
    xs = rng.integers(0, 464 - w, n_blocks)
    ys = rng.integers(0, 256 - h, n_blocks)

    def run_c():
        for b in range(n_blocks):
            ip._mc_put(plane, int(xs[b]), int(ys[b]), 7, 9, w, h, True)

    from ffvvc_tpu.native import mc as mcn
    ip._mc_lib = mcn.load_lib()
    t_c = best_of(run_c)
    ip._mc_lib = None
    t_py = best_of(run_c, reps=3, inner=3)
    mp = n_blocks * w * h / 1e6
    print(f"mc_put 8-tap hv {w}x{h}: C {mp/t_c:8.1f} MP/s   "
          f"golden {mp/t_py:8.1f} MP/s   ({t_py/t_c:.0f}x)")

    from ffvvc_tpu.ops.mc_device import mc_put_batch
    fx = np.full(n_blocks, 7)
    fy = np.full(n_blocks, 9)
    mc_put_batch(plane, xs, ys, fx, fy, w, h, True, bd)  # compile
    t_dev = best_of(lambda: mc_put_batch(plane, xs, ys, fx, fy, w, h,
                                         True, bd))
    print(f"mc_put 8-tap hv {w}x{h}: device {mp/t_dev:6.1f} MP/s "
          f"(batched, {os.environ.get('JAX_PLATFORMS', 'ambient')})")


def bench_itx(bd=8):
    from ffvvc_tpu.ops import itx
    rng = np.random.default_rng(1)
    B, n = 64, 32
    import jax
    coeffs = rng.integers(-256, 256, (B, n, n)).astype(np.int32)
    import jax.numpy as jnp
    jc = jnp.asarray(coeffs)
    jax.block_until_ready(itx.itx_batch(jc, n, n, 0, 0, bit_depth=bd))
    t = best_of(lambda: jax.block_until_ready(
        itx.itx_batch(jc, n, n, 0, 0, bit_depth=bd)))
    mp = B * n * n / 1e6
    print(f"itx dct2 {n}x{n} x{B}: device {mp/t:8.1f} MP/s")


def bench_sao(bd=8):
    import types
    from ffvvc_tpu.sao import SaoFilter
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__))))
    from tests.test_device_filters import _fake_ctx  # reuse fixture
    sps, pps, tabs, fb = _fake_ctx(1, W=480, H=272)
    ref = types.SimpleNamespace(planes=[p.copy() for p in fb.planes])
    t_host = best_of(lambda: SaoFilter(sps, pps, tabs, ref).sao_frame(),
                     reps=3, inner=3)
    from ffvvc_tpu.ops.sao_device import sao_frame_device
    sao_frame_device(sps, pps, tabs, fb)
    t_dev = best_of(lambda: sao_frame_device(sps, pps, tabs, fb),
                    reps=3, inner=3)
    mp = 480 * 272 * 1.5 / 1e6
    print(f"sao frame 480x272: host {mp/t_host:6.1f} MP/s   "
          f"device {mp/t_dev:6.1f} MP/s")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    bench_mc()
    bench_itx()
    bench_sao()
