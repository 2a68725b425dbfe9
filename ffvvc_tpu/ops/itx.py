"""TPU batched inverse transforms + residual add.

TPU-first design: the host CABAC front-end emits per-TB coefficient blocks;
blocks are bucketed by (w, h, trh, trv) and each bucket is inverse-transformed
as ONE batched matmul pair (column pass then row pass) — large, static-shape
matmuls that XLA tiles onto the MXU.  Integer exactness on the MXU comes from
the hi/lo split trick: coefficients are split into two <=8-bit halves so every
f32 product/accumulation stays within the 24-bit exact-integer range.

Reference analogue: the function-pointer itx grid of
/root/reference/libavcodec/vvc/vvcdsp.c:94-140 (itx_2d/itx_1d) and the
hand-unrolled 1-D transforms of vvc_itx_1d.c — here one batched kernel per
bucket instead of per-TB scalar calls.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from . import data as D

# NOTE: the persistent compilation cache is configured ONCE by
# ffvvc_tpu/ops/__init__.py (machine-keyed dir, skipped on the forced-CPU
# backend).  A second unconditional config here once overrode it with an
# UNKEYED dir shared across machine hops — foreign CPU-AOT entries then
# SIGSEGV'd in deserialize_executable mid-suite.  Don't re-add.

DCT2, DST7, DCT8 = 0, 1, 2
_MATS = {DCT2: D.dct2_matrix, DST7: D.dst7_matrix, DCT8: D.dct8_matrix}


@functools.lru_cache()
def matrix(kind: int, n: int) -> np.ndarray:
    return _MATS[kind](n)


def _exact_int_matmul(a_i32, b_i32):
    """Exact integer matmul on MXU via hi/lo 8-bit split of `a`.

    a: [..., m, k] int32 with |a| < 2^20; b: [..., k, n] int32 with |b| <= 128.
    Split a = hi*4096 + lo (each half < 2^12 magnitude): products with b fit
    in 2^19, sums of <=64 terms fit 2^25... to stay strictly exact we split
    into 12-bit halves and rely on float32 exactness up to 2^24 per partial
    sum — with k <= 64 and |half| < 2^12, |b| <= 128: 2^12*2^7*2^6 = 2^25.
    That overflows; so split into 8-bit halves against 2^7 b: 2^7*2^7*2^6 =
    2^20 — exact.  a may need three 8-bit limbs for 20-bit inputs.
    """
    a = a_i32.astype(jnp.int32)
    b = b_i32.astype(jnp.float32)
    # three 8-bit limbs cover |a| < 2^24
    l0 = (a & 0xFF).astype(jnp.float32)
    l1 = ((a >> 8) & 0xFF).astype(jnp.float32)
    l2 = (a >> 16).astype(jnp.float32)  # signed top limb
    m0 = jnp.matmul(l0, b, preferred_element_type=jnp.float32)
    m1 = jnp.matmul(l1, b, preferred_element_type=jnp.float32)
    m2 = jnp.matmul(l2, b, preferred_element_type=jnp.float32)
    return (m0.astype(jnp.int64) + (m1.astype(jnp.int64) << 8) +
            (m2.astype(jnp.int64) << 16))


def _int_matmul(a, b):
    """Integer matmul; XLA lowers s32 dots on TPU correctly (may not use the
    MXU).  Kept as the simple reference path; _exact_int_matmul is the
    MXU-exact fast path."""
    return jax.lax.dot_general(
        a.astype(jnp.int32), b.astype(jnp.int32),
        dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def itx_batch(coeffs, w: int, h: int, trh: int, trv: int,
              log2_range: int = 15, bit_depth: int = 8):
    """Inverse 2-D transform of a batch of TBs: coeffs [B, h, w] int32 ->
    residual [B, h, w] int32.  Matches itx_2d (vvcdsp.c:94) bit-exactly.

    The transform matrices are traced arguments, so XLA specializes only on
    (w, h, B) shapes, not on transform type."""
    mv = jnp.asarray(matrix(trv, h), dtype=jnp.int32)
    mh = jnp.asarray(matrix(trh, w), dtype=jnp.int32)
    return _itx_batch_m(coeffs, mv, mh, w, h, log2_range, bit_depth)


@functools.partial(jax.jit, static_argnames=("w", "h",
                                             "log2_range", "bit_depth"))
def _itx_batch_m(coeffs, mv, mh, w: int, h: int,
                 log2_range: int = 15, bit_depth: int = 8):
    shift0 = 7
    shift1 = 5 + log2_range - bit_depth
    lo = -(1 << log2_range)
    hi = (1 << log2_range) - 1
    c = coeffs.astype(jnp.int32)
    if w == 1 or h == 1:
        shift = 6 + log2_range - bit_depth
        add = 1 << (shift - 1)
        if w > 1:
            t = _int_matmul(c[:, 0, :], mh)
            out = ((t + add) >> shift)[:, None, :]
        else:
            t = _int_matmul(c[:, :, 0], mv)
            out = ((t + add) >> shift)[:, :, None]
        return out.astype(jnp.int32)
    # column pass: tmp[b, y, x] = sum_k mv[k, y] * c[b, k, x]
    tmp = jax.lax.dot_general(
        c, mv, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)      # [B, w, h] (x, y)
    tmp = jnp.clip((tmp + (1 << (shift0 - 1))) >> shift0, lo, hi)
    # row pass: out[b, y, x] = sum_k tmp[b, k(y-axis)... ] @ mh
    out = jax.lax.dot_general(
        tmp, mh, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)      # [B, h, w]
    out = (out + (1 << (shift1 - 1))) >> shift1
    return out.astype(jnp.int32)


def itx_batch_host(coeffs, w: int, h: int, trh: int, trv: int,
                   log2_range: int = 15, bit_depth: int = 8):
    """Host (NumPy) twin of itx_batch, bit-identical.  Used when the device
    interconnect is too slow to pay for the round trip (measured at init) —
    e.g. a remote-tunneled chip; a locally attached TPU always takes the
    device path."""
    mv = matrix(trv, h).astype(np.int64)
    mh = matrix(trh, w).astype(np.int64)
    shift0 = 7
    shift1 = 5 + log2_range - bit_depth
    lo, hi = -(1 << log2_range), (1 << log2_range) - 1
    c = coeffs.astype(np.int64)
    if w == 1 or h == 1:
        shift = 6 + log2_range - bit_depth
        add = 1 << (shift - 1)
        if w > 1:
            t = c[:, 0, :] @ mh
            return ((t + add) >> shift)[:, None, :].astype(np.int32)
        t = c[:, :, 0] @ mv
        return ((t + add) >> shift)[:, :, None].astype(np.int32)
    tmp = np.tensordot(c, mv, axes=([1], [0]))         # [B, w, h]
    tmp = np.clip((tmp + (1 << (shift0 - 1))) >> shift0, lo, hi)
    out = np.tensordot(tmp, mh, axes=([1], [0]))       # [B, h, w]
    out = (out + (1 << (shift1 - 1))) >> shift1
    return out.astype(np.int32)


_PROBE = {"state": None, "ms": float("inf")}


def device_roundtrip_ms(timeout: float = 5.0) -> float:
    """Measured host->device->host latency for a small buffer: the dispatch
    cost model deciding device vs host itx (FFVVC_ITX=device|host|auto).

    The probe jit runs on a daemon thread with a timeout: on a cold
    machine a remote (tunneled) XLA compile can take minutes, and the
    dispatch decision must not stall the decode — until the probe answers,
    callers see inf (host path); once it lands, the real latency sticks."""
    import time
    import threading

    st = _PROBE["state"]
    if st is None:
        done = threading.Event()

        def probe():
            try:
                x = np.zeros((64, 64), np.int32)
                f = jax.jit(lambda a: a + 1)
                np.asarray(f(jnp.asarray(x)))   # warm compile + transfer
                t0 = time.monotonic()
                np.asarray(f(jnp.asarray(x)))
                _PROBE["ms"] = (time.monotonic() - t0) * 1000.0
            except Exception:
                pass
            done.set()

        threading.Thread(target=probe, daemon=True,
                         name="ffvvc-itx-probe").start()
        _PROBE["state"] = done
        st = done
    st.wait(timeout)
    return _PROBE["ms"]


def _use_device_itx() -> bool:
    mode = os.environ.get("FFVVC_ITX", "auto")
    if mode == "device":
        return True
    if mode == "host":
        return False
    return device_roundtrip_ms() < 2.0


def dequant_batch(coeffs, scales, bd_shift, log2_range=15):
    """Batched dequant: coeffs [B,h,w] int32, scales [B] int32 (scale*scale_m),
    bd_shift [B] int32.  Matches scale_coeff (vvc_intra.c:389)."""
    c = coeffs.astype(jnp.int64) * scales[:, None, None].astype(jnp.int64)
    off = (jnp.int64(1) << (bd_shift - 1))[:, None, None]
    c = (c + off) >> bd_shift[:, None, None]
    lo = -(1 << log2_range)
    hi = (1 << log2_range) - 1
    return jnp.clip(c, lo, hi).astype(jnp.int32)


def scatter_residual(frame, residuals, xs, ys, w, h, pixel_max):
    """Add a bucket of residual blocks into the frame plane at (xs, ys).

    frame [H, W] int32; residuals [B, h, w]; xs/ys [B] int32 block origins.
    Uses one scatter-add (all blocks in a bucket are disjoint).
    """
    B = residuals.shape[0]
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1))
    idx = jnp.stack([ys, xs], axis=1)
    out = jax.lax.scatter_add(frame, idx, residuals, dn,
                              indices_are_sorted=False, unique_indices=True)
    return jnp.clip(out, 0, pixel_max)


def frame_device_residuals(recon_jobs, tabs, bit_depth: int):
    """Batched inverse transform of every TB in a parsed frame.

    Host prep (BDPCM/dequant/LFNST/type decision) runs per TB via the job's
    Reconstructor, then TBs are bucketed by (w, h, trh, trv, log2_range) and
    each bucket is one itx_batch launch.  TBs come back with tb.coeffs set to
    the final residual (tb.residual_ready), so the sequential intra recon
    only adds them.  Replaces per-TB scalar itx calls of the reference
    (vvcdsp.c:94-140) with one batched MXU matmul pair per bucket."""
    buckets = {}
    for rec, ctus in recon_jobs:
        for rs, _rx, _ry in ctus:
            for cu in tabs.cus[rs]:
                for tu in cu.tus:
                    for tb in tu.tbs:
                        if not tb.has_coeffs or \
                                getattr(tb, "residual_ready", False) or \
                                getattr(tb, "itx_queued", False):
                            continue
                        r = rec.prepare_tb_for_itx(cu, tu, tb)
                        if r is None:
                            continue  # transform-skip: residual already final
                        trh, trv, l2r = r
                        key = (tb.w, tb.h, trh, trv, l2r)
                        buckets.setdefault(key, []).append(tb)
                        tb.itx_queued = True
    # launch every bucket asynchronously (jax dispatch), sync once at the
    # end — avoids serializing on per-bucket device round trips.  Batch
    # sizes are padded to powers of two to bound shape specializations.
    use_device = _use_device_itx()
    launched = []
    for (w, h, trh, trv, l2r), tbs in buckets.items():
        coeffs = np.stack([t.coeffs for t in tbs]).astype(np.int32)
        if not use_device:
            launched.append((tbs, itx_batch_host(coeffs, w, h, trh, trv,
                                                 log2_range=l2r,
                                                 bit_depth=bit_depth)))
            continue
        B = coeffs.shape[0]
        Bp = 1 << max(B - 1, 0).bit_length() if B > 1 else 1
        if Bp != B:
            coeffs = np.concatenate(
                [coeffs, np.zeros((Bp - B, h, w), np.int32)])
        out = itx_batch(coeffs, w, h, trh, trv,
                        log2_range=l2r, bit_depth=bit_depth)
        launched.append((tbs, out))
    for tbs, out in launched:
        res = np.asarray(out)
        for i, t in enumerate(tbs):
            t.coeffs = res[i].astype(np.int64)
            t.residual_ready = True
