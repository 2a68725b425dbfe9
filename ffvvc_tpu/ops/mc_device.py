"""Device inter MC: batched 8-tap (luma) / 4-tap (chroma) fractional-sample
interpolation over same-size block batches.

TPU-first formulation of the reference's hottest kernels
(/root/reference/libavcodec/x86/h26x/h2656_inter.asm wrapped at
x86/vvc/vvcdsp_init.c:34-171): instead of one call per block, all MC jobs of
one (w, h, is_luma, frac-class) bucket are a single batched XLA launch —
clamped gather of the (h+taps-1, w+taps-1) windows, then separable taps as
two small contractions.  Integer math only (int32), bit-exact vs the host
golden (inter.py _mc_put), pinned by tests/test_device_mc.py.

Decoder integration mirrors ops/itx.py's cost-based dispatch (regular
non-DMVR blocks batched per frame); DMVR/BDOF refinement stays on host.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache()
def _filter_banks():
    from . import data as D
    t = D.tables()
    return (jnp.asarray(t["luma_filters"].astype(np.int32)),
            jnp.asarray(t["chroma_filters"].astype(np.int32)))


@functools.partial(jax.jit,
                   static_argnames=("w", "h", "is_luma", "bd", "fclass"))
def _mc_put_batch(ref, xs, ys, hf, vf, w: int, h: int, is_luma: bool,
                  bd: int, fclass: int):
    """Batched put: ref [H, W] int32; xs/ys [B] block origins (integer-pel,
    already including mv>>4); hf/vf [B, taps] filter rows.  fclass selects
    the put variant (0: copy, 1: h only, 2: v only, 3: hv) — the
    put[..][!!my][!!mx] grid of vvcdsp.h:49.  Returns [B, h, w] int32 in the
    14-bit intermediate domain."""
    H, W = ref.shape
    taps = 8 if is_luma else 4
    eb = 3 if is_luma else 1

    def gather(x0s, y0s, gw, gh):
        gx = jnp.clip(x0s[:, None] + jnp.arange(gw)[None, :], 0, W - 1)
        gy = jnp.clip(y0s[:, None] + jnp.arange(gh)[None, :], 0, H - 1)
        return ref[gy[:, :, None], gx[:, None, :]]   # [B, gh, gw]

    if fclass == 0:
        return gather(xs, ys, w, h) << (14 - bd)
    if fclass == 1:
        src = gather(xs - eb, ys, w + taps - 1, h)
        acc = jnp.zeros((xs.shape[0], h, w), jnp.int32)
        for k in range(taps):
            acc = acc + src[:, :, k:k + w] * hf[:, k, None, None]
        return acc >> (bd - 8)
    if fclass == 2:
        src = gather(xs, ys - eb, w, h + taps - 1)
        acc = jnp.zeros((xs.shape[0], h, w), jnp.int32)
        for k in range(taps):
            acc = acc + src[:, k:k + h, :] * vf[:, k, None, None]
        return acc >> (bd - 8)
    src = gather(xs - eb, ys - eb, w + taps - 1, h + taps - 1)
    tmp = jnp.zeros((xs.shape[0], h + taps - 1, w), jnp.int32)
    for k in range(taps):
        tmp = tmp + src[:, :, k:k + w] * hf[:, k, None, None]
    tmp = tmp >> (bd - 8)
    acc = jnp.zeros((xs.shape[0], h, w), jnp.int32)
    for k in range(taps):
        acc = acc + tmp[:, k:k + h, :] * vf[:, k, None, None]
    return acc >> 6


@functools.partial(jax.jit, static_argnames=("bd",))
def _mc_avg_batch(s0, s1, bd: int):
    """Bi-prediction average: [B, h, w] 14-bit pair -> pixels."""
    shift = max(3, 15 - bd)
    off = 1 << (shift - 1)
    return jnp.clip((s0 + s1 + off) >> shift, 0, (1 << bd) - 1)


@functools.partial(jax.jit, static_argnames=("bd",))
def _mc_uni_batch(val, bd: int):
    shift = 14 - bd
    off = 1 << (shift - 1)
    return jnp.clip((val + off) >> shift, 0, (1 << bd) - 1)


def mc_put_batch(ref_plane, xs, ys, frac_x, frac_y, w, h, is_luma, bd,
                 hf_idx=0, vf_idx=0):
    """Host-facing batched put for one (w, h, frac-class) bucket.

    ref_plane: np.int32 [H, W]; xs/ys/frac_x/frac_y: np arrays [B].
    All blocks in a call share bool(frac_x) / bool(frac_y) (the caller
    buckets by frac-class); per-block fractional phases may differ.
    Returns np.int32 [B, h, w] (14-bit domain)."""
    lf, cf = _filter_banks()
    bank = lf[hf_idx] if is_luma else cf[hf_idx]
    bankv = lf[vf_idx] if is_luma else cf[vf_idx]
    fclass = (1 if frac_x.any() else 0) | (2 if frac_y.any() else 0)
    hf = bank[jnp.asarray(frac_x)]
    vf = bankv[jnp.asarray(frac_y)]
    out = _mc_put_batch(jnp.asarray(ref_plane), jnp.asarray(xs),
                        jnp.asarray(ys), hf, vf, int(w), int(h),
                        bool(is_luma), int(bd), int(fclass))
    return np.asarray(out)


def mc_avg_batch(s0, s1, bd):
    return np.asarray(_mc_avg_batch(jnp.asarray(s0), jnp.asarray(s1),
                                    int(bd)))


def mc_uni_batch(val, bd):
    return np.asarray(_mc_uni_batch(jnp.asarray(val), int(bd)))


# ---- decoder-side batched dispatch (ops/itx.py cost-dispatch analogue) -----

PF_L0, PF_L1, PF_BI = 1, 2, 3


def frame_device_mc(native_jobs, sps, bd):
    """Whole-frame batched device MC for the simple regular blocks of every
    native inter job; complex blocks (affine/GPM/CIIP/DMVR/BDOF, weighted,
    BCW, LMCS, wraparound) run the host C path inside the same collect call
    (native/vvc_inter.c inter_ctus_dev).

    native_jobs: [(NativeRecon, ctus)].  Puts batch per (ref plane, size,
    filter class); the uni/bi finals batch per size."""
    descs = []
    rpls = []
    for tag, (nr, ctus) in enumerate(native_jobs):
        d = nr.predict_inter_ctus_dev(ctus, tag)
        rpls.append(nr.rpl)
        if len(d):
            descs.append(d)
    if not descs:
        return
    D = np.concatenate(descs)
    nc = 3 if sps.chroma_format_idc else 1
    hs, vs = (sps.hshift[1], sps.vshift[1]) if nc > 1 else (0, 0)

    put_buckets = {}      # key -> dict(plane, xs, ys, fx, fy, out slots)
    entries = []          # (desc_i, c_idx, hyps=[(bucket_key, idx)], dst)

    def add_put(plane, xi, yi, fx, fy, w, h, is_luma, hf_idx):
        key = (id(plane), w, h, is_luma, hf_idx, fx != 0 or None,
               fy != 0 or None)
        # bucket by actual frac class so fclass is uniform per launch
        key = (id(plane), w, h, is_luma, hf_idx, bool(fx), bool(fy))
        b = put_buckets.get(key)
        if b is None:
            b = put_buckets[key] = {"plane": plane, "xs": [], "ys": [],
                                    "fx": [], "fy": [], "w": w, "h": h,
                                    "is_luma": is_luma, "hf": hf_idx}
        b["xs"].append(xi)
        b["ys"].append(yi)
        b["fx"].append(fx)
        b["fy"].append(fy)
        return (key, len(b["xs"]) - 1)

    for di in range(len(D)):
        x0, y0, w, h, pf, r0, r1, mx0, my0, mx1, my1, hpel, tag = \
            (int(v) for v in D[di])
        rpl = rpls[tag]
        hyps = [0] if pf == PF_L0 else [1] if pf == PF_L1 else [0, 1]
        for c in range(nc):
            chs, cvs = (0, 0) if c == 0 else (hs, vs)
            wc, hc = w >> chs, h >> cvs
            slots = []
            for lx in hyps:
                ref = rpl[lx].frames[[r0, r1][lx]].buffer.planes[c]
                mvx, mvy = (mx0, my0) if lx == 0 else (mx1, my1)
                if c == 0:
                    fx, fy = mvx & 15, mvy & 15
                    xi = x0 + (mvx >> 4)
                    yi = y0 + (mvy >> 4)
                    hf_idx = hpel
                else:
                    fx = (mvx & ((1 << (4 + chs)) - 1)) << (1 - chs)
                    fy = (mvy & ((1 << (4 + cvs)) - 1)) << (1 - cvs)
                    xi = (x0 >> chs) + (mvx >> (4 + chs))
                    yi = (y0 >> cvs) + (mvy >> (4 + cvs))
                    hf_idx = 0
                slots.append(add_put(ref, xi, yi, fx, fy, wc, hc,
                                     c == 0, hf_idx))
            entries.append((tag, c, x0 >> chs, y0 >> cvs, wc, hc, slots))

    vals = {}
    for key, b in put_buckets.items():
        vals[key] = mc_put_batch(
            b["plane"], np.asarray(b["xs"], np.int32),
            np.asarray(b["ys"], np.int32), np.asarray(b["fx"], np.int32),
            np.asarray(b["fy"], np.int32), b["w"], b["h"], b["is_luma"],
            bd, b["hf"], b["hf"])

    # finals: batch uni/bi combines per block size
    finals = {}           # (w, h, is_bi) -> ([s0], [s1]|None, [writeback])
    for tag, c, xc, yc, wc, hc, slots in entries:
        dstplane = native_jobs[tag][0].fb.planes[c]
        if len(slots) == 1:
            k, i = slots[0]
            f = finals.setdefault((wc, hc, False), ([], None, []))
            f[0].append(vals[k][i])
            f[2].append((dstplane, xc, yc))
        else:
            (k0, i0), (k1, i1) = slots
            f = finals.setdefault((wc, hc, True), ([], [], []))
            f[0].append(vals[k0][i0])
            f[1].append(vals[k1][i1])
            f[2].append((dstplane, xc, yc))
    for (wc, hc, is_bi), (s0, s1, wbs) in finals.items():
        if is_bi:
            out = mc_avg_batch(np.stack(s0), np.stack(s1), bd)
        else:
            out = mc_uni_batch(np.stack(s0), bd)
        for i, (plane, xc, yc) in enumerate(wbs):
            plane[yc:yc + hc, xc:xc + wc] = out[i]
