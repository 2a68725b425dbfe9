"""Mesh-sharded in-loop filters: real decoded frames over a (gop, tile) mesh.

TPU-native replacement for the reference's cross-frame/cross-row concurrency
engine (/root/reference/libavcodec/vvc/vvc_thread.c:41-51 task stencil +
vvc_refs.c:532-565 row-progress listeners): instead of per-CTU tasks with
row-progress pub/sub, whole-frame filter passes run as one shard_map over a
jax.sharding.Mesh —

  * "gop"  axis: independent frames (the reference's 16-deep frame pipeline,
    vvcdec.c:830-841) decode their pixel passes on different devices;
  * "tile" axis: CTU-row slabs of each frame (the reference's CTU wavefront)
    on different devices, with the 1-pixel SAO neighbour ring crossing slab
    boundaries via jax.lax.ppermute over ICI (the collective form of the
    sao_pixel_buffer_h/v line buffers, vvc_filter.c:123-152).

ALF/CC-ALF tap planes are host-gathered per pixel (ops/alf_device.py), so
those passes are purely elementwise and shard with no halo at all.

All passes are bit-exact vs the host golden filters; VVCDecoder uses them
when `DecoderConfig.mesh_shape` spans more than one device (decoder.py
filter stage), with frame batching across all-intra runs and per-frame
drains at inter reference barriers.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .mesh import exchange_row_halo
from ..ops.sao_device import _sao_math
from ..ops.alf_device import _alf_math, _cc_math


def make_mesh_exact(shape, devices=None) -> Mesh:
    """("gop", "tile") mesh with exactly the requested shape."""
    g, t = shape
    if devices is None:
        devices = jax.devices()
    if g * t > len(devices):
        raise ValueError(f"mesh_shape {shape} needs {g * t} devices, "
                         f"have {len(devices)}")
    return Mesh(np.array(devices[:g * t]).reshape(g, t), ("gop", "tile"))


# jit cache: (id-key of mesh, kind, shapes/consts) -> compiled fn
_CACHE = {}


def _pad_rows(a, t, mode):
    """Pad axis -2 up to a multiple of t ('edge' for pixels so the bottom
    halo replicates the true frame edge; zeros for parameter maps)."""
    h = a.shape[-2]
    ph = (-h) % t
    if not ph:
        return a, h
    pad = [(0, 0)] * a.ndim
    pad[-2] = (0, ph)
    return np.pad(a, pad, mode=mode), h


def _pad_frames(arrs, g):
    """Pad the leading frame axis of each array to a multiple of g with
    zeros (zero maps are exact filter identities)."""
    f = arrs[0].shape[0]
    pf = (-f) % g
    if not pf:
        return arrs, f
    out = []
    for a in arrs:
        pad = [(0, 0)] * a.ndim
        pad[0] = (0, pf)
        out.append(np.pad(a, pad))
    return out, f


def _sao_fn(mesh, F, H, W, shift, pix_max):
    key = (id(mesh), "sao", F, H, W, shift, pix_max)
    fn = _CACHE.get(key)
    if fn is not None:
        return fn
    t = mesh.shape["tile"]

    def one(src, typ, m1, offs, keep, above, below, idx):
        # src [h, W] pre-SAO slab; halo rows from vertical slab neighbours
        # (frame edges replicate the border row, matching np.pad edge mode)
        top = jnp.where(idx == 0, src[:1], above)
        bot = jnp.where(idx == t - 1, src[-1:], below)
        tall = jnp.concatenate([top, src, bot], axis=0)
        pad = jnp.concatenate([tall[:, :1], tall, tall[:, -1:]], axis=1)
        return _sao_math(pad, typ, m1, offs, keep, shift, pix_max)

    def local(src, typ, m1, offs, keep):
        above, below = exchange_row_halo(src, 1, t)
        idx = jax.lax.axis_index("tile")
        return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0, None))(
            src, typ, m1, offs, keep, above, below, idx)

    fn = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("gop", "tile", None), P("gop", "tile", None),
                  P("gop", "tile", None), P("gop", None, "tile", None),
                  P("gop", "tile", None)),
        out_specs=P("gop", "tile", None)))
    _CACHE[key] = fn
    return fn


def _alf_fn(mesh, F, H, W, pix_max):
    key = (id(mesh), "alf", F, H, W, pix_max)
    fn = _CACHE.get(key)
    if fn is not None:
        return fn

    def local(cur, v0, v1, cf, cl, vb):
        return jax.vmap(
            lambda c, a, b, f, l, v: _alf_math(c, a, b, f, l, v, pix_max))(
            cur, v0, v1, cf, cl, vb)

    fn = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("gop", "tile", None), P("gop", None, "tile", None),
                  P("gop", None, "tile", None), P("gop", None, "tile", None),
                  P("gop", None, "tile", None), P("gop", "tile", None)),
        out_specs=P("gop", "tile", None)))
    _CACHE[key] = fn
    return fn


def _cc_fn(mesh, F, H, W, half, pix_max):
    key = (id(mesh), "cc", F, H, W, half, pix_max)
    fn = _CACHE.get(key)
    if fn is not None:
        return fn

    def local(dst, curl, v, cf):
        return jax.vmap(
            lambda d, c, vv, f: _cc_math(d, c, vv, f, half, pix_max))(
            dst, curl, v, cf)

    fn = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("gop", "tile", None), P("gop", "tile", None),
                  P("gop", None, "tile", None), P("gop", None, "tile", None)),
        out_specs=P("gop", "tile", None)))
    _CACHE[key] = fn
    return fn


def sao_batch_sharded(mesh, src, typ, m1, offs, keep, shift, pix_max):
    """Batched sharded SAO: src/typ/m1/keep [F, H, W] np.int32, offs
    [F, 5, H, W].  Frames shard over "gop", row slabs over "tile"; the
    1-row neighbour halo rides a ppermute.  Returns filtered [F, H, W]."""
    g, t = mesh.shape["gop"], mesh.shape["tile"]
    src, H = _pad_rows(src, t, "edge")
    typ, _ = _pad_rows(typ, t, "constant")
    m1, _ = _pad_rows(m1, t, "constant")
    offs, _ = _pad_rows(offs, t, "constant")
    keep, _ = _pad_rows(keep, t, "constant")
    (src, typ, m1, offs, keep), F = _pad_frames(
        [src, typ, m1, offs, keep], g)
    fn = _sao_fn(mesh, src.shape[0], src.shape[1], src.shape[2],
                 shift, pix_max)
    out = fn(jnp.asarray(src), jnp.asarray(typ), jnp.asarray(m1),
             jnp.asarray(offs), jnp.asarray(keep))
    return np.asarray(out)[:F, :H]


def alf_batch_sharded(mesh, cur, v0, v1, cf, cl, vb, pix_max):
    """Batched sharded ALF: cur/vb [F, H, W], v0/v1/cf/cl [F, 12, H, W].
    Taps are host-gathered so the pass is elementwise (no halo)."""
    g, t = mesh.shape["gop"], mesh.shape["tile"]
    cur, H = _pad_rows(cur, t, "constant")
    v0, _ = _pad_rows(v0, t, "constant")
    v1, _ = _pad_rows(v1, t, "constant")
    cf, _ = _pad_rows(cf, t, "constant")
    cl, _ = _pad_rows(cl, t, "constant")
    vb, _ = _pad_rows(vb, t, "constant")
    # zero clip bound would clamp tap diffs to 0 on padded rows — harmless
    # (cf is zero there too), but keep cl >= 1 to mirror the rasterizer
    (cur, v0, v1, cf, cl, vb), F = _pad_frames([cur, v0, v1, cf, cl, vb], g)
    fn = _alf_fn(mesh, cur.shape[0], cur.shape[1], cur.shape[2], pix_max)
    out = fn(jnp.asarray(cur), jnp.asarray(v0), jnp.asarray(v1),
             jnp.asarray(cf), jnp.asarray(cl), jnp.asarray(vb))
    return np.asarray(out)[:F, :H]


def cc_batch_sharded(mesh, dst, curl, v, cf, half, pix_max):
    """Batched sharded CC-ALF: dst/curl [F, H, W], v/cf [F, 7, H, W]."""
    g, t = mesh.shape["gop"], mesh.shape["tile"]
    dst, H = _pad_rows(dst, t, "constant")
    curl, _ = _pad_rows(curl, t, "constant")
    v, _ = _pad_rows(v, t, "constant")
    cf, _ = _pad_rows(cf, t, "constant")
    (dst, curl, v, cf), F = _pad_frames([dst, curl, v, cf], g)
    fn = _cc_fn(mesh, dst.shape[0], dst.shape[1], dst.shape[2],
                half, pix_max)
    out = fn(jnp.asarray(dst), jnp.asarray(curl), jnp.asarray(v),
             jnp.asarray(cf))
    return np.asarray(out)[:F, :H]


class MeshFilterQueue:
    """Deferred mesh filtering of decoded frames.

    Frames enqueue after deblock (their SAO/ALF params live in the frame's
    tabs); `drain()` runs the batched sharded SAO pass for all queued
    frames, rasterizes ALF on the post-SAO pixels (classification is
    host-sequential by design, see ops/alf_device.py), then the batched
    sharded ALF and CC-ALF passes.  The decoder drains at inter reference
    barriers, so all-intra runs batch the full "gop" axis while inter
    frames degrade to per-frame tile sharding — the mesh analogue of the
    reference's frame-pipeline-with-row-progress (vvc_thread.c:281-296)."""

    def __init__(self, mesh):
        self.mesh = mesh
        self.q = []
        self._shape_key = None

    def add(self, sps, pps, tabs, fb, sh_list, alf_list):
        key = (pps.width, pps.height, sps.bit_depth,
               sps.chroma_format_idc)
        if self.q and key != self._shape_key:
            self.drain()
        self._shape_key = key
        self.q.append((sps, pps, tabs, fb, sh_list, alf_list))

    def drain(self):
        if not self.q:
            return
        q, self.q = self.q, []
        sps = q[0][0]
        shift = sps.bit_depth - 5
        pix_max = (1 << sps.bit_depth) - 1
        half = 1 << (sps.bit_depth - 1)
        nc = 3 if sps.chroma_format_idc else 1
        # --- batched sharded SAO per plane component ---------------------
        from ..ops.sao_device import _rasterize_plane
        from ..sao import SaoFilter
        for c in range(nc):
            batch = []      # (frame idx, maps)
            for i, (sps_i, pps_i, tabs, fb, _, _) in enumerate(q):
                if not any(int(t) for t in tabs.sao_type[:, c]):
                    continue
                sf = SaoFilter(sps_i, pps_i, tabs, fb)
                maps = _rasterize_plane(sf, c, fb.planes[c])
                if maps is not None:
                    batch.append((i, maps))
            if not batch:
                continue
            src = np.stack([np.asarray(q[i][3].planes[c], np.int32)
                            for i, _ in batch])
            typ = np.stack([m[0] for _, m in batch])
            m1 = np.stack([m[1] for _, m in batch])
            offs = np.stack([m[2] for _, m in batch])
            keep = np.stack([m[3] for _, m in batch])
            out = sao_batch_sharded(self.mesh, src, typ, m1, offs, keep,
                                    shift, pix_max)
            for k, (i, _) in enumerate(batch):
                q[i][3].planes[c][:] = out[k]
        # --- ALF: rasterize on post-SAO pixels, then batched passes ------
        from ..ops.alf_device import _AlfRasterizer
        per_frame = []
        for sps_i, pps_i, tabs, fb, sh_list, alf_list in q:
            if (not sps_i.r.sps_alf_enabled_flag or sh_list is None or
                    (not tabs.alf_ctb_flag.any()
                     and not tabs.alf_cc_idc.any())):
                per_frame.append(None)
                continue
            ras = _AlfRasterizer(sps_i, pps_i, tabs, fb, sh_list, alf_list)
            per_frame.append(ras.rasterize())
        for c in range(nc):
            batch = [(i, m[c]) for i, m in enumerate(per_frame)
                     if m is not None and m.get(c) is not None]
            if batch:
                out = alf_batch_sharded(
                    self.mesh,
                    np.stack([m["cur"] for _, m in batch]),
                    np.stack([m["v0"] for _, m in batch]),
                    np.stack([m["v1"] for _, m in batch]),
                    np.stack([m["cf"] for _, m in batch]),
                    np.stack([m["cl"] for _, m in batch]),
                    np.stack([m["vb"] for _, m in batch]), pix_max)
                for k, (i, _) in enumerate(batch):
                    q[i][3].planes[c][:] = out[k]
        for c in (1, 2):
            batch = [(i, m[("cc", c)]) for i, m in enumerate(per_frame)
                     if m is not None and m.get(("cc", c)) is not None]
            if not batch:
                continue
            out = cc_batch_sharded(
                self.mesh,
                np.stack([q[i][3].planes[c].astype(np.int32)
                          for i, _ in batch]),
                np.stack([m["curl"] for _, m in batch]),
                np.stack([m["v"] for _, m in batch]),
                np.stack([m["cf"] for _, m in batch]), half, pix_max)
            for k, (i, _) in enumerate(batch):
                q[i][3].planes[c][:] = out[k]
