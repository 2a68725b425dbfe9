"""Multi-device decode sharding over a jax.sharding.Mesh.

Axes:
  * "gop"  — frame-parallel: different frames of a GOP decode on different
    devices (TPU-native form of the reference's 16-deep frame pipeline,
    /root/reference/libavcodec/vvc/vvcdec.c:830-841 submit/wait).
  * "tile" — spatial row-slab parallel within a frame, CTU-row aligned
    (TPU-native form of the reference's CTU wavefront / tile parallelism,
    /root/reference/libavcodec/vvc/vvc_thread.c:41-51).

Cross-slab dataflow (deblock halos, MC reference rows) rides ICI via
jax.lax.ppermute — the TPU-native replacement for the reference's
row-progress listeners (/root/reference/libavcodec/vvc/vvc_refs.c:532-565).
Slab boundaries are CTU-row aligned, so a transform block (<=64px within a
128px CTU) never straddles a slab; cross-slab dependencies are confined to
the fixed small halos of the loop filters and inter MC.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.itx import itx_batch


def make_mesh(n_devices: int = None, devices=None) -> Mesh:
    """Build a ("gop", "tile") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    tile = 2 if (n % 2 == 0 and n >= 2) else 1
    gop = n // tile
    return Mesh(np.array(devices).reshape(gop, tile), ("gop", "tile"))


def exchange_row_halo(slab, halo: int, n_tiles: int, axis: str = "tile"):
    """Exchange boundary row strips between vertically adjacent slabs.

    slab: [..., slab_h, W] (leading batch dims allowed).  Returns
    (above, below): `above` is the bottom `halo` rows of the slab-above
    (zeros on the top edge), `below` the top `halo` rows of the slab-below
    (zeros on the bottom edge).  One ppermute each way over ICI.
    """
    down = [(i, i + 1) for i in range(n_tiles - 1)]
    up = [(i + 1, i) for i in range(n_tiles - 1)]
    above = jax.lax.ppermute(slab[..., -halo:, :], axis, down)
    below = jax.lax.ppermute(slab[..., :halo, :], axis, up)
    return above, below


def _scatter_blocks(slab, res, xs, ys_local, pixel_max):
    """Add residual blocks [B, bh, bw] into slab [H, W] at (ys_local, xs);
    blocks with ys_local outside the slab are masked to no-ops."""
    H = slab.shape[0]
    bh = res.shape[1]
    inb = (ys_local >= 0) & (ys_local <= H - bh)
    res = jnp.where(inb[:, None, None], res, 0)
    ys_c = jnp.clip(ys_local, 0, H - bh)
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1))
    idx = jnp.stack([ys_c, xs], axis=1)
    out = jax.lax.scatter_add(slab, idx, res, dn,
                              indices_are_sorted=False, unique_indices=False)
    return jnp.clip(out, 0, pixel_max)


def build_sharded_residual_step(mesh: Mesh, frame_h: int, frame_w: int,
                                block: int, n_blocks: int, n_frames: int,
                                bit_depth: int = 8, halo: int = 8):
    """Jit-compiled multi-device decode step: batched inverse transform +
    residual scatter per frame, frames sharded over "gop", rows over "tile",
    followed by the cross-slab halo exchange that feeds the loop-filter /
    inter-MC boundary work.

    Returns fn(coeffs [F,B,b,b] i32, xs [F,B] i32, ys [F,B] i32,
               frames [F,H,W] i32) -> (frames', above, below)
    """
    n_tiles = mesh.shape["tile"]
    slab_h = frame_h // n_tiles
    assert slab_h * n_tiles == frame_h
    pixel_max = (1 << bit_depth) - 1

    def local(coeffs, xs, ys, slab):
        # coeffs [F_loc, B, b, b]; slab [F_loc, slab_h, W]
        res = jax.vmap(lambda c: itx_batch(c, block, block, 0, 0,
                                           bit_depth=bit_depth))(coeffs)
        y0 = jax.lax.axis_index("tile") * slab_h
        out = jax.vmap(functools.partial(_scatter_blocks,
                                         pixel_max=pixel_max))(
            slab, res, xs, ys - y0)
        above, below = exchange_row_halo(out, halo, n_tiles)
        return out, above, below

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("gop"), P("gop"), P("gop"), P("gop", "tile")),
        out_specs=(P("gop", "tile"), P("gop", "tile"), P("gop", "tile")))
    return jax.jit(fn)


def build_sharded_sao(mesh: Mesh, frame_h: int, frame_w: int, shift: int,
                      pix_max: int):
    """Whole-frame SAO sharded into CTU-row slabs over the "tile" axis.

    The per-pixel parameter maps (see ops/sao_device.py) shard with the
    frame; the 1-pixel neighbour ring crosses slab boundaries via a single
    ppermute halo exchange (reference analogue: the sao_pixel_buffer_h/v
    line buffers of vvc_filter.c:123-152, re-expressed as ICI collectives).
    Returns a jitted fn(src, typ, m1, offs, keep) -> filtered [H, W].
    """
    from ..ops.sao_device import _sao_math

    t = mesh.shape["tile"]
    assert frame_h % t == 0, (frame_h, t)

    def local(src, typ, m1, offs, keep):
        # src [h, W] slab; halo rows from vertical neighbours (frame edges
        # replicate the slab's own border row, matching np.pad edge mode)
        above, below = exchange_row_halo(src, 1, t)
        idx = jax.lax.axis_index("tile")
        top = jnp.where(idx == 0, src[:1], above)
        bot = jnp.where(idx == t - 1, src[-1:], below)
        tall = jnp.concatenate([top, src, bot], axis=0)      # [h+2, W]
        pad = jnp.concatenate([tall[:, :1], tall, tall[:, -1:]], axis=1)
        return _sao_math(pad, typ, m1, offs, keep, shift, pix_max)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("tile", None), P("tile", None), P("tile", None),
                  P(None, "tile", None), P("tile", None)),
        out_specs=P("tile", None))
    return jax.jit(fn)
