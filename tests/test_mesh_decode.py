"""Real decode on a multi-device mesh must equal single-device decode.

The TPU-native replacement for the reference's threading determinism check
(CI decodes conformance streams with --threads 4 vs 1 and compares
framecrcs, makefile.yml:20-21): here the same bitstream decodes on a
(gop, tile) jax mesh — frames batched over "gop", CTU-row slabs over
"tile" with ppermute halo exchange — and must match the host decode
byte-for-byte.  Runs on the virtual 8-device CPU mesh (conftest)."""
import sys
import os

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from ffvvc_tpu.decoder import VVCDecoder
from ffvvc_tpu.config import DecoderConfig

FILTER_TOOLS = dict(sps_sao_enabled_flag=1, sps_alf_enabled_flag=1,
                    sps_ccalf_enabled_flag=1, sps_lmcs_enabled_flag=1)


def _decode_both(stream, mesh_shape):
    host = VVCDecoder(DecoderConfig()).decode(stream)
    sharded = VVCDecoder(DecoderConfig(mesh_shape=mesh_shape)).decode(stream)
    assert len(host) == len(sharded) and host
    a = b"".join(f.to_yuv_bytes() for f in host)
    b = b"".join(f.to_yuv_bytes() for f in sharded)
    assert a == b, f"mesh {mesh_shape} decode differs from single-device"


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8), (4, 2), (8, 1)])
def test_allintra_mesh(mesh_shape):
    """All-intra frames batch over the full gop axis in one drain."""
    from forge import forge_inter_stream
    s = forge_inter_stream(slice_type=2, nframes=4, width=96, height=96,
                           seed=3, deblock=True, **FILTER_TOOLS)
    _decode_both(s, mesh_shape)


@pytest.mark.parametrize("slice_type,mesh_shape", [(0, (2, 2)), (1, (1, 4))])
def test_inter_mesh(slice_type, mesh_shape):
    """Inter frames drain per frame at the MC reference barrier."""
    from forge import forge_inter_stream
    s = forge_inter_stream(slice_type=slice_type, nframes=4, width=96,
                           height=64, seed=1, deblock=True, **FILTER_TOOLS)
    _decode_both(s, mesh_shape)


def test_mixed_rap_segments_mesh():
    """IDR-separated segments: drains happen at barriers mid-stream and at
    the end of the decode call; output must stay byte-identical."""
    from forge import forge_inter_stream
    a = forge_inter_stream(slice_type=2, nframes=2, width=64, height=64,
                           seed=5, deblock=True, **FILTER_TOOLS)
    b = forge_inter_stream(slice_type=1, nframes=3, width=64, height=64,
                           seed=6, deblock=True, **FILTER_TOOLS)
    _decode_both(a + b, (2, 4))


def test_odd_height_mesh():
    """Frame rows not divisible by the tile axis: slab padding must stay
    bit-exact (edge-replicated pixels, zero parameter maps)."""
    from forge import forge_inter_stream
    s = forge_inter_stream(slice_type=2, nframes=2, width=64, height=80,
                           seed=2, deblock=True, **FILTER_TOOLS)
    _decode_both(s, (1, 8))
