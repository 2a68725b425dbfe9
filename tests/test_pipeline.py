"""GOP-parallel decode must be byte-identical to sequential decode."""
import sys
import os

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from ffvvc_tpu.decoder import VVCDecoder
from ffvvc_tpu.pipeline import decode_parallel, segment_stream


def _intra_stream(nframes):
    from forge import forge_stream
    return forge_stream(level=1, seed=3, width=96, height=64, qp=30,
                        nframes=nframes)


def test_segmenting_all_intra():
    stream = _intra_stream(4)
    segs = segment_stream(stream)
    assert len(segs) == 4
    # every byte of the stream lands in exactly one segment, in order
    assert b"".join(s for _p, s in segs) == stream


def test_parallel_matches_sequential():
    stream = _intra_stream(4)
    seq = [f.to_yuv_bytes() for f in VVCDecoder().decode(stream)]
    par = decode_parallel(stream, workers=2)
    assert len(par) == 4
    assert par == seq


def test_pipeline_depth_matches():
    """Depth-N frame pipeline (parse running ahead of queued pixel
    stages) must be byte-identical to the unpipelined decode, for both
    all-intra (runs ahead) and inter (drains at every MC barrier)."""
    from forge import forge_hier_stream
    from ffvvc_tpu.config import DecoderConfig
    for stream in (_intra_stream(6),
                   forge_hier_stream(seed=1, width=96, height=64, qp=30,
                                     deblock=True)):
        ref = [f.to_yuv_bytes() for f in VVCDecoder(
            DecoderConfig(pipeline_frames=False)).decode(stream)]
        for depth in (1, 4):
            got = [f.to_yuv_bytes() for f in VVCDecoder(
                DecoderConfig(pipeline_depth=depth)).decode(stream)]
            assert got == ref, depth


def test_single_segment_fallback():
    from forge import forge_inter_stream
    stream = forge_inter_stream(seed=0, nframes=3, slice_type=1,
                                n_refs=(1, 0), deblock=True)
    assert len(segment_stream(stream)) == 1   # one IDR + trailing P frames
    seq = [f.to_yuv_bytes() for f in VVCDecoder().decode(stream)]
    par = decode_parallel(stream, workers=2)
    assert par == seq
