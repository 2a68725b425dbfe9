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


def test_row_progress_overlap():
    """Row-granular cross-frame progress: frames publish filter-final rows
    incrementally, the consumer's MC performs per-row waits, and output
    stays byte-identical to the row-disabled decode."""
    import sys as _s, os as _o
    _s.path.insert(0, _o.path.join(_o.path.dirname(__file__), "..", "tools"))
    from forge import forge_hier_stream
    from ffvvc_tpu.decoder import VVCDecoder, DecodedFrame
    from ffvvc_tpu.config import DecoderConfig

    s = forge_hier_stream(seed=1, width=192, height=160, qp=32,
                          bit_depth=10, ngops=2, deblock=True,
                          sps_sao_enabled_flag=1, sps_alf_enabled_flag=1,
                          sps_temporal_mvp_enabled_flag=1)
    log = {"publishes": [], "waits": 0, "rows_runs": 0}
    orig_pub = DecodedFrame.publish_rows
    orig_wait = DecodedFrame.wait_rows
    orig_rows = VVCDecoder._pixel_stages_rows

    def spy_pub(self, y):
        log["publishes"].append(y)
        return orig_pub(self, y)

    def spy_wait(self, y):
        log["waits"] += 1
        return orig_wait(self, y)

    def spy_rows(self, *a, **k):
        r = orig_rows(self, *a, **k)
        log["rows_runs"] += int(bool(r))
        return r

    DecodedFrame.publish_rows = spy_pub
    DecodedFrame.wait_rows = spy_wait
    VVCDecoder._pixel_stages_rows = spy_rows
    try:
        a = b"".join(f.to_yuv_bytes()
                     for f in VVCDecoder(DecoderConfig()).decode(s))
    finally:
        DecodedFrame.publish_rows = orig_pub
        DecodedFrame.wait_rows = orig_wait
        VVCDecoder._pixel_stages_rows = orig_rows
    b = b"".join(f.to_yuv_bytes() for f in VVCDecoder(
        DecoderConfig(row_progress=False)).decode(s))
    assert a == b, "row-pipelined decode differs"
    assert log["rows_runs"] >= 3, log       # inter frames rolled by rows
    assert log["waits"] >= 1, log           # MC used per-row waits
    # incremental publishing: some frame published a partial row count
    # (not just the end-of-frame totals)
    h = 160
    assert any(0 < y < h for y in log["publishes"]), log["publishes"][:20]
