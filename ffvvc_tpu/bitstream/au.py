"""Access-unit assembly for streaming input.

Splits a raw Annex-B byte stream into access units (one coded picture plus
its non-VCL NALs), so a caller can feed a decoder packet-by-packet.

Reference analogue: /root/reference/libavcodec/vvc_parser.c:345-482 — AU
boundary detection: a new AU starts at an AUD/OPI/DCI, or at the first VCL
NAL carrying a new picture header (PH NAL, or slice header with
sh_picture_header_in_slice_header_flag set), spec 7.4.2.4.3.
"""
from __future__ import annotations

from .nal import NalType, NalUnit, is_vcl, split_annexb
from .reader import BitReader


def _starts_new_picture(nal: NalUnit) -> bool:
    """VCL NAL with sh_picture_header_in_slice_header_flag == 1 (first bit
    of the slice header, after the 2-byte NAL header)."""
    if not is_vcl(nal.type):
        return False
    if not nal.rbsp:
        return False
    return bool(nal.rbsp[0] >> 7)


def split_access_units(stream: bytes):
    """Yield lists of NalUnit, one list per access unit (decode order)."""
    au = []
    saw_vcl = False
    for nal in split_annexb(stream):
        t = nal.type
        boundary = False
        if t in (NalType.AUD, NalType.OPI, NalType.DCI):
            boundary = True
        elif saw_vcl:
            # after the AU's VCL NALs, the next picture starts at a PH NAL,
            # a parameter set, or a VCL slice that embeds its own PH
            if t in (NalType.PH, NalType.VPS, NalType.SPS, NalType.PPS,
                     NalType.PREFIX_APS, NalType.AUD):
                boundary = True
            elif _starts_new_picture(nal):
                boundary = True
        if boundary and au:
            yield au
            au = []
            saw_vcl = False
        au.append(nal)
        if is_vcl(t):
            saw_vcl = True
    if au:
        yield au


def split_access_unit_bytes(stream: bytes):
    """Same as split_access_units but yields raw Annex-B byte chunks
    (re-emitted with 4-byte start codes), suitable for decoder.decode()."""
    for au in split_access_units(stream):
        yield b"".join(b"\x00\x00\x00\x01" + n.raw for n in au)
