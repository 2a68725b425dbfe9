"""ctypes binding for the native intra recon core (native/vvc_recon.c).

Reconstructs whole CTUs from the flat records retained by the native parse
(native/parse.py `keep_records`), writing the frame planes in place —
prediction (incl. MIP/CCLM), dequant, LFNST, inverse transforms, residual
add.  ffvvc_tpu/recon.py remains the golden model; `make_native_recon`
returns None whenever the frame uses a tool the C core doesn't cover
(LMCS, explicit scaling lists, transform-skip — same gates as the parse).
"""
from __future__ import annotations

import ctypes
import functools
import os

import numpy as np

_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_DIR, "native", "libvvc_recon.so")
_SRCS = [os.path.join(_DIR, "native", "vvc_recon.c"),
         os.path.join(_DIR, "native", "vvc_intra.c")]
_HDRS = [os.path.join(_DIR, "native", "vvc_cabac.h"),
         os.path.join(_DIR, "native", "vvc_parse.h"),
         os.path.join(_DIR, "native", "vvc_intra.h")]

_I = ctypes.c_int
_P = ctypes.c_void_p


class _ReconParams(ctypes.Structure):
    _fields_ = (
        [(n, _I) for n in (
            "width", "height", "ctb_log2", "w4", "chroma_format_idc",
            "hshift1", "vshift1", "bit_depth", "qp_bd_offset", "log2_range",
            "dep_quant", "sps_mts", "sps_explicit_mts_intra", "wpp",
            "chroma_vert_coll", "jcbcr_sign", "slice_type_i",
            "min_qp_prime_ts")] +
        [(n, _P) for n in (
            "plane0", "plane1", "plane2", "imf", "cpm0", "ipm",
            "slice_idx", "ctb_to_col_bd", "ctb_to_row_bd")] +
        [("ctb_width", _I)] +
        [(n, _P) for n in (
            "fc_filt", "fg_filt",
            "dct2_2", "dct2_4", "dct2_8", "dct2_16", "dct2_32", "dct2_64",
            "dst7_4", "dst7_8", "dst7_16", "dst7_32",
            "dct8_4", "dct8_8", "dct8_16", "dct8_32",
            "lfnst_4x4", "lfnst_8x8", "lfnst_set_idx",
            "mip_4x4", "mip_8x8", "mip_16x16", "level_scale")])


def _build():
    import subprocess
    subprocess.run(["gcc", "-O3", "-march=x86-64-v3", "-shared", "-fPIC", "-o", _SO] + _SRCS,
                   check=True)


@functools.lru_cache()
def load_lib():
    try:
        newest = max(os.path.getmtime(s) for s in _SRCS + _HDRS)
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < newest:
            _build()
        lib = ctypes.CDLL(_SO)
    except Exception:
        return None
    lib.recon_ctu.argtypes = [ctypes.POINTER(_ReconParams), _I, _I, _I,
                              _P, _I, _P, _P, _P]
    lib.recon_ctu.restype = _I
    return lib


@functools.lru_cache()
def _tables():
    """Contiguous int32/int8/uint8 copies of the constant tables, kept
    alive for the process."""
    from ..ops import data as D
    t = D.tables()
    out = {"fc": np.ascontiguousarray(D.intra_filter(0).astype(np.int32)),
           "fg": np.ascontiguousarray(D.intra_filter(1).astype(np.int32)),
           "lfnst_4x4": np.ascontiguousarray(t["lfnst_4x4"]),
           "lfnst_8x8": np.ascontiguousarray(t["lfnst_8x8"]),
           "lfnst_set_idx": np.ascontiguousarray(t["lfnst_tr_set_index"]),
           "mip_4x4": np.ascontiguousarray(t["mip_4x4"]),
           "mip_8x8": np.ascontiguousarray(t["mip_8x8"]),
           "mip_16x16": np.ascontiguousarray(t["mip_16x16"]),
           "level_scale": np.ascontiguousarray(
               np.asarray(D.LEVEL_SCALE, np.int32))}
    for n in (2, 4, 8, 16, 32, 64):
        out[f"dct2_{n}"] = np.ascontiguousarray(
            D.dct2_matrix(n).astype(np.int32))
    for n in (4, 8, 16, 32):
        out[f"dst7_{n}"] = np.ascontiguousarray(
            D.dst7_matrix(n).astype(np.int32))
        out[f"dct8_{n}"] = np.ascontiguousarray(
            D.dct8_matrix(n).astype(np.int32))
    return out


def _ptr(a):
    return ctypes.c_void_p(a.ctypes.data)


class NativeRecon:
    """Per-slice native recon; reconstruct_ctu-compatible walk over the
    records retained by the slice's NativeTreeParser."""

    def __init__(self, coder, tree_parser, fb, lib, ph_r):
        self.lib = lib
        self.records = tree_parser.records
        sps, pps = coder.sps, coder.pps
        tabs = coder.tabs
        t = _tables()
        rp = _ReconParams()
        self._keep = keep = [t]
        rp.width, rp.height = pps.width, pps.height
        rp.ctb_log2 = sps.ctb_log2_size_y
        rp.w4 = tabs.w4
        rp.chroma_format_idc = sps.chroma_format_idc
        rp.hshift1, rp.vshift1 = sps.hshift[1], sps.vshift[1]
        rp.bit_depth = sps.bit_depth
        rp.qp_bd_offset = sps.qp_bd_offset
        rp.log2_range = coder.log2_transform_range
        rp.dep_quant = coder.sh.r.sh_dep_quant_used_flag
        rp.sps_mts = sps.r.sps_mts_enabled_flag
        rp.sps_explicit_mts_intra = sps.r.sps_explicit_mts_intra_enabled_flag
        rp.wpp = sps.r.sps_entropy_coding_sync_enabled_flag
        rp.chroma_vert_coll = sps.r.sps_chroma_vertical_collocated_flag
        rp.jcbcr_sign = 1 - 2 * int(getattr(
            ph_r, "ph_joint_cbcr_sign_flag", 0))
        rp.slice_type_i = int(coder.sh.slice_type == 2)
        rp.min_qp_prime_ts = sps.r.sps_min_qp_prime_ts

        def cp(a, dtype=np.int32):
            assert a.dtype == dtype and a.flags["C_CONTIGUOUS"], (
                a.dtype, dtype)
            keep.append(a)
            return ctypes.c_void_p(a.ctypes.data)

        rp.plane0 = cp(fb.planes[0])
        if sps.chroma_format_idc:
            rp.plane1 = cp(fb.planes[1])
            rp.plane2 = cp(fb.planes[2])
        rp.imf, rp.cpm0, rp.ipm = cp(tabs.imf), cp(tabs.cpm[0]), cp(tabs.ipm)
        rp.slice_idx = cp(tabs.slice_idx)
        col_bd = np.ascontiguousarray(np.asarray(pps.ctb_to_col_bd, np.int32))
        row_bd = np.ascontiguousarray(np.asarray(pps.ctb_to_row_bd, np.int32))
        rp.ctb_to_col_bd, rp.ctb_to_row_bd = cp(col_bd), cp(row_bd)
        rp.ctb_width = pps.ctb_width
        rp.fc_filt, rp.fg_filt = _ptr(t["fc"]), _ptr(t["fg"])
        for n in (2, 4, 8, 16, 32, 64):
            setattr(rp, f"dct2_{n}", _ptr(t[f"dct2_{n}"]))
        for n in (4, 8, 16, 32):
            setattr(rp, f"dst7_{n}", _ptr(t[f"dst7_{n}"]))
            setattr(rp, f"dct8_{n}", _ptr(t[f"dct8_{n}"]))
        rp.lfnst_4x4 = _ptr(t["lfnst_4x4"])
        rp.lfnst_8x8 = _ptr(t["lfnst_8x8"])
        rp.lfnst_set_idx = _ptr(t["lfnst_set_idx"])
        rp.mip_4x4, rp.mip_8x8 = _ptr(t["mip_4x4"]), _ptr(t["mip_8x8"])
        rp.mip_16x16 = _ptr(t["mip_16x16"])
        rp.level_scale = _ptr(t["level_scale"])
        self.rp = rp
        self._rp_ref = ctypes.byref(rp)

    def reconstruct_ctu(self, rs, rx, ry):
        rec = self.records.get(rs)
        if rec is None or not rec[0]:
            return
        n_cu, cu_p, tu_p, tb_p, coeff_p, _keep = rec
        err = self.lib.recon_ctu(self._rp_ref, rx, ry, rs,
                                 cu_p, n_cu, tu_p, tb_p, coeff_p)
        if err:
            raise ValueError(f"native recon_ctu failed (err={err})")


def make_native_recon(coder, fb, ph_r):
    """NativeRecon for this slice, or None if ineligible (requires the
    slice's native tree parser to have retained records)."""
    tp = getattr(coder, "native_tree", None)
    if tp is None or not tp.keep_records:
        return None
    lib = load_lib()
    if lib is None:
        return None
    return NativeRecon(coder, tp, fb, lib, ph_r)
