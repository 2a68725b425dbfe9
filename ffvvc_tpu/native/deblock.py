"""ctypes binding for the native deblock edge filters (vvc_deblock.c).

The Python kernels in ffvvc_tpu/deblock.py remain the golden model and the
automatic fallback when the library is missing or the plane layout does not
match (int32, C-contiguous).
"""
from __future__ import annotations

import ctypes
import functools
import os

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libvvc_deblock.so")
_SRC = os.path.join(_DIR, "vvc_deblock.c")

_I32P = ctypes.POINTER(ctypes.c_int32)


def _build():
    import subprocess
    subprocess.run(["gcc", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                   check=True)


@functools.lru_cache()
def load_lib():
    try:
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
    except Exception:
        return None
    lib.deblock_filter_luma.argtypes = [
        _I32P, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _I32P, _I32P, _I32P, _I32P,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.deblock_filter_luma.restype = None
    lib.deblock_filter_chroma.argtypes = [
        _I32P, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _I32P, _I32P, _I32P, _I32P,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.deblock_filter_chroma.restype = None
    lib.deblock_ctb_edges.argtypes = [
        _I32P, ctypes.c_long, ctypes.c_int, ctypes.c_int,        # plane c v
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,  # x0 y0 ends
        ctypes.c_int, ctypes.c_int, ctypes.c_int,                # grid step n
        ctypes.c_int, ctypes.c_int, ctypes.c_int,                # hs vs ctb
        _I32P, _I32P, _I32P, _I32P, _I32P, ctypes.c_int,         # tabs, w4
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,  # offs qbd bd
        ctypes.c_int,                                            # pixel max
        ctypes.c_int, ctypes.c_int, _I32P, _I32P]                # ladf
    lib.deblock_ctb_edges.restype = None
    return lib


def as_i32p(arr: np.ndarray):
    return arr.ctypes.data_as(_I32P)
