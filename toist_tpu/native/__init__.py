"""ctypes loader for the toist_native C++ library, building it on demand.

pybind11 is not available in this image, so the native layer exposes a C ABI
consumed here via ctypes (SURVEY.md §2.3 plan).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "toist_native.cc")
_LOCK = threading.Lock()
_LIB = None


def _build(so_path: str) -> None:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", so_path]
    subprocess.run(cmd, check=True, capture_output=True)


def load() -> ctypes.CDLL:
    """Load (building if stale) the native library and declare signatures."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        cache = os.environ.get(
            "TOIST_NATIVE_DIR", os.path.expanduser("~/.cache/toist_tpu_native"))
        os.makedirs(cache, exist_ok=True)
        so_path = os.path.join(cache, "libtoist_native.so")
        src_mtime = max([os.path.getmtime(_SRC)] +
                        [os.path.getmtime(os.path.join(_HERE, f))
                         for f in os.listdir(_HERE) if f.endswith(".inc")])
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < src_mtime):
            _build(so_path)
        lib = ctypes.CDLL(so_path)

        u32p = ctypes.POINTER(ctypes.c_uint32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)

        lib.lsa_solve.restype = ctypes.c_int
        lib.lsa_solve.argtypes = [f64p, ctypes.c_int, ctypes.c_int, i32p]

        lib.rle_encode.restype = ctypes.c_int
        lib.rle_encode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u32p]
        lib.rle_encode_packed_cm.restype = ctypes.c_int
        lib.rle_encode_packed_cm.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                             ctypes.c_int, u32p]
        lib.rle_decode.restype = None
        lib.rle_decode.argtypes = [u32p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, u8p]
        lib.rle_area.restype = ctypes.c_uint64
        lib.rle_area.argtypes = [u32p, ctypes.c_int]
        lib.rle_iou.restype = ctypes.c_double
        lib.rle_iou.argtypes = [u32p, ctypes.c_int, u32p, ctypes.c_int,
                                ctypes.c_int]
        lib.rle_merge.restype = ctypes.c_int
        lib.rle_merge.argtypes = [u32p, ctypes.c_int, u32p, ctypes.c_int,
                                  ctypes.c_int, u32p]
        lib.rle_to_string.restype = ctypes.c_int
        lib.rle_to_string.argtypes = [u32p, ctypes.c_int, ctypes.c_char_p]
        lib.rle_from_string.restype = ctypes.c_int
        lib.rle_from_string.argtypes = [ctypes.c_char_p, u32p, ctypes.c_int]

        lib.poly_to_mask.restype = None
        lib.poly_to_mask.argtypes = [f64p, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, u8p]

        lib.coco_match.restype = None
        lib.coco_match.argtypes = [f64p, ctypes.c_int, ctypes.c_int, u8p, u8p,
                                   f64p, ctypes.c_int, i32p, u8p, i32p]

        lib.bpe_create.restype = ctypes.c_int
        lib.bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                   ctypes.c_int]
        lib.bpe_free.restype = None
        lib.bpe_free.argtypes = [ctypes.c_int]
        lib.bpe_encode.restype = ctypes.c_int
        lib.bpe_encode.argtypes = [ctypes.c_int, ctypes.c_char_p, i32p, i32p,
                                   i32p, ctypes.c_int]

        _LIB = lib
        return _LIB
