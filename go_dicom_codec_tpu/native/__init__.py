"""Native (C++) fast paths for the serial entropy stages.

The Python implementations in entropy/ are the behavioral reference;
these C++ mirrors exist because the MQ/EBCOT bit loops are the
[hot-serial] host bottleneck (SURVEY.md §2). Built on first use with g++
(cached beside the source); everything falls back to Python if the
toolchain or build is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "ebcot_native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "libebcot.so")


def _build() -> bool:
    try:
        src_mtime = os.path.getmtime(_SRC)
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= src_mtime:
            return True
        r = subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _SO, _SRC],
            capture_output=True, timeout=240)
        return r.returncode == 0 and os.path.exists(_SO)
    except Exception:  # noqa: BLE001
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None (Python fallback)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("GDCT_DISABLE_NATIVE"):
            return None
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
        lib.t1_encode.restype = ctypes.c_int
        lib.t1_encode.argtypes = [
            i64p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u8p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            i32p, u8p, i32p, ctypes.c_int]
        lib.t1_decode.restype = ctypes.c_int
        lib.t1_decode.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i32p, ctypes.c_int, i64p]
        lib.jls_encode_scan.restype = ctypes.c_int
        lib.jls_encode_scan.argtypes = [
            i64p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u8p, ctypes.c_int]
        lib.jls_decode_scan.restype = ctypes.c_int
        lib.jls_decode_scan.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, i64p]
        _LIB = lib
        return _LIB


def t1_encode_native(data: np.ndarray, style: int, orient: int,
                     roishift: int = 0):
    """Native T1 encode; returns (bytes, numbps, rates, terms, bitplanes)
    or None when the native path is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h, w = data.shape
    src = np.ascontiguousarray(data, dtype=np.int64)
    max_passes = 3 * 40
    cap = max(w * h * 6 + 1024, 4096)
    out = np.zeros(cap, dtype=np.uint8)
    rates = np.zeros(max_passes, dtype=np.int32)
    terms = np.zeros(max_passes, dtype=np.uint8)
    bps = np.zeros(max_passes, dtype=np.int32)
    numbps = ctypes.c_int(0)
    npasses = ctypes.c_int(0)
    n = lib.t1_encode(src, w, h, style, orient, roishift, out, cap,
                      ctypes.byref(numbps), ctypes.byref(npasses),
                      rates, terms, bps, max_passes)
    if n < 0:
        return None
    k = npasses.value
    return (out[:n].tobytes(), numbps.value, rates[:k].tolist(),
            terms[:k].astype(bool).tolist(), bps[:k].tolist())


def jls_encode_scan_native(img: np.ndarray, maxval: int, near: int,
                           reset: int, t1: int, t2: int, t3: int):
    """Native JPEG-LS scan encode. img: [h, w, comps] int; returns scan
    bytes (no markers) or None."""
    lib = get_lib()
    if lib is None:
        return None
    h, w, comps = img.shape
    buf = np.ascontiguousarray(img, dtype=np.int64).reshape(-1)
    cap = max(w * h * comps * 4 + 4096, 8192)
    out = np.zeros(cap, dtype=np.uint8)
    n = lib.jls_encode_scan(buf, w, h, comps, maxval, near, reset,
                            t1, t2, t3, out, cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def jls_decode_scan_native(data: bytes, w: int, h: int, comps: int,
                           maxval: int, near: int, reset: int,
                           t1: int, t2: int, t3: int, ilv: int):
    """Native JPEG-LS scan decode → int64 [h, w, comps], or None."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.ascontiguousarray(np.frombuffer(data, dtype=np.uint8))
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    out = np.zeros(h * w * comps, dtype=np.int64)
    r = lib.jls_decode_scan(buf, len(data), w, h, comps, maxval, near,
                            reset, t1, t2, t3, ilv, out)
    if r != 0:
        return None
    return out.reshape(h, w, comps)


def t1_decode_native(stream: bytes, w: int, h: int, style: int, orient: int,
                     num_passes: int, numbps: int, roishift: int = 0,
                     seg_ends=None):
    """Native T1 decode → int64 [h, w] array, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(stream, dtype=np.uint8)
    buf = np.ascontiguousarray(buf)
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    segs = np.asarray(seg_ends if seg_ends else [], dtype=np.int32)
    if segs.size == 0:
        segs = np.zeros(1, dtype=np.int32)
        n_segs = 0
    else:
        n_segs = segs.size
    out = np.zeros(h * w, dtype=np.int64)
    r = lib.t1_decode(buf, len(stream), w, h, style, orient, num_passes,
                      numbps, roishift, segs, n_segs, out)
    if r != 0:
        return None
    return out.reshape(h, w)
