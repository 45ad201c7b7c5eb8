"""ctypes wrapper for the native ingest runtime (libvo_ingest.so).

Decode-ahead frame ingestion in C++ worker threads — the framework's
replacement for the reference's ROS subscriber queue + message_filters stereo
sync. Builds the shared library on first use if the toolchain is present and
falls back to PIL decoding otherwise, so the pure-Python path always works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libvo_ingest.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        build = os.path.join(_HERE, "build.sh")
        try:
            subprocess.run(["sh", build], check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            raise RuntimeError(f"cannot build native ingest: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vo_ingest_open.restype = ctypes.c_void_p
    lib.vo_ingest_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    lib.vo_ingest_next.restype = ctypes.c_int
    lib.vo_ingest_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.vo_ingest_close.argtypes = [ctypes.c_void_p]
    lib.vo_decode_image.restype = ctypes.c_int
    lib.vo_decode_image.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def decode_image(path: str, max_h: int = 2048, max_w: int = 4096) -> np.ndarray:
    """One-shot native decode -> float32 grayscale array."""
    lib = _load()
    buf = np.empty((max_h, max_w), np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.vo_decode_image(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_h,
        max_w,
        ctypes.byref(h),
        ctypes.byref(w),
    )
    if rc != 0:
        raise ValueError(f"native decode failed for {path}")
    # C side writes a contiguous h*w block at the buffer start.
    return buf.reshape(-1)[: h.value * w.value].reshape(h.value, w.value).copy()


class NativeSequence:
    """Iterator over decode-ahead stereo (or mono) frames.

    left/right: lists of image paths. Yields (index, left, right|None).
    """

    def __init__(self, left_paths, right_paths=None, queue_depth: int = 4,
                 max_h: int = 2048, max_w: int = 4096):
        lib = _load()
        self._lib = lib
        self.max_h, self.max_w = max_h, max_w
        lp = b"\0".join(p.encode() for p in left_paths) + b"\0\0"
        rp = None
        if right_paths:
            assert len(right_paths) == len(left_paths)
            rp = b"\0".join(p.encode() for p in right_paths) + b"\0\0"
        self._handle = lib.vo_ingest_open(lp, rp, queue_depth)
        if not self._handle:
            raise RuntimeError("vo_ingest_open failed (path list mismatch?)")
        self._stereo = right_paths is not None
        self._closed = False

    def __iter__(self):
        lb = np.empty((self.max_h, self.max_w), np.float32)
        rb = np.empty((self.max_h, self.max_w), np.float32)
        h = ctypes.c_int()
        w = ctypes.c_int()
        while True:
            idx = self._lib.vo_ingest_next(
                self._handle,
                lb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                rb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.max_h,
                self.max_w,
                ctypes.byref(h),
                ctypes.byref(w),
            )
            if idx == -2:
                return
            if idx == -1:
                raise ValueError("native decode error in sequence")
            n = h.value * w.value
            left = lb.reshape(-1)[:n].reshape(h.value, w.value).copy()
            right = rb.reshape(-1)[:n].reshape(h.value, w.value).copy() if self._stereo else None
            yield idx, left, right

    def close(self):
        if not self._closed:
            self._lib.vo_ingest_close(self._handle)
            self._closed = True

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
