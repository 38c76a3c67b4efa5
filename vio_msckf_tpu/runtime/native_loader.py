"""ctypes bindings for the native data runtime (euroc_loader.cc).

Builds the shared library on first use (g++ -O3, libpng/zlib/pthread) and
caches it next to the source. Falls back gracefully: `available()` returns
False when the toolchain or libpng is missing and callers use PIL instead.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "euroc_loader.cc")
_SO = os.path.join(_HERE, "build", "libvio_runtime.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build():
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO, "-lpng", "-lz", "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.vio_decode_png_gray.restype = ctypes.c_int
            lib.vio_decode_png_gray.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_size_t, ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
            ]
            lib.vio_loader_create.restype = ctypes.c_void_p
            lib.vio_loader_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
                ctypes.c_uint32, ctypes.c_uint32, ctypes.c_int32,
                ctypes.c_int32,
            ]
            lib.vio_loader_next.restype = ctypes.c_int
            lib.vio_loader_next.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.vio_loader_destroy.restype = None
            lib.vio_loader_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def available():
    return _get_lib() is not None


def load_png_gray(path, max_bytes=8 * 1024 * 1024):
    """Decode one grayscale PNG through the native library."""
    lib = _get_lib()
    buf = np.empty(max_bytes, np.uint8)
    w = ctypes.c_uint32(0)
    h = ctypes.c_uint32(0)
    status = lib.vio_decode_png_gray(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size,
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if status != 0:
        raise IOError(f"PNG decode failed ({status}): {path}")
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()


class PrefetchingLoader:
    """Ordered multi-threaded image prefetcher over a bounded ring —
    the native replacement for the reference's DataPublisher threads
    (MSCKF/dataset.py:226-271) minus the wall-clock throttling (we feed the
    device as fast as it consumes; real-time replay is a benchmark mode,
    not a design constraint)."""

    def __init__(self, paths, width, height, ring=8, threads=4):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._n = len(paths)
        self._w, self._h = width, height
        self._handle = lib.vio_loader_create(
            arr, self._n, width, height, ring, threads
        )
        self._closed = False

    def __iter__(self):
        out = np.empty((self._h, self._w), np.uint8)
        idx = ctypes.c_int64(0)
        for _ in range(self._n):
            status = self._lib.vio_loader_next(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.byref(idx),
            )
            if status == -100:
                return
            if status != 0:
                raise IOError(f"decode failed ({status}) at frame {idx.value}")
            yield idx.value, out.copy()

    def close(self):
        if not self._closed:
            self._lib.vio_loader_destroy(self._handle)
            self._closed = True

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
