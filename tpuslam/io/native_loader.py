"""ctypes wrapper for the native C++ prefetch loader.

The C++ side (tpuslam/native/loader.cpp) plays the reference's
data-movement runtime role: decoder threads fill a double-banked frame
ring ahead of the consumer (FPGA.h:35-53 bank scheme / receiveData,
FPGA.cpp:251-347), so disk IO + PNG decode overlap TPU compute.  The
shared library builds on first use with g++ (no pip deps); callers can
fall back to the pure-Python dataset reader if no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "loader.cpp")
_SO = os.path.join(_NATIVE_DIR, "_native_loader.so")

_lib = None
_lib_lock = threading.Lock()


class NativeLoaderUnavailable(RuntimeError):
    pass


def _build() -> str:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _SO, "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeLoaderUnavailable(
            f"native loader build failed: {detail}") from e
    return _SO


def get_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.tsl_open.restype = ctypes.c_void_p
        lib.tsl_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                 ctypes.c_int, ctypes.c_int]
        lib.tsl_count.restype = ctypes.c_int
        lib.tsl_count.argtypes = [ctypes.c_void_p]
        lib.tsl_next.restype = ctypes.c_int
        lib.tsl_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.tsl_release.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.tsl_close.argtypes = [ctypes.c_void_p]
        lib.tsl_decode.restype = ctypes.c_int
        lib.tsl_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def decode_image(path: str, max_pixels: int = 8 << 20) -> np.ndarray:
    """Decode one PNG/PGM to (H,W) uint8 via the native decoder."""
    lib = get_lib()
    buf = np.empty(max_pixels, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    n = lib.tsl_decode(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_pixels, ctypes.byref(w), ctypes.byref(h))
    if n < 0:
        raise IOError(f"native decode failed ({n}): {path}")
    return buf[:n].reshape(h.value, w.value).copy()


class NativeStereoLoader:
    """Iterator over prefetched stereo pairs.

    for idx, left, right in NativeStereoLoader(lpaths, rpaths): ...

    `left`/`right` are zero-copy views into the bank, valid only until
    the next iteration (the bank auto-releases then); copy or upload to
    device before advancing.
    """

    def __init__(self, left_paths: list[str], right_paths: list[str],
                 n_banks: int = 4, n_threads: int = 2):
        assert len(left_paths) == len(right_paths) and left_paths
        self._lib = get_lib()
        self._h = self._lib.tsl_open(
            "\n".join(left_paths).encode(),
            "\n".join(right_paths).encode(), n_banks, n_threads)
        if not self._h:
            raise NativeLoaderUnavailable("tsl_open failed")
        self._n = self._lib.tsl_count(self._h)
        self._pending_bank = -1

    def __len__(self):
        return self._n

    def __iter__(self):
        lib = self._lib
        lp = ctypes.POINTER(ctypes.c_uint8)()
        rp = ctypes.POINTER(ctypes.c_uint8)()
        w = ctypes.c_int()
        h = ctypes.c_int()
        idx = 0
        while True:
            self._release_pending()
            bank = lib.tsl_next(self._h, ctypes.byref(lp),
                                ctypes.byref(rp), ctypes.byref(w),
                                ctypes.byref(h))
            if bank == -1:
                return
            if bank == -2:
                raise IOError(f"native decode failed at frame {idx}")
            n = w.value * h.value
            left = np.ctypeslib.as_array(lp, shape=(h.value, w.value))
            right = np.ctypeslib.as_array(rp, shape=(h.value, w.value))
            self._pending_bank = bank
            yield idx, left, right
            idx += 1

    def _release_pending(self):
        if self._pending_bank >= 0:
            self._lib.tsl_release(self._h, self._pending_bank)
            self._pending_bank = -1

    def close(self):
        if self._h:
            self._release_pending()
            self._lib.tsl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
