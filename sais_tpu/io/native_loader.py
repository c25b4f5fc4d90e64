"""ctypes wrapper for the native frame_pump decode pipeline.

Falls back to the pure-python OpenCV reader when the shared library is not
built; `ensure_built()` compiles it on demand with the system toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libframe_pump.so")
_lib = None


def ensure_built(quiet: bool = True) -> bool:
    """Build libframe_pump.so if missing OR older than its source (a stale
    prebuilt library would silently keep superseded preprocessing — e.g.
    the pre-round-3 INTER_AREA resize instead of the PIL-exact resample);
    returns availability."""
    global _lib
    if _lib is not None:
        return True
    src = os.path.join(_NATIVE_DIR, "frame_pump.cpp")
    stale = (os.path.exists(_LIB_PATH) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
    if not os.path.exists(_LIB_PATH) or stale:
        try:
            subprocess.run(["bash", os.path.join(_NATIVE_DIR, "build.sh")],
                           check=True,
                           capture_output=quiet)
        except Exception:
            return False
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return False
    lib.fp_open.restype = ctypes.c_void_p
    lib.fp_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_double,
                            ctypes.c_double, ctypes.c_int]
    lib.fp_meta.restype = ctypes.c_int
    lib.fp_meta.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
                            ctypes.POINTER(ctypes.c_long),
                            ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_int)]
    lib.fp_read.restype = ctypes.c_long
    lib.fp_read.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long]
    lib.fp_close.restype = None
    lib.fp_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return True


class NativeFramePump:
    """Background-threaded decode + center-crop + resize to uint8 RGB.

    Yields (B, out_size, out_size, 3) batches ready for on-device
    normalization; decode overlaps the consumer's TPU work.
    """

    def __init__(self, path: str, out_size: int = 224,
                 crop_h_frac: float = 0.8, crop_w_frac: float = 0.8,
                 queue_cap: int = 256):
        if not ensure_built():
            raise RuntimeError("libframe_pump.so unavailable")
        self._h = _lib.fp_open(path.encode(), out_size, crop_h_frac,
                               crop_w_frac, queue_cap)
        if not self._h:
            # fp_open also returns null for an EXISTING file OpenCV can't
            # decode; RuntimeError keeps the caller's construction-only
            # fallback working (a FileNotFoundError here would escape
            # extract_video's handler, which checks existence itself)
            if not os.path.exists(path):
                raise FileNotFoundError(path)
            raise RuntimeError(f"native decoder could not open {path}")
        self.out_size = out_size
        fps = ctypes.c_double()
        nf = ctypes.c_long()
        hh = ctypes.c_int()
        ww = ctypes.c_int()
        _lib.fp_meta(self._h, ctypes.byref(fps), ctypes.byref(nf),
                     ctypes.byref(hh), ctypes.byref(ww))
        self.fps = fps.value
        self.frame_count = nf.value
        self.source_size = (hh.value, ww.value)

    def read(self, max_frames: int) -> Optional[np.ndarray]:
        out = np.empty((max_frames, self.out_size, self.out_size, 3),
                       np.uint8)
        n = _lib.fp_read(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            max_frames)
        if n <= 0:
            return None
        return out[:n]

    def batches(self, batch_size: int) -> Iterator[np.ndarray]:
        while True:
            b = self.read(batch_size)
            if b is None:
                return
            yield b

    def close(self) -> None:
        if self._h:
            _lib.fp_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
