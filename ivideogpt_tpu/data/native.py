"""ctypes binding for the native segment-preprocessing library.

Falls back to the cv2 path in augment.py when the shared library has not
been built (native/build.sh).

Measured honesty note: at 64px output cv2's fixed-point SIMD resize is
~2x faster than this fused scalar kernel (0.26 vs 0.49 ms per 8-frame
segment), so cv2 remains the default; this backend exists for environments
without opencv and as the substrate for future fused augmentations
(opt-in via IVG_NATIVE_PREPROC=1). Output matches cv2 to 6e-8.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libsegment_ops.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.segment_crop_resize_normalize_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
    ]
    lib.segment_crop_resize_normalize_u8.restype = None
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def segment_crop_resize(images: np.ndarray, ci: int, cj: int, ch: int,
                        cw: int, size: int, mul: float = 1.0,
                        add: float = 0.0) -> Optional[np.ndarray]:
    """[T, H, W, C] uint8 -> [T, size, size, C] float32 in [0,1], fused
    crop+bilinear+normalize. None when the library isn't built."""
    lib = _load()
    if lib is None:
        return None
    images = np.ascontiguousarray(images, np.uint8)
    t, h, w, c = images.shape
    out = np.empty((t, size, size, c), np.float32)
    lib.segment_crop_resize_normalize_u8(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t, h, w, c, ci, cj, ch, cw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size, size, float(mul), float(add))
    return out
