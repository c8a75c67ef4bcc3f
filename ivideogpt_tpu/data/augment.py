"""Host-side image augmentation in numpy/cv2 (no torch).

Reproduces the torchvision transforms the reference applies per segment
(reference ivideogpt/data/simple_dataloader.py:216-388): one shared
random-resized-crop + color-jitter parameter set for all frames of a segment,
random application order for the jitter ops.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import cv2
import numpy as np


def get_crop_params(height: int, width: int, scale, ratio,
                    rng: np.random.Generator) -> Tuple[int, int, int, int]:
    """(i, j, h, w) for a random resized crop; area based on min(h,w)^2
    (reference simple_dataloader.py:216-254)."""
    area = min(height, width) ** 2
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(*log_ratio))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            i = int(rng.integers(0, height - h + 1))
            j = int(rng.integers(0, width - w + 1))
            return i, j, h, w
    # central fallback
    in_ratio = width / height
    if in_ratio < min(ratio):
        w, h = width, int(round(width / min(ratio)))
    elif in_ratio > max(ratio):
        h, w = height, int(round(height * max(ratio)))
    else:
        w, h = width, height
    return (height - h) // 2, (width - w) // 2, h, w


def resized_crop(img: np.ndarray, i: int, j: int, h: int, w: int,
                 size: int) -> np.ndarray:
    """img [H, W, C] float -> [size, size, C], bilinear."""
    crop = img[i:i + h, j:j + w]
    return cv2.resize(crop, (size, size), interpolation=cv2.INTER_LINEAR)


def resize(img: np.ndarray, size: int) -> np.ndarray:
    return cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)


def center_crop_square(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    s = min(h, w)
    i, j = (h - s) // 2, (w - s) // 2
    return img[i:i + s, j:j + s]


def _blend(a: np.ndarray, b: np.ndarray, f: float) -> np.ndarray:
    return np.clip(f * a + (1.0 - f) * b, 0.0, 1.0)


def _grayscale(img: np.ndarray) -> np.ndarray:
    g = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    return g[..., None]


def adjust_brightness(img: np.ndarray, f: float) -> np.ndarray:
    return _blend(img, np.zeros_like(img), f)


def adjust_contrast(img: np.ndarray, f: float) -> np.ndarray:
    mean = _grayscale(img).mean()
    return _blend(img, np.full_like(img, mean), f)


def adjust_saturation(img: np.ndarray, f: float) -> np.ndarray:
    return _blend(img, np.broadcast_to(_grayscale(img), img.shape), f)


def adjust_hue(img: np.ndarray, f: float) -> np.ndarray:
    """f in [-0.5, 0.5], fraction of the hue circle."""
    hsv = cv2.cvtColor(img.astype(np.float32), cv2.COLOR_RGB2HSV)
    hsv[..., 0] = (hsv[..., 0] + f * 360.0) % 360.0
    return np.clip(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB), 0.0, 1.0)


def jitter_params(brightness, contrast, saturation, hue,
                  rng: np.random.Generator):
    order = rng.permutation(4)
    b = None if brightness is None else float(rng.uniform(*brightness))
    c = None if contrast is None else float(rng.uniform(*contrast))
    s = None if saturation is None else float(rng.uniform(*saturation))
    h = None if hue is None else float(rng.uniform(*hue))
    return order, b, c, s, h


def apply_jitter(img: np.ndarray, order, b, c, s, h) -> np.ndarray:
    for fn in order:
        if fn == 0 and b is not None:
            img = adjust_brightness(img, b)
        elif fn == 1 and c is not None:
            img = adjust_contrast(img, c)
        elif fn == 2 and s is not None:
            img = adjust_saturation(img, s)
        elif fn == 3 and h is not None:
            img = adjust_hue(img, h)
    return img


def augment_segment(images: np.ndarray, image_size: int,
                    crop_scale, crop_ratio,
                    brightness, contrast, saturation, hue,
                    rng: np.random.Generator) -> np.ndarray:
    """images [T, H, W, C] uint8 -> [T, size, size, C] float32 in [0, 1],
    one shared parameter draw across the segment."""
    import os
    T, H, W, _ = images.shape
    i, j, h, w = get_crop_params(H, W, crop_scale or (1.0, 1.0),
                                 crop_ratio or (1.0, 1.0), rng)
    order, b, c, s, hu = jitter_params(brightness, contrast, saturation, hue, rng)

    if os.environ.get("IVG_NATIVE_PREPROC") == "1":
        from ivideogpt_tpu.data import native
        fused = native.segment_crop_resize(images, i, j, h, w, image_size)
        if fused is not None:
            for t in range(T):
                fused[t] = apply_jitter(fused[t], order, b, c, s, hu)
            return fused

    out = np.empty((T, image_size, image_size, images.shape[-1]), np.float32)
    for t in range(T):
        img = images[t].astype(np.float32) / 255.0
        img = resized_crop(img, i, j, h, w, image_size)
        out[t] = apply_jitter(img, order, b, c, s, hu)
    return out
