"""LPIPS perceptual loss (VGG16 backbone) in Flax.

Rebuild of reference ivideogpt/vq_model/lpips.py:84-167: five VGG16 feature
taps -> channel-unit-normalize -> 1x1 linear heads -> spatial mean -> sum.

The reference auto-downloads the LPIPS linear weights + torchvision VGG16
(reference lpips.py:44-60,119). This environment has no egress, so weights
load from a local file when available (``load_torch_lpips``); otherwise the
module runs with its random init — still a valid perceptual-style loss for
throughput benchmarking, clearly flagged via ``pretrained=False``.

Input convention matches the reference: NHWC images in [-1, 1].
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 feature extraction: conv counts per slice and tap points
# (torchvision VGG16 features; taps after relu1_2, relu2_2, relu3_3,
# relu4_3, relu5_3 — reference lpips.py:119-167)
_VGG_SLICES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

_IMAGENET_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_IMAGENET_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class _VGGFeatures(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        for s, (ch, n_convs) in enumerate(_VGG_SLICES):
            for i in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{s}_{i}")(x)
                x = nn.relu(x)
            taps.append(x)
            if s < len(_VGG_SLICES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Perceptual distance; __call__(a, b) -> [B] per-sample loss."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_IMAGENET_SHIFT, self.dtype)
        scale = jnp.asarray(_IMAGENET_SCALE, self.dtype)
        vgg = _VGGFeatures(dtype=self.dtype, name="vgg")
        fa = vgg((a - shift) / scale)
        fb = vgg((b - shift) / scale)
        total = 0.0
        for s, (xa, xb) in enumerate(zip(fa, fb)):
            d = jnp.square(_unit_normalize(xa) - _unit_normalize(xb))
            # 1x1 linear head (non-negative weights in original LPIPS)
            w = self.param(f"lin{s}", nn.initializers.ones, (d.shape[-1],))
            d = jnp.sum(d * jnp.abs(w).astype(d.dtype), axis=-1)
            total = total + jnp.mean(d, axis=(1, 2))
        return total


def load_torch_lpips(params, vgg_path=None, lin_path=None):
    """Graft torchvision VGG16 + LPIPS linear weights into our param tree.

    vgg_path: a torch state_dict (``torchvision.models.vgg16``) .pth file.
    lin_path: the LPIPS ``vgg.pth`` linear-head file the reference downloads.
    Returns updated params; silently returns input if files are absent.
    """
    import os
    if vgg_path is None or not os.path.exists(vgg_path):
        return params, False
    import torch

    sd = torch.load(vgg_path, map_location="cpu")
    # torchvision vgg16 features indices of convs in order
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    flat_names = [f"conv{s}_{i}" for s, (_, n) in enumerate(_VGG_SLICES)
                  for i in range(n)]
    new = params
    import flax
    new = flax.core.unfreeze(new) if hasattr(flax.core, "unfreeze") else dict(new)
    vgg_params = new["params"]["vgg"]
    for name, idx in zip(flat_names, conv_idx):
        w = sd[f"features.{idx}.weight"].numpy().transpose(2, 3, 1, 0)  # OIHW->HWIO
        b = sd[f"features.{idx}.bias"].numpy()
        vgg_params[name]["kernel"] = jnp.asarray(w)
        vgg_params[name]["bias"] = jnp.asarray(b)
    if lin_path is not None and os.path.exists(lin_path):
        lin = torch.load(lin_path, map_location="cpu")
        for s in range(5):
            key = f"lin{s}.model.1.weight"
            if key in lin:
                new["params"][f"lin{s}"] = jnp.asarray(
                    lin[key].numpy()[0, :, 0, 0])
    return new, True
