"""I3D (Inflated Inception-V1) feature extractor for FVD, in Flax.

Replaces the reference's opaque TorchScript binary (``i3d_torchscript.pt``,
reference ivideogpt/utils/video_metric.py:26, download at README.md:27) with
a native NDHWC implementation. Weight loading from a converted torch
state_dict reproduces the ``rescale/resize/return_features`` kwargs semantics
the reference passes (train_gpt.py:342):

- rescale: inputs in [0,1] are mapped to [-1,1]
- resize: bilinear to 224x224
- return_features: pre-softmax 400-d logits (the FVD feature)

Architecture: Carreira & Zisserman, "Quo Vadis" (2017); channel spec matches
the public kinetics-400 I3D (same module names as the piergiaj/kinetics_i3d
torch port, so converted checkpoints map 1:1).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class Unit3D(nn.Module):
    """Conv3d + BN + ReLU (I3D basic unit)."""
    out_channels: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # TF-style SAME padding (the original I3D is a TF model)
        x = nn.Conv(self.out_channels, tuple(self.kernel),
                    strides=tuple(self.stride), padding="SAME",
                    use_bias=not self.use_bn, dtype=self.dtype,
                    name="conv3d")(x)
        if self.use_bn:
            # inference-mode BN: scale/bias/mean/var loaded from checkpoint
            c = x.shape[-1]
            scale = self.param("bn_scale", nn.initializers.ones, (c,))
            bias = self.param("bn_bias", nn.initializers.zeros, (c,))
            mean = self.param("bn_mean", nn.initializers.zeros, (c,))
            var = self.param("bn_var", nn.initializers.ones, (c,))
            x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        if self.activation:
            x = nn.relu(x)
        return x


class InceptionBlock(nn.Module):
    """Four-branch 3D inception module."""
    ch: Sequence[int]  # (b0, b1a, b1b, b2a, b2b, b3b)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b0 = Unit3D(self.ch[0], dtype=self.dtype, name="b0")(x)
        b1 = Unit3D(self.ch[1], dtype=self.dtype, name="b1a")(x)
        b1 = Unit3D(self.ch[2], (3, 3, 3), dtype=self.dtype, name="b1b")(b1)
        b2 = Unit3D(self.ch[3], dtype=self.dtype, name="b2a")(x)
        b2 = Unit3D(self.ch[4], (3, 3, 3), dtype=self.dtype, name="b2b")(b2)
        b3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
        b3 = Unit3D(self.ch[5], dtype=self.dtype, name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


_INCEPTION_SPEC = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


class I3D(nn.Module):
    """videos [B, T, H, W, 3] -> [B, num_classes] pre-softmax logits."""
    num_classes: int = 400
    rescale: bool = True
    resize: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.resize and x.shape[2:4] != (224, 224):
            B, T = x.shape[:2]
            x = jax.image.resize(x, (B, T, 224, 224, x.shape[-1]), "bilinear")
        if self.rescale:
            x = x * 2.0 - 1.0

        x = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=self.dtype,
                   name="Conv3d_1a_7x7")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = Unit3D(64, dtype=self.dtype, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), dtype=self.dtype, name="Conv3d_2c_3x3")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")

        x = InceptionBlock(_INCEPTION_SPEC["Mixed_3b"], dtype=self.dtype,
                           name="Mixed_3b")(x)
        x = InceptionBlock(_INCEPTION_SPEC["Mixed_3c"], dtype=self.dtype,
                           name="Mixed_3c")(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        for name in ["Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"]:
            x = InceptionBlock(_INCEPTION_SPEC[name], dtype=self.dtype,
                               name=name)(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        x = InceptionBlock(_INCEPTION_SPEC["Mixed_5b"], dtype=self.dtype,
                           name="Mixed_5b")(x)
        x = InceptionBlock(_INCEPTION_SPEC["Mixed_5c"], dtype=self.dtype,
                           name="Mixed_5c")(x)

        # global spatial avg-pool, temporal mean, logits conv
        x = jnp.mean(x, axis=(2, 3), keepdims=True)  # B, T', 1, 1, C
        x = Unit3D(self.num_classes, use_bn=False, activation=False,
                   dtype=self.dtype, name="logits")(x)
        return jnp.mean(x, axis=(1, 2, 3))  # B, num_classes


def load_torch_i3d(params: dict, path: str) -> tuple[dict, bool]:
    """Load a converted torch I3D state_dict (piergiaj naming) if present."""
    import os
    if path is None or not os.path.exists(path):
        return params, False
    import numpy as np
    import torch
    sd = torch.load(path, map_location="cpu")

    import flax
    tree = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else dict(params)

    def put(flax_mod: dict, torch_base: str):
        w = sd[f"{torch_base}.conv3d.weight"].numpy()  # OI DHW
        flax_mod["conv3d"]["kernel"] = jnp.asarray(
            np.transpose(w, (2, 3, 4, 1, 0)))  # DHWIO
        if f"{torch_base}.conv3d.bias" in sd:
            flax_mod["conv3d"]["bias"] = jnp.asarray(
                sd[f"{torch_base}.conv3d.bias"].numpy())
        if f"{torch_base}.bn.weight" in sd:
            flax_mod["bn_scale"] = jnp.asarray(sd[f"{torch_base}.bn.weight"].numpy())
            flax_mod["bn_bias"] = jnp.asarray(sd[f"{torch_base}.bn.bias"].numpy())
            flax_mod["bn_mean"] = jnp.asarray(
                sd[f"{torch_base}.bn.running_mean"].numpy())
            flax_mod["bn_var"] = jnp.asarray(
                sd[f"{torch_base}.bn.running_var"].numpy())

    p = tree["params"]
    name_map = {"b0": "b0", "b1a": "b1a", "b1b": "b1b",
                "b2a": "b2a", "b2b": "b2b", "b3b": "b3b"}
    for mod in p:
        if mod.startswith("Mixed"):
            for branch, tname in name_map.items():
                put(p[mod][branch], f"{mod}.{tname}")
        elif mod != "logits":
            put(p[mod], mod)
    put(p["logits"], "logits")
    return tree, True
