"""Conv encoder/decoder backbone, TPU-first (NHWC, bf16-friendly).

Functionally equivalent to the diffusers-UNet-block stacks used by the
reference (reference: ivideogpt/vq_model/vae.py:47-371 building
DownEncoderBlock2D / UpDecoderBlock2D / UNetMidBlock2D), re-written as plain
Flax modules in channels-last layout (XLA:TPU's native conv layout; avoids
the NCHW<->NHWC transposes a torch port would pay on every conv).

Block semantics preserved exactly:
- ResnetBlock: GN(32, eps=1e-6) -> SiLU -> 3x3 -> GN -> SiLU -> drop -> 3x3,
  1x1 shortcut when channels change, output_scale_factor=1
- Downsample: asymmetric pad (0,1)x(0,1) + 3x3 stride-2 conv (padding=0
  variant, as configured at reference vae.py:111)
- Upsample: nearest 2x + 3x3 conv
- Mid block: resnet, [single-head self-attention], resnet
- Encoder returns the multiscale feature pyramid when ``return_features``
  (reference vae.py:141-195) for cross-attention conditioning.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ivideogpt_tpu.ops.norms import GroupNorm

# Parameter dtype is fp32; compute dtype can be bf16 (MXU-native) or fp32
# (token-id parity mode for the quantization path).


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    eps: float = 1e-6
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_ch = x.shape[-1]
        h = GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class Downsample(nn.Module):
    """3x3 stride-2 conv with the reference's asymmetric (0,1) pad."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                       padding="VALID", dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """Nearest-neighbor 2x (exact torch 'nearest' semantics) + 3x3 conv."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class AttnBlock(nn.Module):
    """Single-head self-attention over spatial positions (mid-block style:
    attention_head_dim == channels => 1 head, residual, scale 1)."""
    channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        # single head: softmax in fp32 for stability
        attn = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32)
        attn = nn.softmax(attn * (C ** -0.5), axis=-1).astype(self.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = nn.Dense(C, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(B, H, W, C)


class MidBlock(nn.Module):
    channels: int
    add_attention: bool = True
    groups: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = ResnetBlock(self.channels, groups=self.groups, dropout=self.dropout,
                        dtype=self.dtype, name="resnets_0")(
            x, deterministic=deterministic)
        if self.add_attention:
            x = AttnBlock(self.channels, groups=self.groups, dtype=self.dtype,
                          name="attentions_0")(x)
        x = ResnetBlock(self.channels, groups=self.groups, dropout=self.dropout,
                        dtype=self.dtype, name="resnets_1")(
            x, deterministic=deterministic)
        return x


class DownBlock(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    groups: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.num_layers):
            x = ResnetBlock(self.out_channels, groups=self.groups,
                            dropout=self.dropout, dtype=self.dtype,
                            name=f"resnets_{i}")(x, deterministic=deterministic)
        if self.add_downsample:
            x = Downsample(self.out_channels, dtype=self.dtype,
                           name="downsamplers_0")(x)
        return x


class UpBlock(nn.Module):
    out_channels: int
    num_layers: int = 3  # layers_per_block + 1, reference vae.py:273
    add_upsample: bool = True
    groups: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.num_layers):
            x = ResnetBlock(self.out_channels, groups=self.groups,
                            dropout=self.dropout, dtype=self.dtype,
                            name=f"resnets_{i}")(x, deterministic=deterministic)
        if self.add_upsample:
            x = Upsample(self.out_channels, dtype=self.dtype,
                         name="upsamplers_0")(x)
        return x


class Encoder(nn.Module):
    """NHWC conv encoder; features pyramid = [conv_in, *down_blocks, mid].

    remat=True rematerializes each block in the backward pass
    (jax.checkpoint), trading FLOPs for activation memory — the knob for
    the 256px tokenizer (reference trains it at micro-batch 2 on A100-40GB).
    """
    out_channels: int
    block_out_channels: Sequence[int] = (128, 256, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    mid_block_add_attention: bool = True
    dropout: float = 0.0
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, *, return_features: bool = False,
                 deterministic: bool = True):
        features: List[jnp.ndarray] = []
        sample = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                         dtype=self.dtype, name="conv_in")(sample)
        features.append(sample)

        DB = nn.remat(DownBlock, static_argnums=(2,)) if self.remat else DownBlock
        MB = nn.remat(MidBlock, static_argnums=(2,)) if self.remat else MidBlock
        n = len(self.block_out_channels)
        for i, ch in enumerate(self.block_out_channels):
            sample = DB(
                ch, num_layers=self.layers_per_block,
                add_downsample=(i != n - 1), groups=self.norm_num_groups,
                dropout=self.dropout, dtype=self.dtype,
                name=f"down_blocks_{i}")(sample, deterministic)
            features.append(sample)

        sample = MB(self.block_out_channels[-1],
                    add_attention=self.mid_block_add_attention,
                    groups=self.norm_num_groups, dropout=self.dropout,
                    dtype=self.dtype, name="mid_block")(sample, deterministic)
        features.append(sample)

        sample = GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                              dtype=self.dtype, name="conv_norm_out")(sample)
        sample = nn.silu(sample)
        sample = nn.Conv(self.out_channels, (3, 3), padding=1,
                         dtype=self.dtype, name="conv_out")(sample)
        if return_features:
            return sample, features
        return sample


class Decoder(nn.Module):
    """NHWC conv decoder; features pyramid = [conv_in, mid, *up_blocks]."""
    out_channels: int
    block_out_channels: Sequence[int] = (128, 256, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    mid_block_add_attention: bool = True
    dropout: float = 0.0
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, *, return_features: bool = False,
                 deterministic: bool = True):
        features: List[jnp.ndarray] = []
        rev = list(reversed(self.block_out_channels))
        sample = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype,
                         name="conv_in")(sample)
        features.append(sample)

        UB = nn.remat(UpBlock, static_argnums=(2,)) if self.remat else UpBlock
        MB = nn.remat(MidBlock, static_argnums=(2,)) if self.remat else MidBlock
        sample = MB(rev[0], add_attention=self.mid_block_add_attention,
                    groups=self.norm_num_groups, dropout=self.dropout,
                    dtype=self.dtype, name="mid_block")(sample, deterministic)
        features.append(sample)

        n = len(rev)
        for i, ch in enumerate(rev):
            sample = UB(
                ch, num_layers=self.layers_per_block + 1,
                add_upsample=(i != n - 1), groups=self.norm_num_groups,
                dropout=self.dropout, dtype=self.dtype,
                name=f"up_blocks_{i}")(sample, deterministic)
            features.append(sample)

        sample = GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                              dtype=self.dtype, name="conv_norm_out")(sample)
        sample = nn.silu(sample)
        sample = nn.Conv(self.out_channels, (3, 3), padding=1,
                         dtype=self.dtype, name="conv_out")(sample)
        if return_features:
            return sample, features
        return sample
