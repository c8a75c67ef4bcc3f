"""Context-conditional encoder/decoder with cross-attention injection.

TPU-native rebuild of reference ivideogpt/vq_model/conditional_vae.py:10-212:
the dynamics branch attends to the context branch's feature pyramid at every
resolution <= ``max_att_resolution``, with learned q/kv positional embeddings.

NHWC throughout; attention as one batched einsum chain (maps straight onto the
MXU; no nn.MultiheadAttention-style packed projections at runtime — the
checkpoint bridge splits torch's in_proj into q/k/v).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ivideogpt_tpu.ops.norms import GroupNorm

from ivideogpt_tpu.models.vae import DownBlock, MidBlock, UpBlock


class CrossAttentionBlock(nn.Module):
    """q from the dynamics path, kv from context features.

    Semantics of reference conditional_vae.py:10-55:
      kv = GN(addin) + kv_pos_emb ; q = GN(z) + q_pos_emb
      out = MHA(q, kv, kv) ; z = act(z + dropout(out))
    The residual uses the *un-normalized* z.
    """
    channels: int
    resolution: int
    kv_frames: int = 1
    num_heads: int = 4
    dropout: float = 0.1
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, addin, *, deterministic: bool = True):
        # z: [B, H, W, C]; addin: [B, H, W, C] or [B, t, H, W, C]
        B, H, W, C = z.shape
        R2 = self.resolution * self.resolution
        if addin.ndim == 5:
            kv_in = addin.reshape(B, -1, C)             # (t,h,w) row-major
        else:
            kv_in = addin.reshape(B, -1, C)

        kv_pos = self.param("kv_pos_emb", nn.initializers.zeros,
                            (self.kv_frames * R2, C))
        q_pos = self.param("q_pos_emb", nn.initializers.zeros, (R2, C))

        kv = GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                          dtype=self.dtype, name="kv_norm")(kv_in)
        kv = kv + kv_pos.astype(kv.dtype)
        q = GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                         dtype=self.dtype, name="q_norm")(z.reshape(B, H * W, C))
        q = q + q_pos.astype(q.dtype)

        hd = C // self.num_heads
        qh = nn.Dense(C, dtype=self.dtype, name="q_proj")(q)
        kh = nn.Dense(C, dtype=self.dtype, name="k_proj")(kv)
        vh = nn.Dense(C, dtype=self.dtype, name="v_proj")(kv)
        qh = qh.reshape(B, -1, self.num_heads, hd)
        kh = kh.reshape(B, -1, self.num_heads, hd)
        vh = vh.reshape(B, -1, self.num_heads, hd)

        attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32)
        attn = nn.softmax(attn * (hd ** -0.5), axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(self.dtype), vh)
        out = out.reshape(B, -1, C)
        out = nn.Dense(C, dtype=self.dtype, name="out_proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)

        return nn.silu(z + out.reshape(B, H, W, C))


class ConditionalEncoder(nn.Module):
    """Encoder whose down path cross-attends to context features
    (reference conditional_vae.py:58-132). Mid attention always on."""
    out_channels: int
    block_out_channels: Sequence[int] = (128, 256, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    max_att_resolution: int = 16
    init_resolution: int = 64
    context_length: int = 1
    dropout: float = 0.0
    remat: bool = False
    cross_attn_heads: int = 4
    cross_attn_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, cond_features: List[jnp.ndarray], *,
                 deterministic: bool = True):
        sample = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                         dtype=self.dtype, name="conv_in")(sample)

        DB = nn.remat(DownBlock, static_argnums=(2,)) if self.remat else DownBlock
        n = len(self.block_out_channels)
        resolution = self.init_resolution
        att_idx = 0
        for i, ch in enumerate(self.block_out_channels):
            is_final = i == n - 1
            sample = DB(
                ch, num_layers=self.layers_per_block, add_downsample=not is_final,
                groups=self.norm_num_groups, dropout=self.dropout,
                dtype=self.dtype, name=f"down_blocks_{i}")(
                sample, deterministic)
            if not is_final:
                resolution //= 2
            if resolution <= self.max_att_resolution:
                sample = CrossAttentionBlock(
                    ch, resolution, kv_frames=self.context_length,
                    num_heads=self.cross_attn_heads,
                    dropout=self.cross_attn_dropout,
                    norm_groups=self.norm_num_groups,
                    dtype=self.dtype, name=f"cross_att_blocks_{att_idx}")(
                    sample, cond_features[i + 1], deterministic=deterministic)
                att_idx += 1

        sample = MidBlock(self.block_out_channels[-1], add_attention=True,
                          groups=self.norm_num_groups, dropout=self.dropout,
                          dtype=self.dtype, name="mid_block")(
            sample, deterministic=deterministic)

        sample = GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                              dtype=self.dtype, name="conv_norm_out")(sample)
        sample = nn.silu(sample)
        sample = nn.Conv(self.out_channels, (3, 3), padding=1,
                         dtype=self.dtype, name="conv_out")(sample)
        return sample


class ConditionalDecoder(nn.Module):
    """Decoder whose up path cross-attends to context decoder features
    (reference conditional_vae.py:135-212). Mid attention always on."""
    out_channels: int
    block_out_channels: Sequence[int] = (128, 256, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    max_att_resolution: int = 16
    init_resolution: int = 16
    context_length: int = 1
    dropout: float = 0.0
    remat: bool = False
    cross_attn_heads: int = 4
    cross_attn_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, cond_features: List[jnp.ndarray], *,
                 deterministic: bool = True, return_pre_out: bool = False):
        """return_pre_out additionally yields the conv_out input activation,
        used by the trainer's adaptive GAN weight (grad of perceptual/gan
        losses w.r.t. the final conv kernel, reference
        train_tokenizer.py:714-722)."""
        rev = list(reversed(self.block_out_channels))
        sample = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype,
                         name="conv_in")(sample)

        sample = MidBlock(rev[0], add_attention=True,
                          groups=self.norm_num_groups, dropout=self.dropout,
                          dtype=self.dtype, name="mid_block")(
            sample, deterministic=deterministic)

        # first cross block always exists at init_resolution, fed by the
        # context decoder's mid feature (reference :168-170,:199)
        sample = CrossAttentionBlock(
            rev[0], self.init_resolution, kv_frames=self.context_length,
            num_heads=self.cross_attn_heads, dropout=self.cross_attn_dropout,
            norm_groups=self.norm_num_groups,
            dtype=self.dtype, name="cross_att_blocks_0")(
            sample, cond_features[1], deterministic=deterministic)

        UB = nn.remat(UpBlock, static_argnums=(2,)) if self.remat else UpBlock
        n = len(rev)
        resolution = self.init_resolution
        att_idx = 1
        for i, ch in enumerate(rev):
            is_final = i == n - 1
            sample = UB(
                ch, num_layers=self.layers_per_block + 1,
                add_upsample=not is_final, groups=self.norm_num_groups,
                dropout=self.dropout, dtype=self.dtype,
                name=f"up_blocks_{i}")(sample, deterministic)
            if not is_final:
                resolution *= 2
            if resolution <= self.max_att_resolution:
                sample = CrossAttentionBlock(
                    ch, resolution, kv_frames=self.context_length,
                    num_heads=self.cross_attn_heads,
                    dropout=self.cross_attn_dropout,
                    norm_groups=self.norm_num_groups,
                    dtype=self.dtype, name=f"cross_att_blocks_{att_idx}")(
                    sample, cond_features[i + 2], deterministic=deterministic)
                att_idx += 1

        sample = GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                              dtype=self.dtype, name="conv_norm_out")(sample)
        pre_out = nn.silu(sample)
        sample = nn.Conv(self.out_channels, (3, 3), padding=1,
                         dtype=self.dtype, name="conv_out")(pre_out)
        if return_pre_out:
            return sample, pre_out
        return sample
