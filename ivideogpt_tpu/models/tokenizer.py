"""Compressive (conditional) VQGAN tokenizer, TPU-native.

Rebuild of reference ivideogpt/vq_model/compressive_vq_model.py:33-369:
context frames are encoded at full spatial detail (16x16 tokens/frame),
future frames pass through a context-cross-attention encoder and a 4x4
patchify into a tiny dynamics grid (16 tokens/frame, 16x compression).

TPU-first decisions:
- NHWC layout end to end, so patchify/de-patchify are pure reshapes
- the VQ nearest-neighbor search is the fused Pallas kernel in ops/vq.py
- fp32 parity mode available for bit-stable token ids (hard part noted in
  SURVEY.md §7); bf16 compute elsewhere
- tokenize/detokenize are pure functions of (params, pixels) and jit/pjit
  cleanly with static (ctx, T, resolution) shapes
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ivideogpt_tpu import tokens as token_lib
from ivideogpt_tpu.configs import CompressiveVQConfig
from ivideogpt_tpu.models.conditional_vae import ConditionalDecoder, ConditionalEncoder
from ivideogpt_tpu.models.vae import Decoder, Encoder
from ivideogpt_tpu.ops import vq as vq_ops


def _tile_cond_features(features: List[jnp.ndarray], batch: int,
                        context_length: int, future_length: int):
    """Repeat per-context features across future frames.

    ctx > 1: (B*ctx, H, W, C) -> (B*F, ctx, H, W, C)
    ctx == 1: (B, H, W, C)    -> (B*F, H, W, C)
    (reference compressive_vq_model.py:176-187)
    """
    out = []
    for f in features:
        if context_length > 1:
            g = f.reshape(batch, context_length, *f.shape[1:])
            g = jnp.broadcast_to(
                g[:, None], (batch, future_length, context_length, *f.shape[1:]))
            out.append(g.reshape(batch * future_length, context_length, *f.shape[1:]))
        else:
            g = jnp.broadcast_to(
                f[:, None], (f.shape[0], future_length, *f.shape[1:]))
            out.append(g.reshape(f.shape[0] * future_length, *f.shape[1:]))
    return out


def patchify(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, (H/p)*(W/p), p*p*C] with (p_h, p_w, c) inner order
    (matches reference unfold+permute, compressive_vq_model.py:193-195)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, (H // p) * (W // p), p * p * C)


def depatchify(x: jnp.ndarray, h: int, w: int, p: int, c: int) -> jnp.ndarray:
    """[B, L, p*p*c] -> [B, h, w, c] (reference compressive_vq_model.py:247-250)."""
    B = x.shape[0]
    x = x.reshape(B, h // p, w // p, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, h, w, c)


class CompressiveVQModel(nn.Module):
    config: CompressiveVQConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None  # None = auto (TPU yes, CPU no)

    def setup(self):
        c = self.config
        self.encoder = Encoder(
            out_channels=c.latent_channels,
            block_out_channels=c.block_out_channels,
            layers_per_block=c.layers_per_block,
            norm_num_groups=c.norm_num_groups,
            mid_block_add_attention=c.mid_block_add_attention,
            dropout=c.dropout, remat=c.remat, dtype=self.dtype)
        self.cond_encoder = ConditionalEncoder(
            out_channels=c.latent_channels,
            block_out_channels=c.block_out_channels,
            layers_per_block=c.layers_per_block,
            norm_num_groups=c.norm_num_groups,
            max_att_resolution=c.max_att_resolution,
            init_resolution=c.resolution,
            context_length=c.context_length,
            dropout=c.dropout, remat=c.remat,
            cross_attn_heads=c.cross_attn_heads,
            cross_attn_dropout=c.cross_attn_dropout, dtype=self.dtype)
        self.decoder = Decoder(
            out_channels=c.out_channels,
            block_out_channels=c.block_out_channels,
            layers_per_block=c.layers_per_block,
            norm_num_groups=c.norm_num_groups,
            mid_block_add_attention=c.mid_block_add_attention,
            dropout=c.dropout, remat=c.remat, dtype=self.dtype)
        self.cond_decoder = ConditionalDecoder(
            out_channels=c.out_channels,
            block_out_channels=c.block_out_channels,
            layers_per_block=c.layers_per_block,
            norm_num_groups=c.norm_num_groups,
            max_att_resolution=c.max_att_resolution,
            init_resolution=c.latent_resolution,
            context_length=c.context_length,
            dropout=c.dropout, remat=c.remat,
            cross_attn_heads=c.cross_attn_heads,
            cross_attn_dropout=c.cross_attn_dropout, dtype=self.dtype)

        d = c.embed_dim
        self.quant_conv = nn.Conv(d, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(c.latent_channels, (1, 1), dtype=self.dtype)
        self.quant_linear = nn.Dense(d, dtype=self.dtype)
        self.post_quant_linear = nn.Dense(
            c.latent_channels * c.patch_size * c.patch_size, dtype=self.dtype)

        # codebooks: uniform(-1/K, 1/K), diffusers VectorQuantizer init
        def cb_init(key, shape):
            k = shape[0]
            return jax.random.uniform(key, shape, jnp.float32, -1.0 / k, 1.0 / k)
        self.codebook = self.param(
            "codebook", cb_init, (c.num_vq_embeddings, d))
        self.dyn_codebook = self.param(
            "dyn_codebook", cb_init, (c.num_dyn_embeddings, d))

    # ------------------------------------------------------------------
    # encoding paths
    # ------------------------------------------------------------------

    def _encode_all(self, pixel_values: jnp.ndarray, context_length: int,
                    deterministic: bool = True):
        """pixel_values [B, T, H, W, C] -> (h [B*ctx, r, r, D], d [B*F, n_dyn, D])."""
        c = self.config
        B, T, H, W, C = pixel_values.shape
        F = T - context_length
        ctx = pixel_values[:, :context_length].reshape(-1, H, W, C)
        fut = pixel_values[:, context_length:].reshape(-1, H, W, C)

        h, cond_features = self.encoder(ctx, return_features=True,
                                        deterministic=deterministic)
        cond_features = _tile_cond_features(cond_features, B, context_length, F)
        h = self.quant_conv(h)

        d = self.cond_encoder(fut, cond_features, deterministic=deterministic)
        d = patchify(d, c.patch_size)
        d = self.quant_linear(d)
        return h, d

    def _decode_all(self, quant_ctx: jnp.ndarray, quant_dyn: jnp.ndarray,
                    batch: int, context_length: int, future_length: int,
                    deterministic: bool = True, cache=None, return_cache=False):
        """quant_ctx [B*ctx, r, r, D], quant_dyn [B*F, n_dyn, D] -> frames."""
        c = self.config
        r = c.latent_resolution
        quant2 = self.post_quant_conv(quant_ctx)
        quant2_d = self.post_quant_linear(quant_dyn)
        quant2_d = depatchify(quant2_d, r, r, c.patch_size, c.latent_channels)

        if cache is not None:
            context_dec, cond_features = cache["context_dec"], cache["cond_features"]
        else:
            context_dec, cond_features = self.decoder(
                quant2, return_features=True, deterministic=deterministic)
            cond_features = _tile_cond_features(
                cond_features, batch, context_length, future_length)

        dec = self.cond_decoder(quant2_d, cond_features,
                                deterministic=deterministic)
        if return_cache:
            return context_dec, dec, {"context_dec": context_dec,
                                      "cond_features": cond_features}
        return context_dec, dec

    # ------------------------------------------------------------------
    # public API (mirrors reference tokenize/detokenize/forward)
    # ------------------------------------------------------------------

    def tokenize(self, pixel_values: jnp.ndarray, context_length: int = 0
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[B, T, H, W, C] pixels -> (indices [B, L], labels [B, L]).

        Token layout per ivideogpt_tpu.tokens (reference
        compressive_vq_model.py:165-220).
        """
        c = self.config
        assert context_length == c.context_length
        B, T = pixel_values.shape[:2]
        F = T - context_length

        h, d = self._encode_all(pixel_values, context_length)
        idx_c = vq_ops.vq_lookup(
            h.reshape(-1, c.embed_dim), self.codebook, use_pallas=self.use_pallas)
        idx_d = vq_ops.vq_lookup(
            d.reshape(-1, c.embed_dim), self.dyn_codebook, use_pallas=self.use_pallas)
        idx_c = idx_c.reshape(B, context_length, c.ctx_tokens_per_frame)
        idx_d = idx_d.reshape(B, F, c.dyn_tokens_per_frame)
        return token_lib.assemble(idx_c, idx_d,
                                  c.num_vq_embeddings, c.num_dyn_embeddings)

    def detokenize(self, indices: jnp.ndarray, context_length: int = 0,
                   cache=None, return_cache: bool = False):
        """(indices [B, L]) -> frames [B, T, H, W, C] in [0, 1]-ish range.

        Supports the incremental-decode cache {context_dec, cond_features}
        (reference compressive_vq_model.py:253-255) for MBRL rollouts.
        """
        c = self.config
        assert context_length == c.context_length
        B = indices.shape[0]
        idx_c, idx_d = token_lib.disassemble(
            indices, context_length, c.num_vq_embeddings, c.num_dyn_embeddings,
            ctx_tokens=c.ctx_tokens_per_frame, dyn_tokens=c.dyn_tokens_per_frame)
        F = idx_d.shape[1]
        r = c.latent_resolution

        quant = jnp.take(self.codebook, idx_c.reshape(-1), axis=0)
        quant = quant.reshape(B * context_length, r, r, c.embed_dim).astype(self.dtype)
        quant_d = jnp.take(self.dyn_codebook, idx_d.reshape(-1), axis=0)
        quant_d = quant_d.reshape(B * F, c.dyn_tokens_per_frame,
                                  c.embed_dim).astype(self.dtype)

        out = self._decode_all(quant, quant_d, B, context_length, F,
                               cache=cache, return_cache=return_cache)
        if return_cache:
            context_dec, dec, new_cache = out
        else:
            context_dec, dec = out

        H = context_dec.shape[1]
        frames = jnp.concatenate([
            context_dec.reshape(B, context_length, H, H, c.out_channels),
            dec.reshape(B, F, H, H, c.out_channels),
        ], axis=1)
        if return_cache:
            return frames, new_cache
        return frames

    def __call__(self, sample: jnp.ndarray, dyn_sample: jnp.ndarray,
                 segment_len: int, deterministic: bool = True,
                 return_pre_out: bool = False):
        """Training forward (reference compressive_vq_model.py:332-369).

        Args:
          sample: context frames [B*ctx, H, W, C]
          dyn_sample: future frames [B*F, H, W, C]
          segment_len: F = number of future frames per sample
          return_pre_out: also return the cond_decoder conv_out input
            activation (for the adaptive GAN weight in the trainer).
        Returns:
          (dec [B*F, H, W, C], ref_dec [B*ctx, H, W, C],
           commit_loss, dyn_commit_loss[, pre_out])
        """
        c = self.config
        F = segment_len
        B = dyn_sample.shape[0] // F
        H, W = sample.shape[1:3]

        h, cond_features = self.encoder(sample, return_features=True,
                                        deterministic=deterministic)
        cond_features = _tile_cond_features(cond_features, B, c.context_length, F)
        h = self.quant_conv(h)

        d = self.cond_encoder(dyn_sample, cond_features,
                              deterministic=deterministic)
        d = patchify(d, c.patch_size)
        d = self.quant_linear(d)

        q = vq_ops.quantize(h, self.codebook, use_pallas=self.use_pallas)
        q_d = vq_ops.quantize(d, self.dyn_codebook, use_pallas=self.use_pallas)

        r = c.latent_resolution
        quant2 = self.post_quant_conv(q.quantized)
        quant2_d = self.post_quant_linear(q_d.quantized)
        quant2_d = depatchify(quant2_d, r, r, c.patch_size, c.latent_channels)

        ref_dec, dec_features = self.decoder(quant2, return_features=True,
                                             deterministic=deterministic)
        dec_features = _tile_cond_features(dec_features, B, c.context_length, F)
        dec_out = self.cond_decoder(quant2_d, dec_features,
                                    deterministic=deterministic,
                                    return_pre_out=return_pre_out)
        if return_pre_out:
            dec, pre_out = dec_out
            return dec, ref_dec, q.commit_loss, q_d.commit_loss, pre_out
        return dec_out, ref_dec, q.commit_loss, q_d.commit_loss

    # ------------------------------------------------------------------
    # incremental rollout API (used by the jitted MBRL imagination scan;
    # replaces the reference's cache trick at compressive_vq_model.py:253-255
    # with explicit context-encode / per-frame-decode entry points)
    # ------------------------------------------------------------------

    def encode_context(self, context_frames: jnp.ndarray) -> jnp.ndarray:
        """[B, ctx, H, W, C] -> context token grid [B, ctx, ctx_tokens].

        Context tokens do not depend on future frames, so rollouts can skip
        the reference's zero-padded-future tokenize (video_predictor.py:280-283).
        """
        c = self.config
        B, ctx = context_frames.shape[:2]
        flat = context_frames.reshape(-1, *context_frames.shape[2:])
        h = self.encoder(flat, deterministic=True)
        h = self.quant_conv(h)
        idx = vq_ops.vq_lookup(h.reshape(-1, c.embed_dim), self.codebook,
                               use_pallas=self.use_pallas)
        return idx.reshape(B, ctx, c.ctx_tokens_per_frame)

    def build_decode_cache(self, ctx_indices: jnp.ndarray):
        """Decode context frames once; return (context_dec, cache) where the
        cache holds decoder features tiled for single-frame decodes."""
        c = self.config
        B, ctx = ctx_indices.shape[:2]
        r = c.latent_resolution
        quant = jnp.take(self.codebook, ctx_indices.reshape(-1), axis=0)
        quant = quant.reshape(B * ctx, r, r, c.embed_dim).astype(self.dtype)
        quant2 = self.post_quant_conv(quant)
        context_dec, feats = self.decoder(quant2, return_features=True,
                                          deterministic=True)
        feats = _tile_cond_features(feats, B, ctx, 1)
        return context_dec, {"context_dec": context_dec, "cond_features": feats}

    def decode_dyn_frame(self, dyn_indices: jnp.ndarray, cache) -> jnp.ndarray:
        """[B, dyn_tokens] dynamics ids (raw, un-offset) -> one frame
        [B, H, W, C], using the cached context decoder features."""
        c = self.config
        B = dyn_indices.shape[0]
        r = c.latent_resolution
        quant_d = jnp.take(self.dyn_codebook, dyn_indices.reshape(-1), axis=0)
        quant_d = quant_d.reshape(B, c.dyn_tokens_per_frame,
                                  c.embed_dim).astype(self.dtype)
        quant2_d = self.post_quant_linear(quant_d)
        quant2_d = depatchify(quant2_d, r, r, c.patch_size, c.latent_channels)
        return self.cond_decoder(quant2_d, cache["cond_features"],
                                 deterministic=True)

    # convenience for tests / init
    def encode_indices(self, pixel_values, context_length):
        return self.tokenize(pixel_values, context_length)
