"""LLaMA-architecture causal LM, TPU-native (Flax linen, functional KV cache).

Matches HF Llama semantics (RMSNorm, rotate-half RoPE, SwiGLU, no biases,
fp32 softmax) as used by the reference (reference: train_gpt.py:585-597 with
configs/llama/config.json; vocab overwritten to 16386 at runtime).

TPU-first decisions:
- the KV cache is an explicit pytree threaded through ``lax.scan`` — the whole
  autoregressive decode jits to a single XLA program with static shapes, no
  host round-trips per token (unlike the reference's HF ``generate`` loop at
  transformer/action_model.py:86-110)
- bf16 activations, fp32 logits/softmax/loss
- weights laid out so a ("data", "model") mesh can shard the MLP/attention
  projections along "model" (GSPMD handles the collectives)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ivideogpt_tpu.configs import TransformerConfig
from ivideogpt_tpu.tokens import IGNORE_INDEX


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float,
                 dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HF-convention RoPE tables: cos/sin [..., head_dim] with freqs duplicated."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                                / head_dim))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, S, H, hd]; cos/sin: [B, S, hd] (broadcast over heads)."""
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    return x * c + _rotate_half(x) * s


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (xf * w).astype(self.dtype)


def _prefill_causal_attention(q, k, v, dtype, chunk: int = 128):
    """Fresh-KV causal attention for the prefill of a cached decode.

    q/k/v: [B, S, H, hd] (post-RoPE). Reading the padded M-slot cache back
    for the prefill wastes (M - S)/M of the score traffic and forces the
    int8 scale folds through extra full-size fp32 passes; the fresh k/v are
    still in registers here and are *exact* (unquantized).

    Queries are processed in static chunks: chunk block at q0 attends only
    keys [0, q0+chunk) — exact under causality, ~2x less score compute and
    traffic (triangle vs square), and the fp32 score temp shrinks from
    [B, H, S, S] to [B, H, chunk, S] (the prefill OOM driver at B >= 320).

    IVG_FLASH_PREFILL=1 routes long TPU prefills to the stock Pallas
    flash-attention kernel instead. Measured on v5e (B=256, S=514, H=12,
    hd=64): the flash kernel LOSES badly — 4.18s vs 2.87s per bench
    rollout (grid of B*H small-block programs; same pattern as the ghdm
    decode kernel) — so the chunked XLA form is the default by measurement.
    """
    B, S, H, hd = q.shape
    import os
    if (S >= 256 and jax.default_backend() == "tpu"
            and os.environ.get("IVG_FLASH_PREFILL", "0") == "1"):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)
        Sp = -(-S // 128) * 128

        def pad_t(x):  # [B, S, H, hd] -> [B, H, Sp, hd]
            x = jnp.moveaxis(x, 2, 1)
            return jnp.pad(x, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))

        # causal masking makes the padded tail inert: padded KEYS sit at
        # positions >= S, never visible to a real query; padded QUERIES
        # produce rows that are sliced off below
        out = flash_attention(pad_t(q), pad_t(k), pad_t(v), causal=True,
                              sm_scale=hd ** -0.5)
        out = jnp.moveaxis(out[:, :, :S], 1, 2)
        return out.reshape(B, S, H * hd).astype(dtype)

    def block(q0, cs):
        qb = jax.lax.slice_in_dim(q, q0, q0 + cs, axis=1)
        kb = jax.lax.slice_in_dim(k, 0, q0 + cs, axis=1)
        vb = jax.lax.slice_in_dim(v, 0, q0 + cs, axis=1)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qb, kb).astype(jnp.float32)
        attn = attn * (hd ** -0.5)
        kpos = jnp.arange(q0 + cs)[None, :]
        qpos = (q0 + jnp.arange(cs))[:, None]
        attn = jnp.where((kpos <= qpos)[None, None], attn,
                         jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", attn.astype(dtype), vb)

    if S <= chunk:
        out = block(0, S)
    else:
        out = jnp.concatenate(
            [block(q0, min(chunk, S - q0)) for q0 in range(0, S, chunk)],
            axis=1)
    return out.reshape(B, S, H * hd)


class LlamaAttention(nn.Module):
    config: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, *, mask=None, cache=None, cache_index=None,
                 deterministic: bool = True, read_len: Optional[int] = None):
        """x: [B, S, D]. If cache is given, returns (out, new_cache).

        cache: {"k": [B, M, Hkv, hd], "v": ...} with S new positions written
        at cache_index (an int32 scalar).

        read_len: static upper bound on the valid cache length — attention
        reads (and scores/softmax) only cover cache[:, :read_len]. The slice
        fuses into the attention reads, so a generation loop that grows
        read_len per frame skips the HBM traffic for the dead tail (the
        bandwidth floor of long rollouts; see generation.generate).
        """
        c = self.config
        B, S, _ = x.shape
        hd = c.head_dim
        q = nn.Dense(c.num_attention_heads * hd, use_bias=False,
                     dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c.num_key_value_heads * hd, use_bias=False,
                     dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c.num_key_value_heads * hd, use_bias=False,
                     dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(B, S, c.num_attention_heads, hd)
        k = k.reshape(B, S, c.num_key_value_heads, hd)
        v = v.reshape(B, S, c.num_key_value_heads, hd)

        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        k_scale = v_scale = None
        if cache is not None and "kT" in cache:
            # kernel-native transposed int8 cache [B*H, hd, M] (+ [B*H, M]
            # scales): single-token reads go through the fused Pallas
            # decode-attention (ops/decode_attention.py) — int8 dequant,
            # softmax, and the masked-tail skip all happen in-kernel.
            assert c.num_key_value_heads == c.num_attention_heads, \
                "ghdm cache requires MHA (all published configs are MHA)"
            Hn = c.num_attention_heads
            M = cache["kT"].shape[-1]

            def quantize(x):
                s = jnp.max(jnp.abs(x), axis=-1) / 127.0 + 1e-8
                qv = jnp.round(x / s[..., None]).astype(jnp.int8)
                return qv, s.astype(jnp.bfloat16)

            kq, ks_new = quantize(k.astype(jnp.float32))  # [B,S,H,hd],[B,S,H]
            vq, vs_new = quantize(v.astype(jnp.float32))

            def to_t(x):  # [B, S, H, d] -> [B*H, d, S]
                return x.transpose(0, 2, 3, 1).reshape(B * Hn, hd, S)

            def sc_t(x):  # [B, S, H] -> [B*H, S]
                return x.transpose(0, 2, 1).reshape(B * Hn, S)

            kT = jax.lax.dynamic_update_slice(
                cache["kT"], to_t(kq), (0, 0, cache_index))
            vT = jax.lax.dynamic_update_slice(
                cache["vT"], to_t(vq), (0, 0, cache_index))
            ksT = jax.lax.dynamic_update_slice(
                cache["ksT"], sc_t(ks_new), (0, cache_index))
            vsT = jax.lax.dynamic_update_slice(
                cache["vsT"], sc_t(vs_new), (0, cache_index))
            new_cache = {"kT": kT, "vT": vT, "ksT": ksT, "vsT": vsT}

            if S == 1:
                import os
                from ivideogpt_tpu.ops import decode_attention as da
                qg = q.reshape(B * Hn, hd)
                if (jax.default_backend() == "tpu"
                        and os.environ.get("IVG_GHDM_XLA") != "1"):
                    tg, tm = da.pick_tiles(B * Hn, M)
                    out = da.decode_attention(qg, kT, ksT, vT, vsT,
                                              cache_index + 1, tg=tg, tm=tm)
                else:
                    # CPU tests: same math via the XLA oracle (the kernel
                    # itself is parity-tested in interpret mode)
                    out = da.decode_attention_xla(qg, kT, ksT, vT, vsT,
                                                  cache_index + 1)
                out = out.reshape(B, 1, Hn * hd)
            elif isinstance(cache_index, int) and cache_index == 0:
                out = _prefill_causal_attention(q, k, v, self.dtype)
            else:
                # prefill: XLA attention on the transposed layout with the
                # scales folded into scores / weights
                keys = kT.reshape(B, Hn, hd, M).astype(self.dtype)
                vals = vT.reshape(B, Hn, hd, M).astype(self.dtype)
                attn = jnp.einsum("bqhd,bhdm->bhqm", q, keys)
                attn = attn.astype(jnp.float32) * (hd ** -0.5)
                attn = attn * ksT.reshape(B, Hn, 1, M).astype(jnp.float32)
                q_pos = cache_index + jnp.arange(S)[:, None]
                k_pos = jnp.arange(M)[None, :]
                pmask = (k_pos <= q_pos)[None, None]
                attn = jnp.where(pmask, attn, jnp.finfo(jnp.float32).min)
                attn = jax.nn.softmax(attn, axis=-1)
                attn = attn * vsT.reshape(B, Hn, 1, M).astype(jnp.float32)
                out = jnp.einsum("bhqm,bhdm->bqhd", attn.astype(self.dtype),
                                 vals)
                out = out.reshape(B, S, Hn * hd)
            out = nn.Dense(c.hidden_size, use_bias=False, dtype=self.dtype,
                           name="o_proj")(out)
            return out, new_cache
        if cache is not None:
            if "vs" in cache:
                # int8-quantized KV cache with per-(token, head) scales:
                # halves the HBM traffic that dominates long-rollout decode
                # (the attention re-reads the whole cache every step).
                # The dequantized caches are NEVER materialized: each scale is
                # constant along its contraction dim (ks over hd in q.K^T, vs
                # over the k slots consumed by attn.V), so the scales fold
                # into the [B,H,S,M] scores / attention weights instead —
                # attention reads int8 straight from HBM.
                #
                # "mixed" variant ("vs" present, "ks" absent): V int8, K kept
                # bf16 — the q.K^T int8 read is VPU-convert-bound rather than
                # DMA-bound (headroom notes in COMPONENTS.md), so an exact
                # bf16 K costs little extra time while removing the K-side
                # quantization error entirely (K is the attention-pattern-
                # sensitive side; V errors only average through the weights).
                def quantize(x):
                    s = jnp.max(jnp.abs(x), axis=-1) / 127.0 + 1e-8
                    q = jnp.round(x / s[..., None]).astype(jnp.int8)
                    return q, s.astype(jnp.bfloat16)

                if "ks" in cache:
                    kq, ks = quantize(k.astype(jnp.float32))
                else:
                    kq, ks = k.astype(cache["k"].dtype), None
                vq, vs = quantize(v.astype(jnp.float32))
                k_all = jax.lax.dynamic_update_slice(
                    cache["k"], kq, (0, cache_index, 0, 0))
                v_all = jax.lax.dynamic_update_slice(
                    cache["v"], vq, (0, cache_index, 0, 0))
                if ks is not None:
                    ks_all = jax.lax.dynamic_update_slice(
                        cache["ks"], ks, (0, cache_index, 0))
                else:
                    ks_all = None
                vs_all = jax.lax.dynamic_update_slice(
                    cache["vs"], vs, (0, cache_index, 0))
                if ks_all is not None:
                    new_cache = {"k": k_all, "v": v_all,
                                 "ks": ks_all, "vs": vs_all}
                else:
                    new_cache = {"k": k_all, "v": v_all, "vs": vs_all}
                rl = read_len or k_all.shape[1]
                keys = k_all[:, :rl].astype(self.dtype)
                values = v_all[:, :rl].astype(self.dtype)
                if ks_all is not None:
                    k_scale = ks_all[:, :rl]  # [B, rl, Hkv]
                v_scale = vs_all[:, :rl]
            else:
                k_all = jax.lax.dynamic_update_slice(
                    cache["k"], k.astype(cache["k"].dtype),
                    (0, cache_index, 0, 0))
                v_all = jax.lax.dynamic_update_slice(
                    cache["v"], v.astype(cache["v"].dtype),
                    (0, cache_index, 0, 0))
                new_cache = {"k": k_all, "v": v_all}
                rl = read_len or k_all.shape[1]
                keys = k_all[:, :rl].astype(self.dtype)
                values = v_all[:, :rl].astype(self.dtype)
        else:
            new_cache = None
            keys, values = k, v

        rep = c.num_attention_heads // c.num_key_value_heads
        if (cache is None and S > 1
                and (c.attention_dropout == 0 or deterministic)):
            # full training/eval forward (always causal here): the chunked
            # attention never materializes the [B, H, S, S] fp32 scores that
            # OOM the 436M model's training step at S=751 (torch's SDPA
            # flash path is what the reference gets for free)
            kf, vf = k, v
            if rep > 1:
                kf = jnp.repeat(kf, rep, axis=2)
                vf = jnp.repeat(vf, rep, axis=2)
            out = _prefill_causal_attention(q, kf, vf, self.dtype)
            return nn.Dense(c.hidden_size, use_bias=False, dtype=self.dtype,
                            name="o_proj")(out)
        if (cache is not None and S > 1
                and isinstance(cache_index, int) and cache_index == 0):
            # prefill: attend over the fresh k/v directly (see
            # _prefill_causal_attention) — the cache was still written above
            # for the subsequent single-token decode steps
            kf, vf = k, v
            if rep > 1:
                kf = jnp.repeat(kf, rep, axis=2)
                vf = jnp.repeat(vf, rep, axis=2)
            out = _prefill_causal_attention(q, kf, vf, self.dtype)
            out = nn.Dense(c.hidden_size, use_bias=False, dtype=self.dtype,
                           name="o_proj")(out)
            return out, new_cache
        if rep > 1:
            keys = jnp.repeat(keys, rep, axis=2)
            values = jnp.repeat(values, rep, axis=2)
            # scales are repeated independently: the mixed cache (K bf16,
            # V int8) has v_scale without k_scale
            if k_scale is not None:
                k_scale = jnp.repeat(k_scale, rep, axis=2)
            if v_scale is not None:
                v_scale = jnp.repeat(v_scale, rep, axis=2)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, keys).astype(jnp.float32)
        attn = attn * (hd ** -0.5)
        if k_scale is not None:
            attn = attn * k_scale.astype(jnp.float32).transpose(0, 2, 1)[:, :, None, :]
        if mask is not None:
            attn = jnp.where(mask, attn, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(attn, axis=-1)
        if c.attention_dropout > 0:
            attn = nn.Dropout(c.attention_dropout)(attn, deterministic=deterministic)
        if v_scale is not None:
            attn = attn * v_scale.astype(jnp.float32).transpose(0, 2, 1)[:, :, None, :]
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(self.dtype), values)
        out = out.reshape(B, S, c.num_attention_heads * hd)
        out = nn.Dense(c.hidden_size, use_bias=False, dtype=self.dtype,
                       name="o_proj")(out)
        if cache is not None:
            return out, new_cache
        return out


class LlamaMLP(nn.Module):
    config: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.config
        gate = nn.Dense(c.intermediate_size, use_bias=False, dtype=self.dtype,
                        name="gate_proj")(x)
        up = nn.Dense(c.intermediate_size, use_bias=False, dtype=self.dtype,
                      name="up_proj")(x)
        return nn.Dense(c.hidden_size, use_bias=False, dtype=self.dtype,
                        name="down_proj")(nn.silu(gate) * up)


class LlamaLayer(nn.Module):
    config: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, *, mask=None, cache=None, cache_index=None,
                 deterministic: bool = True, read_len: Optional[int] = None):
        h = RMSNorm(self.config.rms_norm_eps, dtype=self.dtype,
                    name="input_layernorm")(x)
        attn_out = LlamaAttention(self.config, dtype=self.dtype,
                                  name="self_attn")(
            h, cos, sin, mask=mask, cache=cache, cache_index=cache_index,
            deterministic=deterministic, read_len=read_len)
        if cache is not None:
            attn_out, new_cache = attn_out
        else:
            new_cache = None
        x = x + attn_out
        h = RMSNorm(self.config.rms_norm_eps, dtype=self.dtype,
                    name="post_attention_layernorm")(x)
        x = x + LlamaMLP(self.config, dtype=self.dtype, name="mlp")(h)
        if cache is not None:
            return x, new_cache
        return x


class LlamaForCausalLM(nn.Module):
    config: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.config
        self.embed_tokens = nn.Embed(
            c.vocab_size, c.hidden_size,
            embedding_init=nn.initializers.normal(c.initializer_range),
            dtype=self.dtype, name="embed_tokens")
        self.layers = [LlamaLayer(c, dtype=self.dtype, name=f"layers_{i}")
                       for i in range(c.num_hidden_layers)]
        self.norm = RMSNorm(c.rms_norm_eps, dtype=self.dtype, name="norm")
        if not c.tie_word_embeddings:
            self.lm_head = nn.Dense(
                c.vocab_size, use_bias=False,
                kernel_init=nn.initializers.normal(c.initializer_range),
                dtype=self.dtype, name="lm_head")

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def unembed(self, hidden):
        """hidden -> fp32 logits."""
        if self.config.tie_word_embeddings:
            logits = self.embed_tokens.attend(hidden)
        else:
            logits = self.lm_head(hidden)
        return logits.astype(jnp.float32)

    # ------------------------------------------------------------------

    def __call__(self, input_ids=None, inputs_embeds=None, labels=None,
                 deterministic: bool = True, output_hidden_states: bool = False):
        """Full training/eval forward. Returns dict(loss?, logits, hidden?)."""
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        B, S, _ = inputs_embeds.shape
        positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
        cos, sin = rope_cos_sin(positions, self.config.head_dim,
                                self.config.rope_theta, dtype=self.dtype)
        # causal mask [1, 1, S, S]
        mask = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]

        x = inputs_embeds
        if self.config.remat:
            # gradient checkpointing: recompute each layer in backward so
            # the 24-layer medium model's training step fits one chip
            def body(mdl, h):
                return mdl(h, cos, sin, mask=mask,
                           deterministic=deterministic)
            if self.config.remat_policy == "dots":
                # keep matmul outputs, recompute only elementwise/norms:
                # the backward re-runs no GEMMs, so the remat FLOP tax
                # (~1.33x) drops to noise while activation memory stays
                # far below no-remat (measured: tools/bench_train.py
                # gpt_medium rows)
                body = nn.remat(
                    body, policy=jax.checkpoint_policies
                    .dots_with_no_batch_dims_saveable)
            else:
                body = nn.remat(body)
            for layer in self.layers:
                x = body(layer, x)
        else:
            for layer in self.layers:
                x = layer(x, cos, sin, mask=mask, deterministic=deterministic)
        hidden = self.norm(x)
        logits = self.unembed(hidden)

        out = {"logits": logits}
        if output_hidden_states:
            out["hidden_states"] = hidden
        if labels is not None:
            out["loss"] = cross_entropy_loss(logits, labels)
        return out

    # ------------------------------------------------------------------
    # KV-cached decode path (used inside jitted generation scans)
    # ------------------------------------------------------------------

    def init_cache(self, batch: int, max_len: int,
                   cache_dtype=jnp.bfloat16,
                   layout: str = "bshd") -> Dict[str, Any]:
        """cache_dtype=jnp.int8 selects the quantized cache (int8 values +
        per-(token, head) bf16 scales); cache_dtype="mixed" keeps K exact
        bf16 and quantizes only V (see LlamaAttention: the K-side int8 read
        is convert-bound anyway, so bf16 K trades little time for zero
        K-quantization error).

        layout="ghdm" selects the kernel-native transposed int8 cache
        ([B*H, hd, M] + [B*H, M] scales; M rounded up to a 256 multiple)
        consumed by the fused Pallas decode attention.
        """
        c = self.config
        if layout == "ghdm":
            assert cache_dtype == jnp.int8, "ghdm layout is int8-only"
            assert c.num_key_value_heads == c.num_attention_heads
            G = batch * c.num_attention_heads
            M = ((max_len + 255) // 256) * 256
            return {f"layers_{i}": {
                "kT": jnp.zeros((G, c.head_dim, M), jnp.int8),
                "vT": jnp.zeros((G, c.head_dim, M), jnp.int8),
                "ksT": jnp.zeros((G, M), jnp.bfloat16),
                "vsT": jnp.zeros((G, M), jnp.bfloat16)}
                for i in range(c.num_hidden_layers)}
        shape = (batch, max_len, c.num_key_value_heads, c.head_dim)
        if isinstance(cache_dtype, str) and cache_dtype == "mixed":
            sshape = (batch, max_len, c.num_key_value_heads)
            return {f"layers_{i}": {
                "k": jnp.zeros(shape, jnp.bfloat16),
                "v": jnp.zeros(shape, jnp.int8),
                "vs": jnp.zeros(sshape, jnp.bfloat16)}
                for i in range(c.num_hidden_layers)}
        if cache_dtype == jnp.int8:
            sshape = (batch, max_len, c.num_key_value_heads)
            return {f"layers_{i}": {
                "k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "ks": jnp.zeros(sshape, jnp.bfloat16),
                "vs": jnp.zeros(sshape, jnp.bfloat16)}
                for i in range(c.num_hidden_layers)}
        return {f"layers_{i}": {"k": jnp.zeros(shape, cache_dtype),
                                "v": jnp.zeros(shape, cache_dtype)}
                for i in range(c.num_hidden_layers)}

    def forward_cached(self, inputs_embeds, cache, cache_index,
                       deterministic: bool = True,
                       read_len: Optional[int] = None):
        """Run S positions starting at cache_index against the cache.

        Returns (hidden [B, S, D], new_cache). Attends to every cache slot
        < cache_index + S with causality inside the new block. read_len
        statically bounds the attended cache prefix (see LlamaAttention).
        """
        B, S, _ = inputs_embeds.shape
        first = next(iter(cache.values()))
        M = first["kT"].shape[-1] if "kT" in first else first["k"].shape[1]
        if read_len is not None and "kT" not in first:
            M = read_len
        positions = cache_index + jnp.arange(S)[None]
        positions = jnp.broadcast_to(positions, (B, S))
        cos, sin = rope_cos_sin(positions, self.config.head_dim,
                                self.config.rope_theta, dtype=self.dtype)
        # mask [1, 1, S, M]: key j visible to query i iff j <= cache_index + i
        q_pos = cache_index + jnp.arange(S)[:, None]
        k_pos = jnp.arange(M)[None, :]
        mask = (k_pos <= q_pos)[None, None]

        x = inputs_embeds
        new_cache = {}
        for i, layer in enumerate(self.layers):
            name = f"layers_{i}"
            x, new_cache[name] = layer(
                x, cos, sin, mask=mask, cache=cache[name],
                cache_index=cache_index, deterministic=deterministic,
                read_len=read_len if "kT" not in first else None)
        hidden = self.norm(x)
        return hidden, new_cache


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """HF-style shifted next-token CE with -100 ignore (fp32, mean over valid)."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != IGNORE_INDEX
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)
