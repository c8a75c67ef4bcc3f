"""int8 KV-cache decode: close to the fp32-cache decode."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ivideogpt_tpu.models.llama import LlamaForCausalLM
from tests.test_llama import TINY_LM


def test_int8_cache_matches_fp32_decode():
    model = LlamaForCausalLM(TINY_LM)
    B, S = 2, 12
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 130, (B, S)), jnp.int32)
    params = model.init(jax.random.key(0), ids)
    embeds = model.apply(params, ids, method=model.embed)

    def run(cache_dtype):
        cache = model.apply(params, B, S, cache_dtype,
                            method=model.init_cache)
        h, cache = model.apply(params, embeds[:, :5], cache, 0,
                               method=model.forward_cached)
        outs = [h]
        for t in range(5, S):
            h, cache = model.apply(params, embeds[:, t:t + 1], cache, t,
                                   method=model.forward_cached)
            outs.append(h)
        return jnp.concatenate(outs, axis=1)

    ref = np.asarray(run(jnp.float32))
    q = np.asarray(run(jnp.int8))
    # int8 quantization error is small relative to hidden magnitudes
    denom = np.abs(ref).mean()
    assert np.abs(q - ref).mean() / denom < 0.05, \
        (np.abs(q - ref).mean(), denom)
    # and the cache halves its big-buffer bytes
    c8 = model.apply(params, B, S, jnp.int8, method=model.init_cache)
    cbf = model.apply(params, B, S, jnp.bfloat16, method=model.init_cache)
    bytes8 = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(c8))
    bytes16 = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(cbf))
    assert bytes8 < 0.6 * bytes16


@pytest.mark.slow
def test_gqa_decode_all_cache_dtypes():
    """GQA (num_key_value_heads < num_attention_heads) must decode under
    every cache dtype: the scale repeat happens per-scale, not only when
    k_scale exists (the mixed cache has v_scale but k_scale=None)."""
    import dataclasses
    cfg = dataclasses.replace(TINY_LM, num_key_value_heads=2)
    model = LlamaForCausalLM(cfg)
    B, S = 2, 10
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 130, (B, S)), jnp.int32)
    params = model.init(jax.random.key(0), ids)
    embeds = model.apply(params, ids, method=model.embed)

    def run(cache_dtype):
        cache = model.apply(params, B, S, cache_dtype,
                            method=model.init_cache)
        h, cache = model.apply(params, embeds[:, :5], cache, 0,
                               method=model.forward_cached)
        outs = [h]
        for t in range(5, S):
            h, cache = model.apply(params, embeds[:, t:t + 1], cache, t,
                                   method=model.forward_cached)
            outs.append(h)
        return np.asarray(jnp.concatenate(outs, axis=1))

    ref = run(jnp.float32)
    denom = np.abs(ref).mean()
    for cd in (jnp.bfloat16, jnp.int8, "mixed"):
        out = run(cd)
        assert np.isfinite(out).all()
        assert np.abs(out - ref).mean() / denom < 0.05, cd


def test_mixed_cache_between_fp32_and_int8():
    """cache_dtype='mixed' (K exact bf16, V int8) decodes strictly closer
    to the fp32 cache than the all-int8 cache does, and still shrinks the
    big buffers vs bf16."""
    model = LlamaForCausalLM(TINY_LM)
    B, S = 2, 12
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 130, (B, S)), jnp.int32)
    params = model.init(jax.random.key(0), ids)
    embeds = model.apply(params, ids, method=model.embed)

    def run(cache_dtype):
        cache = model.apply(params, B, S, cache_dtype,
                            method=model.init_cache)
        h, cache = model.apply(params, embeds[:, :5], cache, 0,
                               method=model.forward_cached)
        outs = [h]
        for t in range(5, S):
            h, cache = model.apply(params, embeds[:, t:t + 1], cache, t,
                                   method=model.forward_cached)
            outs.append(h)
        return jnp.concatenate(outs, axis=1)

    ref = np.asarray(run(jnp.float32))
    mixed = np.asarray(run("mixed"))
    full8 = np.asarray(run(jnp.int8))
    err_mixed = np.abs(mixed - ref).mean()
    err_int8 = np.abs(full8 - ref).mean()
    assert err_mixed < err_int8, (err_mixed, err_int8)
    assert err_mixed / np.abs(ref).mean() < 0.05

    cm = model.apply(params, B, S, "mixed", method=model.init_cache)
    cbf = model.apply(params, B, S, jnp.bfloat16, method=model.init_cache)
    bytes_m = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(cm))
    bytes16 = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(cbf))
    assert bytes_m < 0.85 * bytes16


def test_mixed_cache_generate_runs():
    """cache_dtype='mixed' threads through generation.generate (static
    argname) and produces a stream with the same frame structure."""
    from ivideogpt_tpu import generation, tokens
    from ivideogpt_tpu.configs import ActionModelConfig
    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    from tests.test_tokenizer_model import TINY

    ctx, T, D = 2, 5, TINY.dyn_tokens_per_frame
    head = ActionModelConfig(
        action_dim=4, context_length=ctx, segment_length=T,
        tokens_per_context=TINY.ctx_tokens_per_frame, tokens_per_dyna=D)
    model = HeadModelWithAction(TINY_LM, head)
    L = tokens.seq_len(ctx, T, ctx_tokens=TINY.ctx_tokens_per_frame,
                       dyn_tokens=D)
    rng = np.random.default_rng(0)
    action = jnp.asarray(rng.normal(size=(2, T, 4)), jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, L), jnp.int32),
                        None, action[:1])
    P1 = tokens.prelude_len(ctx, TINY.ctx_tokens_per_frame) + 1
    prelude = jnp.asarray(
        rng.integers(0, TINY.vocab_size - 2, (2, P1)), jnp.int32)
    prelude = prelude.at[:, P1 - 1].set(TINY.vocab_size - 1)
    res = generation.generate(
        model, params, prelude, jax.random.key(3), segment_length=T,
        context_length=ctx, action=action, tokens_per_dyna=D, top_k=10,
        cache_dtype="mixed")
    assert res.tokens.shape == (2, L)
    ids = np.asarray(res.tokens)
    sdf = TINY.vocab_size - 1
    # forced separators present at every frame boundary
    for f in range(T - ctx):
        assert (ids[:, P1 - 1 + f * (D + 1)] == sdf).all()


@pytest.mark.slow
def test_ghdm_cache_layout_matches_bshd():
    """The kernel-native transposed int8 cache (cache_layout='ghdm') must
    sample the same tokens as the standard int8 cache (on CPU the math runs
    through the XLA oracle; the Pallas kernel itself is parity-tested in
    ops tests)."""
    import numpy as np
    from ivideogpt_tpu import generation, tokens
    from ivideogpt_tpu.configs import ActionModelConfig, TransformerConfig
    from ivideogpt_tpu.models.action_model import HeadModelWithAction

    lm_cfg = TransformerConfig(
        vocab_size=130, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=512)
    head = ActionModelConfig(action_dim=4, context_length=2,
                             segment_length=6, tokens_per_context=16,
                             tokens_per_dyna=4)
    model = HeadModelWithAction(lm_cfg, head)
    L = tokens.seq_len(2, 6, ctx_tokens=16, dyn_tokens=4)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 128, (2, L)), jnp.int32)
    act = jnp.asarray(rng.normal(size=(2, 6, 4)), jnp.float32)
    params = model.init(jax.random.key(0), ids, ids, act)
    P1 = tokens.prelude_len(2, 16) + 1

    kw = dict(segment_length=6, context_length=2, action=act,
              tokens_per_dyna=4, top_k=10)
    r_std = generation.generate(model, params, ids[:, :P1], jax.random.key(5),
                                cache_dtype=jnp.int8, **kw)
    r_ghdm = generation.generate(model, params, ids[:, :P1],
                                 jax.random.key(5), cache_dtype=jnp.int8,
                                 cache_layout="ghdm", **kw)
    np.testing.assert_array_equal(np.asarray(r_std.tokens),
                                  np.asarray(r_ghdm.tokens))


def test_replay_logits_alignment_and_divergence():
    """generation.replay_logits is step-aligned with the training forward:
    under a bf16... here fp32 cache, replay logits equal the no-cache
    forward logits at the same positions; the int8 replay stays close.
    (The harness behind the kv-divergence study, tools/kv_divergence_study.py.)
    """
    from ivideogpt_tpu import generation, tokens
    from ivideogpt_tpu.configs import ActionModelConfig
    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    from tests.test_tokenizer_model import TINY

    ctx, T, D = 2, 5, TINY.dyn_tokens_per_frame
    head = ActionModelConfig(
        action_dim=4, context_length=ctx, segment_length=T,
        tokens_per_context=TINY.ctx_tokens_per_frame, tokens_per_dyna=D)
    model = HeadModelWithAction(TINY_LM, head)
    L = tokens.seq_len(ctx, T, ctx_tokens=TINY.ctx_tokens_per_frame,
                       dyn_tokens=D)
    rng = np.random.default_rng(0)
    action = jnp.asarray(rng.normal(size=(2, T, 4)), jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, L), jnp.int32),
                        None, action[:1])

    P1 = tokens.prelude_len(ctx, TINY.ctx_tokens_per_frame) + 1
    prelude = jnp.asarray(
        rng.integers(0, TINY.vocab_size - 2, (2, P1)), jnp.int32)
    prelude = prelude.at[:, P1 - 1].set(TINY.vocab_size - 1)
    res = generation.generate(
        model, params, prelude, jax.random.key(3), segment_length=T,
        context_length=ctx, action=action, tokens_per_dyna=D, top_k=10)

    rep = np.asarray(generation.replay_logits(
        model, params, res.tokens, segment_length=T, context_length=ctx,
        action=action, tokens_per_dyna=D, cache_dtype=jnp.float32))

    # ground truth: the chunked-attention training forward on the stream
    fwd = model.apply(params, res.tokens, None, action)["logits"]
    fwd = np.asarray(fwd[:, P1 - 1:, :])          # [B, S, V]
    fwd = np.moveaxis(fwd, 0, 1)                  # [S, B, V]
    assert rep.shape == fwd.shape
    np.testing.assert_allclose(rep, fwd, rtol=2e-3, atol=2e-3)

    # int8-cache replay: same shape, bounded divergence
    rep8 = np.asarray(generation.replay_logits(
        model, params, res.tokens, segment_length=T, context_length=ctx,
        action=action, tokens_per_dyna=D, cache_dtype=jnp.int8))
    denom = np.abs(rep).mean()
    assert np.abs(rep8 - rep).mean() / denom < 0.1
