"""LLaMA LM + action head + jitted generation tests (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivideogpt_tpu import generation, tokens
from ivideogpt_tpu.configs import ActionModelConfig, TransformerConfig
from ivideogpt_tpu.models.action_model import HeadModelWithAction
from ivideogpt_tpu.models.llama import LlamaForCausalLM, cross_entropy_loss

TINY_LM = TransformerConfig(
    vocab_size=130,  # 64 + 64 + 2 (matches TINY tokenizer in test_tokenizer_model)
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=4,
    max_position_embeddings=512,
)

# tiny token geometry: 64 ctx tokens/frame, 4 dyn tokens/frame
HEAD = ActionModelConfig(
    action_dim=3, context_length=2, segment_length=5,
    tokens_per_context=64, tokens_per_dyna=4)


def _seq_len():
    return tokens.seq_len(HEAD.context_length, HEAD.segment_length,
                          ctx_tokens=64, dyn_tokens=4)


@pytest.fixture(scope="module")
def lm_and_params():
    model = LlamaForCausalLM(TINY_LM)
    ids = jnp.zeros((2, 16), jnp.int32)
    params = model.init(jax.random.key(0), ids)
    return model, params


@pytest.fixture(scope="module")
def head_and_params():
    model = HeadModelWithAction(TINY_LM, HEAD)
    ids = jnp.zeros((2, _seq_len()), jnp.int32)
    act = jnp.zeros((2, HEAD.segment_length, HEAD.action_dim), jnp.float32)
    params = model.init(jax.random.key(0), ids, ids, act)
    return model, params


def test_forward_shapes_and_loss(lm_and_params):
    model, params = lm_and_params
    B, S = 2, 16
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 130, (B, S)), jnp.int32)
    out = model.apply(params, ids, labels=ids)
    assert out["logits"].shape == (B, S, 130)
    assert out["logits"].dtype == jnp.float32
    assert np.isfinite(float(out["loss"]))


def test_ce_loss_masking():
    logits = jnp.zeros((1, 4, 10), jnp.float32)
    labels = jnp.asarray([[-100, 3, -100, 5]], jnp.int32)
    # uniform logits -> nll = log(10) on each of the 2 valid (shifted) targets
    loss = cross_entropy_loss(logits, labels)
    np.testing.assert_allclose(float(loss), np.log(10), rtol=1e-5)

    all_ignored = jnp.full((1, 4), -100, jnp.int32)
    assert float(cross_entropy_loss(logits, all_ignored)) == 0.0


def test_cached_decode_matches_full_forward(lm_and_params):
    """Prefill+decode through the KV cache == one full causal forward."""
    model, params = lm_and_params
    B, S = 2, 12
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 130, (B, S)), jnp.int32)

    full = model.apply(params, ids)["logits"]

    # prefill 5, then decode 7 one by one (fp32 cache to isolate math)
    embeds = model.apply(params, ids, method=model.embed)
    cache = model.apply(params, B, S, jnp.float32, method=model.init_cache)
    h, cache = model.apply(params, embeds[:, :5], cache, 0,
                           method=model.forward_cached)
    logits = [model.apply(params, h, method=model.unembed)]
    for t in range(5, S):
        h, cache = model.apply(params, embeds[:, t:t + 1], cache, t,
                               method=model.forward_cached)
        logits.append(model.apply(params, h, method=model.unembed))
    stitched = jnp.concatenate(logits, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stitched),
                               rtol=2e-4, atol=2e-4)


def test_action_injection_changes_only_sdf_positions(head_and_params):
    model, params = head_and_params
    B = 2
    L = _seq_len()
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 130, (B, L)), jnp.int32)
    act0 = jnp.zeros((B, HEAD.segment_length, HEAD.action_dim), jnp.float32)
    act1 = jnp.ones((B, HEAD.segment_length, HEAD.action_dim), jnp.float32)

    out0 = model.apply(params, ids, None, act0)
    out1 = model.apply(params, ids, None, act1)
    # action_linear is zero-init -> identical logits at init
    np.testing.assert_allclose(np.asarray(out0["logits"]),
                               np.asarray(out1["logits"]), atol=1e-6)


def test_generate_token_stream_structure(head_and_params):
    model, params = head_and_params
    B = 2
    ctx, T, D = HEAD.context_length, HEAD.segment_length, HEAD.tokens_per_dyna
    P1 = (64 + 1) * ctx  # prelude + first sdf
    sdf = TINY_LM.vocab_size - 1

    prelude = jnp.asarray(
        np.random.default_rng(3).integers(0, 64, (B, P1)), jnp.int32)
    prelude = prelude.at[:, 64].set(sdf - 1).at[:, -1].set(sdf)
    act = jnp.asarray(np.random.default_rng(4).normal(size=(B, T, 3)), jnp.float32)

    res = generation.generate(
        model, params, prelude, jax.random.key(0),
        segment_length=T, context_length=ctx, action=act,
        tokens_per_dyna=D, top_k=10, cache_dtype=jnp.float32)

    L = tokens.seq_len(ctx, T, ctx_tokens=64, dyn_tokens=4)
    assert res.tokens.shape == (B, L)
    out = np.asarray(res.tokens)
    # prelude preserved
    np.testing.assert_array_equal(out[:, :P1], np.asarray(prelude))
    # sdf separators forced at frame boundaries after each 4-token dyn block
    for f in range(1, T - ctx):
        assert (out[:, P1 + f * (D + 1) - 1] == sdf).all()


def test_generate_reward_head():
    cfg = HEAD.replace(reward_prediction=True)
    model = HeadModelWithAction(TINY_LM, cfg)
    L = _seq_len()
    ids = jnp.zeros((1, L), jnp.int32)
    act = jnp.zeros((1, cfg.segment_length, cfg.action_dim), jnp.float32)
    params = model.init(jax.random.key(0), ids, ids, act)

    out = model.apply(params, ids, None, act)
    F = cfg.segment_length - cfg.context_length
    assert out["reward_pred"].shape == (1, F)

    P1 = (64 + 1) * cfg.context_length
    prelude = jnp.zeros((1, P1), jnp.int32)
    res = generation.generate(
        model, params, prelude, jax.random.key(1),
        segment_length=cfg.segment_length, context_length=cfg.context_length,
        action=act, tokens_per_dyna=cfg.tokens_per_dyna, top_k=10,
        reward_prediction=True, cache_dtype=jnp.float32)
    assert res.rewards.shape == (1, F)
    assert np.isfinite(np.asarray(res.rewards)).all()


@pytest.mark.slow
def test_remat_matches_plain_forward_and_grads():
    """config.remat=True (gradient checkpointing) must change memory only:
    identical loss and gradients to the plain forward."""
    cfg = TINY_LM
    B, S = 2, 12
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)

    from ivideogpt_tpu.models.llama import LlamaForCausalLM
    plain = LlamaForCausalLM(cfg)
    remat = LlamaForCausalLM(cfg.replace(remat=True))
    params = plain.init(jax.random.key(0), ids)

    def loss_fn(model):
        def f(p):
            return model.apply(p, ids, labels=ids)["loss"]
        return f

    l0, g0 = jax.value_and_grad(loss_fn(plain))(params)
    l1, g1 = jax.value_and_grad(loss_fn(remat))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_remat_dots_policy_matches_plain_grads():
    """remat_policy="dots" (keep GEMM outputs, recompute elementwise —
    jax.checkpoint_policies.dots_with_no_batch_dims_saveable) is a pure
    memory/speed knob: identical loss and gradients to the plain forward."""
    cfg = TINY_LM
    B, S = 2, 12
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)

    from ivideogpt_tpu.models.llama import LlamaForCausalLM
    plain = LlamaForCausalLM(cfg)
    dots = LlamaForCausalLM(cfg.replace(remat=True, remat_policy="dots"))
    params = plain.init(jax.random.key(0), ids)

    def loss_fn(model):
        def f(p):
            return model.apply(p, ids, labels=ids)["loss"]
        return f

    l0, g0 = jax.value_and_grad(loss_fn(plain))(params)
    l1, g1 = jax.value_and_grad(loss_fn(dots))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
