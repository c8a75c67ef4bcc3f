"""Generation length arithmetic vs the reference formulas.

- max_new_tokens = (1 + dyn) * (T - ctx) - 1 (reference predict.py:57)
- generate consumes prelude + first sdf, emits the full stream minus the
  final dropped sdf (reference action_model.py:116-121)
- goal-conditioned uses segment_length 17 (goal + 16 frames,
  reference scripts/pretrain/oxe-64-goal-cond.sh)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivideogpt_tpu import generation, tokens
from ivideogpt_tpu.configs import ActionModelConfig, TransformerConfig

LM = TransformerConfig(
    vocab_size=130, hidden_size=32, intermediate_size=64,
    num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
    max_position_embeddings=2048)


@pytest.mark.parametrize("ctx,T", [(1, 16), (2, 16), (2, 12), (2, 17)])
@pytest.mark.slow
def test_stream_lengths_match_reference_formulas(ctx, T):
    # the reference generate asserts: out_len == in_len + max_new_tokens + 1,
    # returns [:, :-1] (action_model.py:116-121)
    C, D = 16, 4  # tiny geometry
    P1 = (C + 1) * ctx
    max_new = (1 + D) * (T - ctx) - 1
    expected_out = P1 + max_new  # in + max_new + 1, minus the dropped sdf

    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    head = ActionModelConfig(action_dim=2, context_length=ctx,
                             segment_length=T, tokens_per_context=C,
                             tokens_per_dyna=D)
    model = HeadModelWithAction(LM, head)
    L = tokens.seq_len(ctx, T, ctx_tokens=C, dyn_tokens=D)
    assert expected_out == L  # formula consistency

    ids = jnp.zeros((1, L), jnp.int32)
    act = jnp.zeros((1, T, 2), jnp.float32)
    params = model.init(jax.random.key(0), ids, ids, act)
    prelude = jnp.zeros((1, P1), jnp.int32)
    res = generation.generate(model, params, prelude, jax.random.key(1),
                              segment_length=T, context_length=ctx,
                              action=act, tokens_per_dyna=D, top_k=5,
                              cache_dtype=jnp.float32)
    assert res.tokens.shape == (1, expected_out)
    # every frame boundary carries the forced sdf
    out = np.asarray(res.tokens[0])
    for f in range(1, T - ctx):
        assert out[P1 + f * (D + 1) - 1] == LM.vocab_size - 1


@pytest.mark.parametrize("V", [16386, 16384, 751, 2048, 4099])
def test_two_stage_top_k_exact_at_real_vocab(V):
    # the real vocab (16386 = 8*2048 + 2) is NOT divisible by the group
    # size: the tail columns (scf/sdf) must still join the merge
    rng = np.random.default_rng(V)
    logits = jnp.asarray(rng.normal(size=(3, V)) * 4, jnp.float32)
    v_ref, i_ref = jax.lax.top_k(logits, 100)
    v2, i2 = generation.exact_top_k_two_stage(logits, 100)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v2))
    # indices may differ only where values tie; check values at the indices
    gathered = np.take_along_axis(np.asarray(logits), np.asarray(i2), axis=-1)
    np.testing.assert_array_equal(np.asarray(v_ref), gathered)


def test_two_stage_top_k_tail_column_wins():
    # a max sitting in the remainder columns must be found
    logits = jnp.full((1, 16386), -1.0)
    logits = logits.at[0, 16385].set(5.0).at[0, 16384].set(4.0)
    v, i = generation.exact_top_k_two_stage(logits, 3)
    assert i[0, 0] == 16385 and i[0, 1] == 16384
    assert float(v[0, 0]) == 5.0


@pytest.mark.parametrize("tie_mode", ["none", "quantized", "negative"])
def test_threshold_search_restriction_matches_hf_warper(tie_mode):
    """The bit-search sampler must restrict to EXACTLY HF TopKLogitsWarper's
    set: everything >= the k-th value survives (ALL boundary ties kept,
    unlike lax.top_k's rank-limited ties)."""
    rng = np.random.default_rng(
        {"none": 0, "quantized": 1, "negative": 2}[tie_mode])
    B, V, K = 3, 16386, 100
    logits = jnp.asarray(rng.normal(size=(B, V)) * 3, jnp.float32)
    if tie_mode == "quantized":
        logits = jnp.round(logits * 4) / 4  # many exact ties
    elif tie_mode == "negative":
        logits = -jnp.abs(logits) - 1.0

    keys, kth = generation.exact_kth_largest_key(logits, K)
    keep = np.asarray(keys >= kth[:, None])

    # HF semantics: remove logits < topk(K).values[..., -1]
    v_ref, _ = jax.lax.top_k(logits, K)
    hf_keep = np.asarray(logits >= v_ref[:, -1:])
    np.testing.assert_array_equal(keep, hf_keep)
    # every row keeps at least K entries; exactly K when no boundary tie
    assert (keep.sum(axis=1) >= K).all()


@pytest.mark.parametrize("tie_mode", ["plain", "quantized", "negative"])
def test_bf16_threshold_search_matches_fp32_on_bf16_exact_logits(tie_mode):
    """For bf16-exact logits (bf16 unembed, fp32 upcast — the generate()
    regime) the 16-pass uint16 search must produce the IDENTICAL
    restriction set as the 32-bit search and HF's warper."""
    rng = np.random.default_rng(
        {"plain": 3, "quantized": 4, "negative": 5}[tie_mode])
    B, V, K = 3, 16386, 100
    logits = jnp.asarray(rng.normal(size=(B, V)) * 3, jnp.float32)
    if tie_mode == "quantized":
        logits = jnp.round(logits * 4) / 4
    elif tie_mode == "negative":
        logits = -jnp.abs(logits) - 1.0
    # the bf16-exact invariant: what a bf16 matmul output upcast looks like
    logits = logits.astype(jnp.bfloat16).astype(jnp.float32)

    k16, kth16 = generation.exact_kth_largest_key_bf16(logits, K)
    keep16 = np.asarray(k16 >= kth16[:, None])
    k32, kth32 = generation.exact_kth_largest_key(logits, K)
    keep32 = np.asarray(k32 >= kth32[:, None])
    np.testing.assert_array_equal(keep16, keep32)

    v_ref, _ = jax.lax.top_k(logits, K)
    hf_keep = np.asarray(logits >= v_ref[:, -1:])
    np.testing.assert_array_equal(keep16, hf_keep)
    assert (keep16.sum(axis=1) >= K).all()


def test_threshold_search_sampler_boundary_tie_support():
    """Ties at the k-th value are ALL eligible (HF TopKLogitsWarper keeps
    every logit >= the threshold; only strictly-below is masked)."""
    V, K = 40, 5
    logits = jnp.zeros((1, V)).at[0, 3].set(2.0).at[0, 7].set(1.0)
    # threshold value 0.0 is shared by 38 entries -> all of them eligible,
    # exactly like HF's warper on these logits
    draws = np.asarray(jax.vmap(lambda k: generation.sample_top_k(
        k, logits, K, threshold_search=True)[0])(
            jax.random.split(jax.random.key(0), 600)))
    support = set(int(x) for x in np.unique(draws))
    assert {3, 7} <= support  # the two high-logit entries dominate
    assert support - {3, 7}  # some threshold ties drawn too
    assert all(0 <= s < V for s in support)


def test_threshold_search_sampling_distribution():
    """Samples from the bit-search path follow the same top-k-restricted
    distribution as the two-stage path (different RNG consumption, so
    compare empirical frequencies, not per-key draws)."""
    rng = np.random.default_rng(3)
    V, K, N = 64, 8, 4000
    logits = jnp.asarray(rng.normal(size=(1, V)) * 2, jnp.float32)
    a = np.asarray(jax.vmap(lambda k: generation.sample_top_k(
        k, logits, K, threshold_search=True)[0])(
            jax.random.split(jax.random.key(0), N)))
    b = np.asarray(jax.vmap(lambda k: generation.sample_top_k(
        k, logits, K, threshold_search=False)[0])(
            jax.random.split(jax.random.key(1), N)))
    # same support
    assert set(np.unique(a)) == set(np.unique(b))
    # frequencies agree within sampling noise
    fa = np.bincount(a, minlength=V) / N
    fb = np.bincount(b, minlength=V) / N
    assert np.abs(fa - fb).max() < 0.05, np.abs(fa - fb).max()


def test_generate_weight_precast_is_bit_identical():
    """generate() pre-casts >=2-D params to the model compute dtype; for a
    bf16 model this must be a pure no-op on results (the model casts per
    use anyway) — compare against generating from an externally pre-cast
    tree."""
    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    lm_cfg = LM.replace(vocab_size=130)
    head = ActionModelConfig(action_dim=2, context_length=1,
                             segment_length=4, tokens_per_context=16,
                             tokens_per_dyna=4)
    model = HeadModelWithAction(lm_cfg, head, dtype=jnp.bfloat16)
    L = tokens.seq_len(1, 4, ctx_tokens=16, dyn_tokens=4)
    ids = jnp.zeros((1, L), jnp.int32)
    act = jnp.zeros((1, 4, 2), jnp.float32)
    params = model.init(jax.random.key(0), ids, ids, act)
    pre = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "ndim") and x.ndim >= 2 else x, params)
    P1 = tokens.prelude_len(1, ctx_tokens=16) + 1
    kw = dict(segment_length=4, context_length=1, action=act,
              tokens_per_dyna=4, top_k=5, cache_dtype=jnp.int8)
    a = generation.generate(model, params, ids[:, :P1], jax.random.key(3),
                            **kw)
    b = generation.generate(model, pre, ids[:, :P1], jax.random.key(3),
                            **kw)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


@pytest.mark.parametrize("buckets", [1, 3])
@pytest.mark.slow
def test_read_len_buckets_bit_identical(buckets):
    """Bucketing the per-frame read_len schedule (compile-time knob) must
    not change a single sampled token: read_len only over-approximates the
    attended prefix, and attention masks beyond the current position."""
    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    lm_cfg = LM.replace(vocab_size=130)
    T, D = 8, 4
    head = ActionModelConfig(action_dim=2, context_length=2,
                             segment_length=T, tokens_per_context=16,
                             tokens_per_dyna=D, reward_prediction=True)
    model = HeadModelWithAction(lm_cfg, head, dtype=jnp.bfloat16)
    L = tokens.seq_len(2, T, ctx_tokens=16, dyn_tokens=D)
    ids = jnp.zeros((1, L), jnp.int32)
    act = jnp.ones((1, T, 2), jnp.float32) * 0.3
    params = model.init(jax.random.key(0), ids, ids, act)
    P1 = tokens.prelude_len(2, ctx_tokens=16) + 1
    kw = dict(segment_length=T, context_length=2, action=act,
              tokens_per_dyna=D, top_k=5, cache_dtype=jnp.int8,
              reward_prediction=True)
    a = generation.generate(model, params, ids[:, :P1], jax.random.key(3),
                            read_len_buckets=0, **kw)
    b = generation.generate(model, params, ids[:, :P1], jax.random.key(3),
                            read_len_buckets=buckets, **kw)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_array_equal(np.asarray(a.rewards),
                                  np.asarray(b.rewards))


def test_approx_top_k_sampling_close_to_exact():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 1000)) * 3, jnp.float32)
    exact, approx = [], []
    for i in range(200):
        k = jax.random.key(i)
        # threshold_search=False: the two-stage path consumes RNG the same
        # way as the approx path (categorical over [B, k]), so same-key
        # draws are comparable; the bit-search default samples over the
        # full vocab and is covered by the distribution test above
        exact.append(np.asarray(generation.sample_top_k(
            k, logits, 50, threshold_search=False)))
        approx.append(np.asarray(generation.sample_top_k(k, logits, 50,
                                                         approx=True)))
    exact, approx = np.stack(exact), np.stack(approx)
    # same key, overwhelmingly same sample (recall ~0.95 of top-k)
    assert (exact == approx).mean() > 0.8
