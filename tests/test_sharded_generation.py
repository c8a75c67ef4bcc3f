"""Multi-chip sharded inference (`parallel/serving.py`) on the CPU mesh.

The reference's multi-GPU inference is Accelerate DP (each GPU a full
replica, reference train_gpt.py:672-679); the serving path generalizes it
to a ("data", "model") mesh. Contracts pinned here:

- pure DP is bitwise-identical to single-device generation (the
  Accelerate regime's guarantee);
- tensor parallelism changes only reduction order: teacher-forced logits
  agree to fp32 tolerance, and the generated stream keeps the structural
  token contract (forced sdf at frame boundaries, valid id range);
- the full tokenize -> generate -> detokenize pipeline runs end-to-end
  sharded DP x TP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivideogpt_tpu import generation, tokens
from ivideogpt_tpu.configs import (ActionModelConfig, CompressiveVQConfig,
                                   TransformerConfig)
from ivideogpt_tpu.models.action_model import HeadModelWithAction
from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
from ivideogpt_tpu.parallel import mesh as mesh_lib
from ivideogpt_tpu.parallel import serving

# vocab 130 = 64 ctx + 64 dyn + scf/sdf; hidden 128 so the TP rules
# (mesh.param_spec: last dim >= 128) actually shard every projection
LM = TransformerConfig(
    vocab_size=130, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    max_position_embeddings=2048)

C, D = 16, 4  # tiny token geometry
CTX, T = 2, 6


def _tiny_lm(rng_seed=0, B=8):
    head = ActionModelConfig(action_dim=2, context_length=CTX,
                             segment_length=T, tokens_per_context=C,
                             tokens_per_dyna=D)
    model = HeadModelWithAction(LM, head)
    L = tokens.seq_len(CTX, T, ctx_tokens=C, dyn_tokens=D)
    rng = np.random.default_rng(rng_seed)
    ids = jnp.asarray(rng.integers(0, 128, (B, L)), jnp.int32)
    act = jnp.asarray(rng.normal(size=(B, T, 2)), jnp.float32)
    params = model.init(jax.random.key(0), ids, ids, act)
    P1 = tokens.prelude_len(CTX, ctx_tokens=C) + 1
    prelude = jnp.asarray(rng.integers(0, 64, (B, P1)), jnp.int32)
    return model, params, prelude, act, ids


@pytest.mark.slow
def test_dp_generate_matches_single_device_bitwise():
    model, params, prelude, act, _ = _tiny_lm()
    kw = dict(segment_length=T, context_length=CTX, action=act,
              tokens_per_dyna=D, top_k=5, cache_dtype=jnp.float32)
    ref = generation.generate(model, params, prelude, jax.random.key(7), **kw)
    mesh = mesh_lib.make_mesh(len(jax.devices()), 1)
    got = serving.sharded_generate(model, params, prelude, jax.random.key(7),
                                   mesh=mesh, **kw)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(got.tokens))


def test_tp_teacher_forced_logits_match():
    model, params, _, act, ids = _tiny_lm()
    ref = model.apply(params, ids, ids, act)["logits"]
    mesh = mesh_lib.make_mesh(len(jax.devices()) // 2, 2)
    sp = serving.place_inference_params(params, mesh)
    # at least one projection must actually be model-split for this to
    # test TP rather than silently replicate
    specs = [x.sharding.spec for x in jax.tree_util.tree_leaves(sp)]
    assert any("model" in str(s) for s in specs), specs
    batch = mesh_lib.shard_batch({"ids": ids, "act": act}, mesh)
    got = jax.jit(lambda p, i, a: model.apply(p, i, i, a)["logits"])(
        sp, batch["ids"], batch["act"])
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=2e-5, rtol=2e-5)


def test_tp_generate_keeps_token_contract():
    model, params, prelude, act, _ = _tiny_lm()
    mesh = mesh_lib.make_mesh(len(jax.devices()) // 2, 2)
    res = serving.sharded_generate(
        model, params, prelude, jax.random.key(3), mesh=mesh,
        segment_length=T, context_length=CTX, action=act,
        tokens_per_dyna=D, top_k=5, cache_dtype=jnp.float32)
    out = np.asarray(res.tokens)
    P1 = prelude.shape[1]
    L = tokens.seq_len(CTX, T, ctx_tokens=C, dyn_tokens=D)
    assert out.shape == (prelude.shape[0], L)
    assert out.min() >= 0 and out.max() < LM.vocab_size
    # forced sdf at every interior frame boundary (reference action_model
    # stream structure)
    for f in range(1, T - CTX):
        assert (out[:, P1 + f * (D + 1) - 1] == LM.vocab_size - 1).all()


def test_batch_not_divisible_by_data_axis_raises():
    model, params, prelude, act, _ = _tiny_lm(B=6)
    mesh = mesh_lib.make_mesh(len(jax.devices()) // 2, 2)  # data=4, B=6
    with pytest.raises(ValueError, match="not divisible"):
        serving.sharded_generate(
            model, params, prelude, jax.random.key(3), mesh=mesh,
            segment_length=T, context_length=CTX, action=act,
            tokens_per_dyna=D, top_k=5)


TINY_TOK = CompressiveVQConfig(
    block_out_channels=(16, 32, 32), layers_per_block=1, latent_channels=8,
    num_vq_embeddings=64, num_dyn_embeddings=64, norm_num_groups=8,
    mid_block_add_attention=False, context_length=2, resolution=32,
    max_att_resolution=8, patch_size=4)


@pytest.mark.slow
def test_full_pipeline_sharded_dp_tp():
    # tokenize -> generate -> detokenize, batch split on "data", LM split
    # on "model" — the multi-chip inference/predict.py flow
    Tp, ctx, B = 4, 2, 8
    tokenizer = CompressiveVQModel(TINY_TOK, use_pallas=False)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(0, 1, (B, Tp, 32, 32, 3)), jnp.float32)
    tok_params = tokenizer.init(
        jax.random.key(1), px[:, :ctx].reshape(-1, 32, 32, 3),
        px[:, ctx:].reshape(-1, 32, 32, 3), segment_len=Tp - ctx)

    ctok = TINY_TOK.resolution // (2 ** (len(TINY_TOK.block_out_channels) - 1))
    head = ActionModelConfig(action_dim=2, context_length=ctx,
                             segment_length=Tp, tokens_per_context=ctok * ctok,
                             tokens_per_dyna=4)
    model = HeadModelWithAction(LM, head)
    L = tokens.seq_len(ctx, Tp, ctx_tokens=ctok * ctok, dyn_tokens=4)
    ids = jnp.asarray(rng.integers(0, 128, (B, L)), jnp.int32)
    act = jnp.asarray(rng.normal(size=(B, Tp, 2)), jnp.float32)
    lm_params = model.init(jax.random.key(2), ids, ids, act)

    mesh = mesh_lib.make_mesh(len(jax.devices()) // 2, 2)
    frames, res = serving.sharded_rollout(
        tokenizer, tok_params, model, lm_params, px[:, :ctx],
        jax.random.key(4), mesh=mesh, segment_length=Tp,
        context_length=ctx, action=act, top_k=5, cache_dtype=jnp.float32)
    assert frames.shape == (B, Tp, 32, 32, 3)
    assert bool(jnp.isfinite(frames).all())
    assert res.tokens.shape == (B, L)


def test_sharded_rollout_max_att_neq_latent_resolution():
    # TOKENIZER_256 regime: max_att_resolution (32) != latent_resolution
    # (16). sharded_rollout must derive tokens_per_dyna from the latent
    # geometry, not the attention gate — regression for the round-3
    # advisor finding (serving.py derived (max_att//patch)**2).
    tok_cfg = TINY_TOK.replace(max_att_resolution=4)  # latent res is 8
    assert tok_cfg.max_att_resolution != tok_cfg.latent_resolution
    Tp, ctx, B = 4, 2, 8
    tokenizer = CompressiveVQModel(tok_cfg, use_pallas=False)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(0, 1, (B, Tp, 32, 32, 3)), jnp.float32)
    tok_params = tokenizer.init(
        jax.random.key(1), px[:, :ctx].reshape(-1, 32, 32, 3),
        px[:, ctx:].reshape(-1, 32, 32, 3), segment_len=Tp - ctx)

    ctok = tok_cfg.ctx_tokens_per_frame
    dyn = tok_cfg.dyn_tokens_per_frame
    head = ActionModelConfig(action_dim=2, context_length=ctx,
                             segment_length=Tp, tokens_per_context=ctok,
                             tokens_per_dyna=dyn)
    model = HeadModelWithAction(LM, head)
    L = tokens.seq_len(ctx, Tp, ctx_tokens=ctok, dyn_tokens=dyn)
    ids = jnp.asarray(rng.integers(0, 128, (B, L)), jnp.int32)
    act = jnp.asarray(rng.normal(size=(B, Tp, 2)), jnp.float32)
    lm_params = model.init(jax.random.key(2), ids, ids, act)

    mesh = mesh_lib.make_mesh(len(jax.devices()), 1)
    frames, res = serving.sharded_rollout(
        tokenizer, tok_params, model, lm_params, px[:, :ctx],
        jax.random.key(4), mesh=mesh, segment_length=Tp,
        context_length=ctx, action=act, top_k=5, cache_dtype=jnp.float32)
    assert res.tokens.shape == (B, L)
    assert frames.shape == (B, Tp, 32, 32, 3)
    assert bool(jnp.isfinite(frames).all())


def test_tokenizer_fns_cache_hits_across_rollouts():
    # repeated sharded_rollout calls on the same tokenizer must reuse the
    # jitted prelude/detokenize programs (round-3 advisor: fresh jit
    # lambdas per call never hit the cache)
    tokenizer = CompressiveVQModel(TINY_TOK, use_pallas=False)
    f1 = serving._tokenizer_fns(tokenizer, 2)
    f2 = serving._tokenizer_fns(CompressiveVQModel(TINY_TOK, use_pallas=False), 2)
    assert f1 is f2
