"""MBRL stack tests: DrQ-v2 update, replay buffers, world-model train +
fully-jitted imagination rollout, on tiny configs (CPU)."""

import numpy as np
import pytest

from ivideogpt_tpu.configs import ActionModelConfig, TransformerConfig
from ivideogpt_tpu.mbrl import utils as drq_utils
from ivideogpt_tpu.mbrl.drqv2 import DrQV2Agent, random_shift_aug
from ivideogpt_tpu.mbrl.replay_buffer import (ReplayBuffer,
                                              ReplayBufferStorage,
                                              ReplaySegmentBuffer,
                                              episode_len)
from tests.test_tokenizer_model import TINY

TINY_LM = TransformerConfig(
    vocab_size=TINY.vocab_size, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    max_position_embeddings=512)


def test_schedule_dsl():
    assert drq_utils.schedule("0.3", 100) == 0.3
    assert drq_utils.schedule("linear(1.0,0.1,100)", 0) == 1.0
    assert abs(drq_utils.schedule("linear(1.0,0.1,100)", 50) - 0.55) < 1e-9
    assert drq_utils.schedule("linear(1.0,0.1,100)", 1000) == pytest.approx(0.1)
    assert drq_utils.schedule("step_linear(1.0,0.5,10,0.1,10)", 5) == 0.75


def test_until_every():
    until = drq_utils.Until(100, action_repeat=2)
    assert until(49) and not until(50)
    every = drq_utils.Every(10, action_repeat=2)
    assert every(0) and every(5) and not every(3)


def test_random_shift_aug_shapes():
    import jax
    x = np.random.default_rng(0).uniform(0, 255, (4, 16, 16, 9)).astype(np.float32)
    y = random_shift_aug(jax.random.key(0), np.asarray(x), pad=2)
    assert y.shape == x.shape
    # values come from the padded image -> within original range
    assert float(y.min()) >= 0 and float(y.max()) <= 255


def test_drqv2_act_and_update():
    agent = DrQV2Agent((16, 16, 9), 4, feature_dim=16, hidden_dim=32,
                       num_expl_steps=0, seed=0)
    obs = np.random.default_rng(0).integers(0, 255, (16, 16, 9)).astype(np.float32)
    a = agent.act(obs, step=10, eval_mode=False)
    assert a.shape == (4,)
    assert (np.abs(a) <= 1.0).all()

    B = 8
    rng = np.random.default_rng(1)
    batch = (rng.integers(0, 255, (B, 16, 16, 9)).astype(np.float32),
             rng.uniform(-1, 1, (B, 4)).astype(np.float32),
             rng.normal(size=(B, 1)).astype(np.float32),
             np.full((B, 1), 0.99, np.float32),
             rng.integers(0, 255, (B, 16, 16, 9)).astype(np.float32))
    m = agent.update(batch, step=0)
    assert "critic_loss" in m and np.isfinite(m["critic_loss"])
    assert "actor_loss" in m  # delay_steps=1 -> actor updates immediately


def _fake_episode(n, obs_shape=(8, 8, 9), act_dim=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "observation": rng.integers(0, 255, (n + 1, *obs_shape)).astype(np.uint8),
        "action": rng.uniform(-1, 1, (n + 1, act_dim)).astype(np.float32),
        "reward": rng.normal(size=(n + 1, 1)).astype(np.float32),
        "discount": np.ones((n + 1, 1), np.float32),
    }


def test_replay_buffer_nstep(tmp_path):
    buf = ReplayBuffer(tmp_path, max_size=10000, nstep=3, discount=0.9)
    ep = _fake_episode(20)
    buf.add_direct(ep)
    assert episode_len(ep) == 20
    obs, action, reward, discount, next_obs = buf.sample()
    assert obs.shape == (8, 8, 9)
    assert discount.shape == (1,)
    # n-step discount product = 0.9^3 with unit per-step discounts
    np.testing.assert_allclose(discount, 0.9 ** 3, rtol=1e-6)


def test_segment_buffer(tmp_path):
    buf = ReplaySegmentBuffer(tmp_path, max_size=10000, nstep=3,
                              discount=0.9, segment_length=5)
    buf.add_direct(_fake_episode(20))
    obs, action, reward = buf.sample()
    assert obs.shape == (5, 8, 8, 3)  # last 3 channels of the stack
    assert action.shape == (5, 4)
    assert reward.shape == (5, 1)


def test_storage_roundtrip(tmp_path):
    from dm_env import StepType, specs
    from ivideogpt_tpu.mbrl.metaworld_env import ExtendedTimeStep

    data_specs = (specs.BoundedArray((8, 8, 3), np.uint8, 0, 255, "observation"),
                  specs.BoundedArray((4,), np.float32, -1, 1, "action"),
                  specs.Array((1,), np.float32, "reward"),
                  specs.Array((1,), np.float32, "discount"))
    storage = ReplayBufferStorage(data_specs, tmp_path / "buffer")
    rng = np.random.default_rng(0)

    def ts(step_type):
        return ExtendedTimeStep(
            step_type=step_type, reward=np.zeros(1, np.float32),
            discount=np.ones(1, np.float32),
            observation=rng.integers(0, 255, (8, 8, 3)).astype(np.uint8),
            action=np.zeros(4, np.float32), success=0.0)

    storage.add(ts(StepType.FIRST))
    for _ in range(5):
        storage.add(ts(StepType.MID))
    storage.add(ts(StepType.LAST))
    assert len(storage) == 6
    files = list((tmp_path / "buffer").glob("*.npz"))
    assert len(files) == 1

    buf = ReplayBuffer(tmp_path / "buffer", max_size=1000, nstep=1,
                       discount=0.99, fetch_every=0)
    out = buf.sample()
    assert out[0].shape == (8, 8, 3)


@pytest.mark.slow
def test_video_predictor_train_and_rollout():
    from ivideogpt_tpu.mbrl.video_predictor import VideoPredictor

    head = ActionModelConfig(action_dim=4, context_length=2, segment_length=5,
                             tokens_per_context=TINY.ctx_tokens_per_frame,
                             tokens_per_dyna=TINY.dyn_tokens_per_frame,
                             reward_prediction=True)
    vp = VideoPredictor(TINY, TINY_LM, head, seed=0, max_target_frames=3)

    B, T = 2, 5
    rng = np.random.default_rng(0)
    obs = rng.integers(0, 255, (B, T, 32, 32, 3)).astype(np.float32)
    action = rng.uniform(-1, 1, (B, T, 4)).astype(np.float32)
    reward = rng.normal(size=(B, T)).astype(np.float32)

    m = vp.train((obs, action, reward))
    for k in ("tokenizer_loss", "ce_loss", "reward_loss"):
        assert k in m and np.isfinite(m[k]), (k, m)

    # rollout with a trivial policy
    def policy(agent_state, stack, stddev, key):
        import jax
        return jax.random.uniform(key, (stack.shape[0], 4), minval=-1.0,
                                  maxval=1.0)

    k = 3
    stack = rng.integers(0, 255, (B, 32, 32, 3 * k)).astype(np.float32)
    obss, acts, rews = vp.rollout(stack, policy, None, horizon=3,
                                  frame_stack=k)
    assert obss.shape == (B, 4, 32, 32, 3 * k)
    assert acts.shape == (B, 4, 4)
    assert rews.shape == (B, 4)
    assert np.isfinite(obss).all() and np.isfinite(rews).all()
    assert obss.min() >= 0 and obss.max() <= 255.0 + 1e-3
    # first step is the dummy init (reference video_predictor.py:324-333)
    np.testing.assert_allclose(obss[:, 0], stack, atol=1e-3)
    np.testing.assert_array_equal(acts[:, 0], 0)
    np.testing.assert_array_equal(rews[:, 0], 0)

    # action replay variant (validate() protocol)
    replay = rng.uniform(-1, 1, (B, 3, 4)).astype(np.float32)
    obss2, acts2, _ = vp.rollout(stack, None, None, horizon=3, frame_stack=k,
                                 replay_actions=replay)
    np.testing.assert_allclose(acts2[:, 1:], replay, rtol=1e-5)


@pytest.mark.slow
def test_video_predictor_train_accepts_dm_env_reward_shape():
    """Segment-buffer rewards carry dm_env's trailing singleton ([B,T,1]);
    train() must squeeze it or the reward loss mis-broadcasts against
    reward_pred [B,F] (errors outright whenever B != F)."""
    from ivideogpt_tpu.mbrl.video_predictor import VideoPredictor

    head = ActionModelConfig(action_dim=4, context_length=2, segment_length=5,
                             tokens_per_context=TINY.ctx_tokens_per_frame,
                             tokens_per_dyna=TINY.dyn_tokens_per_frame,
                             reward_prediction=True)
    B, T = 2, 5  # F = 3 != B: a mis-broadcast would raise, not just be wrong
    rng = np.random.default_rng(1)
    obs = rng.integers(0, 255, (B, T, 32, 32, 3)).astype(np.float32)
    action = rng.uniform(-1, 1, (B, T, 4)).astype(np.float32)
    reward = rng.normal(size=(B, T)).astype(np.float32)

    vp_a = VideoPredictor(TINY, TINY_LM, head, seed=0, max_target_frames=3)
    vp_b = VideoPredictor(TINY, TINY_LM, head, seed=0, max_target_frames=3)
    m_a = vp_a.train((obs, action, reward), update_tokenizer=False)
    m_b = vp_b.train((obs, action, reward[..., None]),
                     update_tokenizer=False)
    assert np.isfinite(m_b["reward_loss"])
    np.testing.assert_allclose(m_a["reward_loss"], m_b["reward_loss"],
                               rtol=1e-6)


def test_rollout_expl_uniform_overrides_policy():
    """expl_uniform=True replaces the policy's action with uniform(-1,1)
    (reference act2's step<num_expl_steps branch, drqv2.py:188-198,
    used for init gen at start_mbpo, train_metaworld_mbpo.py:175)."""
    from ivideogpt_tpu.mbrl.video_predictor import VideoPredictor

    head = ActionModelConfig(action_dim=4, context_length=2, segment_length=5,
                             tokens_per_context=TINY.ctx_tokens_per_frame,
                             tokens_per_dyna=TINY.dyn_tokens_per_frame,
                             reward_prediction=True)
    vp = VideoPredictor(TINY, TINY_LM, head, seed=0, max_target_frames=3)

    def const_policy(agent_state, stack, stddev, key):
        import jax.numpy as jnp
        return jnp.full((stack.shape[0], 4), 0.123, jnp.float32)

    rng = np.random.default_rng(1)
    k = 3
    stack = rng.integers(0, 255, (16, 32, 32, 3 * k)).astype(np.float32)
    import jax
    _, acts, _ = vp.rollout(stack, const_policy, None, horizon=3,
                            frame_stack=k, rng=jax.random.key(0))
    np.testing.assert_allclose(acts[:, 1:], 0.123, rtol=1e-6)

    _, acts_u, _ = vp.rollout(stack, const_policy, None, horizon=3,
                              frame_stack=k, rng=jax.random.key(0),
                              expl_uniform=True)
    flat = acts_u[:, 1:].ravel()
    assert flat.min() >= -1.0 and flat.max() <= 1.0
    assert flat.std() > 0.4          # spread like uniform(-1,1), not const
    assert not np.allclose(flat, 0.123)
