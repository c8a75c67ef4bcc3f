"""MBPO workspace integration test with a fake dm_env (tiny configs, CPU).

Exercises the full loop briefly: seed phase -> world-model init train ->
agent updates -> imagination generate -> validate, verifying the whole
pipeline (reference train_metaworld_mbpo.py:248-371) is wired."""

import numpy as np
import pytest

import dm_env
from dm_env import StepType, specs

from ivideogpt_tpu.configs import TransformerConfig
from ivideogpt_tpu.mbrl.metaworld_env import (ActionDTypeWrapper,
                                              ActionScaleWrapper,
                                              ExtendedTimeStepWrapper,
                                              FrameStackWrapper,
                                              MetaWorldTimeStep)
from ivideogpt_tpu.mbrl.mbpo import MBPOConfig, Workspace
from tests.test_tokenizer_model import TINY

TINY_LM = TransformerConfig(
    vocab_size=TINY.vocab_size, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    max_position_embeddings=512)


class FakeTask(dm_env.Environment):
    """32x32 random-pixel env with a 4-dim action space."""

    def __init__(self, seed=0, duration=12):
        self._rng = np.random.default_rng(seed)
        self._duration = duration
        self._steps = None

    def observation_spec(self):
        return specs.BoundedArray((32, 32, 3), np.uint8, 0, 255, "observation")

    def action_spec(self):
        return specs.BoundedArray((4,), np.float32, -2.0, 2.0, "action")

    def _obs(self):
        return self._rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)

    def reset(self):
        self._steps = 0
        return MetaWorldTimeStep(StepType.FIRST, 0.0, 1.0, self._obs(), 0.0)

    def step(self, action):
        self._steps += 1
        done = self._steps >= self._duration
        return MetaWorldTimeStep(
            StepType.LAST if done else StepType.MID,
            float(np.sum(action)) * 0.01, 1.0, self._obs(), 0.0)

    def render(self):
        return self._obs()


def make_fake_env(seed):
    env = FakeTask(seed)
    env = ActionDTypeWrapper(env, np.float32)
    env = ActionScaleWrapper(env, -1.0, 1.0)
    env = FrameStackWrapper(env, 3)
    env = ExtendedTimeStepWrapper(env)
    return env


def test_env_wrappers():
    env = make_fake_env(0)
    ts = env.reset()
    assert ts.observation.shape == (32, 32, 9)
    assert ts.first()
    ts = env.step(np.ones(4, np.float32))
    assert ts.observation.shape == (32, 32, 9)
    assert ts.action.shape == (4,)
    assert ts.reward != 0.0


@pytest.mark.slow
def test_mbpo_workspace_smoke(tmp_path):
    cfg = MBPOConfig(
        num_train_frames=80, num_seed_frames=40, num_expl_steps=20,
        action_repeat=2, eval_every_frames=10**9, batch_size=8,
        real_ratio=0.5, nstep=1, duration=12, save_video=False,
        # save_snapshot=False would DELETE fetched episode files, starving
        # whichever of the real/segment loaders fetches second (they share
        # the buffer dir); the reference always runs with true
        # (mbrl/cfgs/mbpo_config.yaml)
        save_snapshot=True, use_tb=False, replay_buffer_num_workers=1,
        init_update_gen_steps=2, init_gen_times=1, gen_every_steps=20,
        gen_batch=2, gen_horizon=2, update_gen_every_step=10,
        agent_update_times=1, start_mbpo=44,
        wm_context_length=2, wm_segment_length=4, wm_batch_size=2,
        wm_max_target_frames=2, stddev_schedule="0.2",
        feature_dim=16, hidden_dim=32)
    ws = Workspace(cfg, work_dir=str(tmp_path), env_fn=make_fake_env,
                   tok_cfg=TINY, lm_cfg=TINY_LM)
    ws.train()
    # seed phase wrote real episodes; mbpo phase generated imagined ones
    # (imag FILES are consumed by the imag loader — save_snapshot=False by
    # design — so assert the storage counter, not the directory)
    assert len(list((tmp_path / "buffer").glob("*.npz"))) >= 2
    assert ws.imag_replay_storage._num_episodes >= 1
    assert ws.global_step == 40
