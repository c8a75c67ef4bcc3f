"""Random-pixel dm_env stand-in for MBPO smoke runs and CI.

Lets the full MBPO loop (env stepping, replay, world-model training,
imagination, validation) run on machines without MuJoCo/metaworld.
"""

from __future__ import annotations

import numpy as np

import dm_env
from dm_env import StepType, specs

from ivideogpt_tpu.mbrl.metaworld_env import (ActionDTypeWrapper,
                                              ActionScaleWrapper,
                                              ExtendedTimeStepWrapper,
                                              FrameStackWrapper,
                                              MetaWorldTimeStep)


class FakeTask(dm_env.Environment):
    """size x size random pixels, 4-dim actions, smooth random reward."""

    def __init__(self, seed=0, duration=100, size=64, action_dim=4):
        self._rng = np.random.default_rng(seed)
        self._duration = duration
        self._size = size
        self._action_dim = action_dim
        self._steps = None

    def observation_spec(self):
        return specs.BoundedArray((self._size, self._size, 3), np.uint8,
                                  0, 255, "observation")

    def action_spec(self):
        return specs.BoundedArray((self._action_dim,), np.float32,
                                  -2.0, 2.0, "action")

    def _obs(self):
        return self._rng.integers(0, 255,
                                  (self._size, self._size, 3)).astype(np.uint8)

    def reset(self):
        self._steps = 0
        return MetaWorldTimeStep(StepType.FIRST, 0.0, 1.0, self._obs(), 0.0)

    def step(self, action):
        self._steps += 1
        done = self._steps >= self._duration
        reward = float(np.tanh(np.sum(action)) * 0.1)
        return MetaWorldTimeStep(
            StepType.LAST if done else StepType.MID, reward, 1.0,
            self._obs(), 0.0)

    def render(self):
        return self._obs()


def make_fake(name, frame_stack, action_repeat, seed, camera=None,
              duration=100, succ_bonus=0.0, size=64, action_dim=4):
    """Same wrapper stack as metaworld_env.make, over the fake task."""
    env = FakeTask(seed=seed, duration=duration, size=size,
                   action_dim=action_dim)
    env = ActionDTypeWrapper(env, np.float32)
    env = ActionScaleWrapper(env, -1.0, 1.0)
    env = FrameStackWrapper(env, frame_stack)
    env = ExtendedTimeStepWrapper(env)
    return env
