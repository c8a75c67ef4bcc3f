"""Metaworld dm_env adapter + wrappers (host-side; rendering is outside the
TPU hot path, SURVEY.md §2 native-code census).

Rebuild of reference mbrl/metaworld_env.py:22-355 with one deliberate layout
change: observations are NHWC and frame stacking concatenates on the LAST
axis ((H, W, 3*k) instead of (3*k, H, W)) to match the framework's native
conv layout — no transposes on the device path.

The metaworld/mujoco imports are deferred so the rest of the MBRL stack is
importable (and testable with fake envs) when metaworld is not installed.
"""

from __future__ import annotations

import os
from collections import deque
from typing import Any, NamedTuple

import numpy as np

import dm_env
from dm_env import StepType, specs


class ExtendedTimeStep(NamedTuple):
    """Timestep carrying action/success/state (reference metaworld_env.py:99-121)."""
    step_type: Any
    reward: Any
    discount: Any
    observation: Any
    action: Any
    success: Any
    state: Any = None

    def first(self):
        return self.step_type == StepType.FIRST

    def mid(self):
        return self.step_type == StepType.MID

    def last(self):
        return self.step_type == StepType.LAST

    def __getitem__(self, attr):
        if isinstance(attr, str):
            return getattr(self, attr)
        return tuple.__getitem__(self, attr)


class MetaWorldTimeStep(NamedTuple):
    step_type: Any
    reward: Any
    discount: Any
    observation: Any
    success: Any
    state: Any = None

    def first(self):
        return self.step_type == StepType.FIRST

    def mid(self):
        return self.step_type == StepType.MID

    def last(self):
        return self.step_type == StepType.LAST

    def __getitem__(self, attr):
        if isinstance(attr, str):
            return getattr(self, attr)
        return tuple.__getitem__(self, attr)


class ActionDTypeWrapper(dm_env.Environment):
    """Cast incoming actions to the env dtype (reference :179-204)."""

    def __init__(self, env, dtype):
        self._env = env
        spec = env.action_spec()
        self._action_spec = specs.BoundedArray(
            spec.shape, dtype, spec.minimum, spec.maximum, "action")

    def step(self, action):
        return self._env.step(np.asarray(action).astype(
            self._env.action_spec().dtype))

    def reset(self):
        return self._env.reset()

    def observation_spec(self):
        return self._env.observation_spec()

    def action_spec(self):
        return self._action_spec

    def __getattr__(self, name):
        return getattr(self._env, name)


class ActionScaleWrapper(dm_env.Environment):
    """Rescale [-1, 1] agent actions into the env's native bounds
    (reference :22-96)."""

    def __init__(self, env, minimum, maximum):
        spec = env.action_spec()
        assert isinstance(spec, specs.BoundedArray), spec
        # keep the wrapped dtype (typically float32): a float64 promotion
        # would poison every downstream spec-checked buffer
        minimum = np.asarray(minimum, spec.dtype)
        maximum = np.asarray(maximum, spec.dtype)
        lo, hi, dt = spec.minimum, spec.maximum, spec.dtype
        assert np.isfinite(lo).all() and np.isfinite(hi).all()
        scale = (hi - lo) / (maximum - minimum)

        def transform(action):
            return (lo + scale * (action - minimum)).astype(dt, copy=False)

        self._transform = transform
        self._action_spec = spec.replace(minimum=minimum, maximum=maximum)
        self._env = env

    def step(self, action):
        return self._env.step(self._transform(action))

    def reset(self):
        return self._env.reset()

    def observation_spec(self):
        return self._env.observation_spec()

    def action_spec(self):
        return self._action_spec

    def __getattr__(self, name):
        return getattr(self._env, name)


class FrameStackWrapper(dm_env.Environment):
    """Stack k frames on the channel axis, NHWC: (H, W, 3k)
    (reference :124-176, transposed layout)."""

    def __init__(self, env, num_frames):
        self._env = env
        self._num_frames = num_frames
        self._frames = deque([], maxlen=num_frames)
        shape = env.observation_spec().shape  # (H, W, C)
        self._obs_spec = specs.BoundedArray(
            shape=(shape[0], shape[1], shape[2] * num_frames),
            dtype=np.uint8, minimum=0, maximum=255, name="observation")

    def _obs(self, ts):
        assert len(self._frames) == self._num_frames
        return ts._replace(observation=np.concatenate(list(self._frames),
                                                      axis=-1))

    def reset(self):
        ts = self._env.reset()
        for _ in range(self._num_frames):
            self._frames.append(ts.observation)
        return self._obs(ts)

    def step(self, action):
        ts = self._env.step(action)
        self._frames.append(ts.observation)
        return self._obs(ts)

    def observation_spec(self):
        return self._obs_spec

    def action_spec(self):
        return self._env.action_spec()

    def __getattr__(self, name):
        return getattr(self._env, name)


class ExtendedTimeStepWrapper(dm_env.Environment):
    """Augment timesteps with the taken action (reference :207-248)."""

    def __init__(self, env):
        self._env = env

    def reset(self):
        return self._augment(self._env.reset())

    def step(self, action):
        return self._augment(self._env.step(action), action)

    def _augment(self, ts, action=None):
        if action is None:
            spec = self.action_spec()
            action = np.zeros(spec.shape, dtype=spec.dtype)
        return ExtendedTimeStep(
            observation=ts.observation, step_type=ts.step_type, action=action,
            reward=ts.reward or 0.0, discount=ts.discount or 1.0,
            success=getattr(ts, "success", 0.0) or 0.0,
            state=getattr(ts, "state", None))

    def observation_spec(self):
        return self._env.observation_spec()

    def action_spec(self):
        return self._env.action_spec()

    def __getattr__(self, name):
        return getattr(self._env, name)


class MetaWorld(dm_env.Environment):
    """Goal-observable Metaworld v2 task rendered offscreen at 64x64
    (reference :273-355): action repeat with success accumulation + success
    bonus, image vertical flip, fixed duration."""

    def __init__(self, name, seed=None, action_repeat=1, size=(64, 64),
                 camera=None, duration=500, succ_bonus=0.0):
        import metaworld  # noqa: F401  (deferred; gated dependency)
        from metaworld.envs import ALL_V2_ENVIRONMENTS_GOAL_OBSERVABLE
        import mujoco

        os.environ["MUJOCO_GL"] = os.environ.get("MUJOCO_GL", "egl")
        env_cls = ALL_V2_ENVIRONMENTS_GOAL_OBSERVABLE[f"{name}-v2-goal-observable"]
        self._env = env_cls(seed=seed)
        self._env._freeze_rand_vec = False
        self._env.render_mode = "rgb_array"
        self._env.mujoco_renderer.camera_id = mujoco.mj_name2id(
            self._env.model, mujoco.mjtObj.mjOBJ_CAMERA, "corner")
        self._env.mujoco_renderer.height = size[0]
        self._env.mujoco_renderer.width = size[1]

        self._size = size
        self._action_repeat = action_repeat
        self._duration = duration
        self._succ_bonus = succ_bonus
        self._camera = camera
        self._steps = None

    def observation_spec(self):
        return specs.BoundedArray(shape=self._size + (3,), dtype=np.uint8,
                                  minimum=0, maximum=255, name="observation")

    def action_spec(self):
        return specs.BoundedArray(
            shape=self._env.action_space.shape, dtype=np.float32,
            minimum=self._env.action_space.low.min(),
            maximum=self._env.action_space.high.max(), name="action")

    def step(self, action):
        assert self._steps is not None, "Must reset environment."
        assert np.isfinite(action).all(), action
        reward, success = 0.0, 0.0
        done = False
        for _ in range(self._action_repeat):
            state, rew, done, truncate, info = self._env.step(action)
            success += float(info["success"])
            reward += rew or 0.0
        success = float(success >= 1.0)
        if success == 1.0:
            reward += self._succ_bonus
        image = self._env.render()[::-1]  # MuJoCo offscreen image is flipped
        self._steps += 1
        if self._steps >= self._duration:
            done = True
            self._steps = None
        return MetaWorldTimeStep(
            step_type=StepType.LAST if done else StepType.MID, reward=reward,
            discount=1, observation=image, success=success, state=state)

    def reset(self):
        self._steps = 0
        if self._camera == "corner2":
            self._env.model.cam_pos[2][:] = [0.75, 0.075, 0.7]
        self._env.reset()
        state, *_ = self._env.step(np.zeros(self._env.action_space.shape))
        image = self._env.render()[::-1]
        return MetaWorldTimeStep(step_type=StepType.FIRST, reward=0,
                                 discount=1, observation=image, success=0.0,
                                 state=state)

    def render(self, mode="offscreen"):
        return self._env.render()[::-1]

    def __getattr__(self, name):
        return getattr(self._env, name)


def make(name, frame_stack, action_repeat, seed, camera=None, duration=500,
         succ_bonus=0.0):
    """Standard wrapper stack (reference metaworld_env.py:240-250)."""
    env = MetaWorld(name, action_repeat=action_repeat, seed=seed,
                    camera=camera, duration=duration, succ_bonus=succ_bonus)
    env = ActionDTypeWrapper(env, np.float32)
    env = ActionScaleWrapper(env, minimum=-1.0, maximum=+1.0)
    env = FrameStackWrapper(env, frame_stack)
    env = ExtendedTimeStepWrapper(env)
    return env
