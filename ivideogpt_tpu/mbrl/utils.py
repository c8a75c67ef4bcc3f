"""MBRL utilities: cadence predicates, schedule DSL, truncated normal,
soft target updates.

Rebuild of reference mbrl/drq_utils.py:65-156.
"""

from __future__ import annotations

import re
import time

import jax
import jax.numpy as jnp
import numpy as np


class Until:
    """True while step < until (reference drq_utils.py:65-77)."""

    def __init__(self, until, action_repeat: int = 1):
        self._until = until
        self._action_repeat = action_repeat

    def __call__(self, step) -> bool:
        if self._until is None:
            return True
        return step < self._until // self._action_repeat


class Every:
    """True every `every` steps (reference drq_utils.py:80-94)."""

    def __init__(self, every, action_repeat: int = 1):
        self._every = every
        self._action_repeat = action_repeat

    def __call__(self, step) -> bool:
        if self._every is None:
            return False
        every = self._every // self._action_repeat
        return step % every == 0


class Timer:
    def __init__(self):
        self._start = time.time()
        self._last = time.time()

    def reset(self):
        elapsed = time.time() - self._last
        self._last = time.time()
        return elapsed, time.time() - self._start

    def total_time(self):
        return time.time() - self._start


def schedule(schdl: str, step) -> float:
    """String schedule DSL: float | linear(a,b,dur) | step_linear(...)
    (reference drq_utils.py:136-156)."""
    try:
        return float(schdl)
    except ValueError:
        pass
    m = re.match(r"linear\((.+),(.+),(.+)\)", schdl)
    if m:
        init, final, duration = (float(g) for g in m.groups())
        mix = float(np.clip(step / duration, 0.0, 1.0))
        return (1.0 - mix) * init + mix * final
    m = re.match(r"step_linear\((.+),(.+),(.+),(.+),(.+)\)", schdl)
    if m:
        init, final1, dur1, final2, dur2 = (float(g) for g in m.groups())
        if step <= dur1:
            mix = float(np.clip(step / dur1, 0.0, 1.0))
            return (1.0 - mix) * init + mix * final1
        mix = float(np.clip((step - dur1) / dur2, 0.0, 1.0))
        return (1.0 - mix) * final1 + mix * final2
    raise NotImplementedError(schdl)


def truncated_normal_sample(rng, loc, scale, clip=None, low=-1.0, high=1.0,
                            eps=1e-6):
    """loc + clamp(eps*scale) clamped to [low+eps, high-eps]
    (reference drq_utils.py:112-133 TruncatedNormal.sample)."""
    noise = jax.random.normal(rng, loc.shape, loc.dtype) * scale
    if clip is not None:
        noise = jnp.clip(noise, -clip, clip)
    return jnp.clip(loc + noise, low + eps, high - eps)


def soft_update(target_params, online_params, tau: float):
    """Polyak averaging (reference drq_utils.py soft_update_params)."""
    return jax.tree_util.tree_map(
        lambda t, o: (1.0 - tau) * t + tau * o, target_params, online_params)
