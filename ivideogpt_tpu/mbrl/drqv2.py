"""DrQ-v2 pixel actor-critic in JAX/Flax.

Rebuild of reference mbrl/drqv2.py:17-301: random-shift augmentation, conv
encoder, tanh actor with scheduled-stddev truncated normal, twin critics,
n-step TD with delayed actor update and Polyak targets.

TPU-first: the whole update (aug + encode + critic + actor + target) is one
jitted function; augmentation uses a gather-based shift (no grid_sample).
NHWC observations.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

from ivideogpt_tpu.mbrl.utils import soft_update, truncated_normal_sample


def random_shift_aug(rng, x, pad: int = 4):
    """Random per-image integer shift with replicate padding + bilinear
    half-pixel interpolation (equivalent coverage to the reference's
    grid_sample version, drqv2.py:17-48, for integer shifts)."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    shift = jax.random.randint(rng, (n, 2), 0, 2 * pad + 1)

    rows = jnp.arange(h)[None, :] + shift[:, 0:1]   # (n, h)
    cols = jnp.arange(w)[None, :] + shift[:, 1:2]   # (n, w)
    batch = jnp.arange(n)[:, None, None]
    out = xp[batch, rows[:, :, None], cols[:, None, :], :]
    return out


class Encoder(nn.Module):
    """4-layer conv encoder, obs in [0, 255] (reference drqv2.py:51-70)."""

    @nn.compact
    def __call__(self, obs):
        x = obs / 255.0 - 0.5
        x = nn.relu(nn.Conv(32, (3, 3), strides=(2, 2), padding="VALID")(x))
        x = nn.relu(nn.Conv(32, (3, 3), padding="VALID")(x))
        x = nn.relu(nn.Conv(32, (3, 3), padding="VALID")(x))
        x = nn.relu(nn.Conv(32, (3, 3), padding="VALID")(x))
        return x.reshape(x.shape[0], -1)


class Actor(nn.Module):
    action_dim: int
    feature_dim: int = 50
    hidden_dim: int = 1024

    @nn.compact
    def __call__(self, h):
        x = nn.Dense(self.feature_dim)(h)
        x = nn.LayerNorm()(x)
        x = jnp.tanh(x)
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        return jnp.tanh(nn.Dense(self.action_dim)(x))  # mean in [-1, 1]


class Critic(nn.Module):
    feature_dim: int = 50
    hidden_dim: int = 1024

    @nn.compact
    def __call__(self, h, action):
        x = nn.Dense(self.feature_dim)(h)
        x = nn.LayerNorm()(x)
        x = jnp.tanh(x)
        x = jnp.concatenate([x, action], axis=-1)

        def q(name):
            y = nn.relu(nn.Dense(self.hidden_dim, name=f"{name}_1")(x))
            y = nn.relu(nn.Dense(self.hidden_dim, name=f"{name}_2")(y))
            return nn.Dense(1, name=f"{name}_out")(y)

        return q("Q1"), q("Q2")


class AgentState(struct.PyTreeNode):
    encoder_params: Any
    actor_params: Any
    critic_params: Any
    critic_target_params: Any
    encoder_opt: Any
    actor_opt: Any
    critic_opt: Any
    updated_steps: jnp.ndarray


class DrQV2Agent:
    """Functional agent: state in AgentState, all updates jitted
    (reference DrQV2Agent, drqv2.py:127-301)."""

    def __init__(self, obs_shape: Sequence[int], action_dim: int, *,
                 lr: float = 1e-4, feature_dim: int = 50,
                 hidden_dim: int = 1024, critic_target_tau: float = 0.01,
                 num_expl_steps: int = 2000, update_every_steps: int = 2,
                 stddev_schedule: str = "linear(1.0,0.1,100000)",
                 stddev_clip: float = 0.3, delay_steps: int = 1,
                 discount_gamma: float = 0.99, seed: int = 0):
        self.action_dim = action_dim
        self.critic_target_tau = critic_target_tau
        self.num_expl_steps = num_expl_steps
        self.update_every_steps = update_every_steps
        self.stddev_schedule = stddev_schedule
        self.stddev_clip = stddev_clip
        self.delay_steps = delay_steps

        self.encoder = Encoder()
        self.actor = Actor(action_dim, feature_dim, hidden_dim)
        self.critic = Critic(feature_dim, hidden_dim)

        h, w, c = obs_shape
        dummy = jnp.zeros((1, h, w, c), jnp.float32)
        k = jax.random.key(seed)
        k1, k2, k3 = jax.random.split(k, 3)
        enc_p = self.encoder.init(k1, dummy)
        feat = self.encoder.apply(enc_p, dummy)
        act_p = self.actor.init(k2, feat)
        cri_p = self.critic.init(k3, feat, jnp.zeros((1, action_dim)))

        self.tx = optax.adamw(lr, weight_decay=1e-6)
        self.state = AgentState(
            encoder_params=enc_p, actor_params=act_p, critic_params=cri_p,
            critic_target_params=jax.tree_util.tree_map(jnp.copy, cri_p),
            encoder_opt=self.tx.init(enc_p), actor_opt=self.tx.init(act_p),
            critic_opt=self.tx.init(cri_p),
            updated_steps=jnp.zeros((), jnp.int32))

        self._act = jax.jit(self._act_impl, static_argnames=("eval_mode",))
        self._update = jax.jit(self._update_impl,
                               static_argnames=("update_actor",))

    # ------------------------------------------------------------------

    def _act_impl(self, state: AgentState, obs, stddev, rng,
                  eval_mode: bool):
        feat = self.encoder.apply(state.encoder_params, obs)
        mu = self.actor.apply(state.actor_params, feat)
        if eval_mode:
            return mu
        return truncated_normal_sample(rng, mu, stddev)

    def act(self, obs: np.ndarray, step: int, eval_mode: bool,
            rng=None) -> np.ndarray:
        """obs: [H, W, C] uint8-scaled array -> action [A]
        (reference drqv2.py:175-188)."""
        from ivideogpt_tpu.mbrl.utils import schedule
        rng = rng if rng is not None else jax.random.key(
            np.random.randint(2**31))
        stddev = schedule(self.stddev_schedule, step)
        a = self._act(self.state, jnp.asarray(obs)[None].astype(jnp.float32),
                      stddev, rng, eval_mode)
        a = np.asarray(a[0])
        if not eval_mode and step < self.num_expl_steps:
            a = np.random.uniform(-1.0, 1.0, a.shape).astype(a.dtype)
        return a

    def batched_policy(self, rng):
        """Device policy fn(state, obs_batch, stddev) for imagination rollouts
        (used in place of reference act2, drqv2.py:190-200)."""
        def policy(state, obs, stddev, key):
            feat = self.encoder.apply(state.encoder_params, obs)
            mu = self.actor.apply(state.actor_params, feat)
            return truncated_normal_sample(key, mu, stddev)
        return policy

    # ------------------------------------------------------------------

    def _update_impl(self, state: AgentState, batch, stddev, rng,
                     update_actor: bool):
        obs, action, reward, discount, next_obs = batch
        r_aug1, r_aug2, r_next, r_actor = jax.random.split(rng, 4)

        obs = random_shift_aug(r_aug1, obs.astype(jnp.float32))
        next_obs = random_shift_aug(r_aug2, next_obs.astype(jnp.float32))

        next_feat = jax.lax.stop_gradient(
            self.encoder.apply(state.encoder_params, next_obs))

        # critic + encoder update (reference drqv2.py:202-231)
        def critic_loss_fn(enc_params, cri_params):
            feat = self.encoder.apply(enc_params, obs)
            next_mu = self.actor.apply(state.actor_params, next_feat)
            next_action = truncated_normal_sample(r_next, next_mu, stddev,
                                                  clip=self.stddev_clip)
            tq1, tq2 = self.critic.apply(state.critic_target_params,
                                         next_feat, next_action)
            target_q = jax.lax.stop_gradient(
                reward + discount * jnp.minimum(tq1, tq2))
            q1, q2 = self.critic.apply(cri_params, feat, action)
            loss = (jnp.mean(jnp.square(q1 - target_q))
                    + jnp.mean(jnp.square(q2 - target_q)))
            return loss, (feat, q1, q2, target_q)

        (critic_loss, (feat, q1, q2, target_q)), grads = jax.value_and_grad(
            critic_loss_fn, argnums=(0, 1), has_aux=True)(
            state.encoder_params, state.critic_params)
        enc_grads, cri_grads = grads
        enc_up, enc_opt = self.tx.update(enc_grads, state.encoder_opt,
                                         state.encoder_params)
        cri_up, cri_opt = self.tx.update(cri_grads, state.critic_opt,
                                         state.critic_params)
        state = state.replace(
            encoder_params=optax.apply_updates(state.encoder_params, enc_up),
            critic_params=optax.apply_updates(state.critic_params, cri_up),
            encoder_opt=enc_opt, critic_opt=cri_opt)

        metrics = {"critic_loss": critic_loss, "critic_q1": jnp.mean(q1),
                   "critic_q2": jnp.mean(q2),
                   "critic_target_q": jnp.mean(target_q),
                   "batch_reward": jnp.mean(reward)}

        if update_actor:
            feat_sg = jax.lax.stop_gradient(feat)

            def actor_loss_fn(act_params):
                mu = self.actor.apply(act_params, feat_sg)
                a = truncated_normal_sample(r_actor, mu, stddev,
                                            clip=self.stddev_clip)
                q1a, q2a = self.critic.apply(state.critic_params, feat_sg, a)
                return -jnp.mean(jnp.minimum(q1a, q2a))

            actor_loss, act_grads = jax.value_and_grad(actor_loss_fn)(
                state.actor_params)
            act_up, act_opt = self.tx.update(act_grads, state.actor_opt,
                                             state.actor_params)
            state = state.replace(
                actor_params=optax.apply_updates(state.actor_params, act_up),
                actor_opt=act_opt,
                critic_target_params=soft_update(
                    state.critic_target_params, state.critic_params,
                    self.critic_target_tau))
            metrics["actor_loss"] = actor_loss

        state = state.replace(updated_steps=state.updated_steps + 1)
        return state, metrics

    def update(self, batch, step: int, rng=None):
        """batch: (obs, action, reward, discount, next_obs) numpy NHWC
        (reference drqv2.py:253-301)."""
        from ivideogpt_tpu.mbrl.utils import schedule
        if step % self.update_every_steps != 0:
            return {}
        rng = rng if rng is not None else jax.random.key(
            np.random.randint(2**31))
        stddev = schedule(self.stddev_schedule, step)
        update_actor = int(self.state.updated_steps) % self.delay_steps == 0
        batch = tuple(jnp.asarray(x) for x in batch)
        self.state, metrics = self._update(self.state, batch, stddev, rng,
                                           update_actor=update_actor)
        return {k: float(v) for k, v in metrics.items()}
