"""Optimizers, LR schedules, train state, EMA.

Mirrors the reference's HF/diffusers training knobs:
- AdamW with grouped weight decay; no decay for embeddings/norms/biases under
  --embed_no_wd (reference train_gpt.py:639-658)
- 'constant'/'cosine' schedulers with warmup (diffusers get_scheduler,
  reference train_tokenizer.py:478-484)
- global-norm grad clipping (reference train_gpt.py:798-804)
- EMA option (reference train_tokenizer.py:24,808)
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


def make_lr_schedule(kind: str, base_lr: float, warmup_steps: int,
                     total_steps: int):
    if kind in ("constant", "constant_with_warmup"):
        # diffusers get_scheduler spells the warmup variant explicitly
        # (reference train_tokenizer.py:181); our 'constant' already warms up
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
             optax.constant_schedule(base_lr)],
            [max(warmup_steps, 1)])
    if kind == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, max(warmup_steps, 1),
            max(total_steps, warmup_steps + 1), end_value=0.0)
    if kind == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
             optax.linear_schedule(base_lr, 0.0, total_steps - warmup_steps)],
            [max(warmup_steps, 1)])
    raise ValueError(kind)


def _no_wd_mask(params):
    """True where weight decay applies: 2D+ kernels except embeddings."""
    def rule(path, x):
        names = [str(getattr(k, "key", k)) for k in path]
        if x.ndim < 2:
            return False
        if any("embed" in n or "codebook" in n or "pos_emb" in n
               for n in names):
            return False
        return True
    return jax.tree_util.tree_map_with_path(rule, params)


def make_optimizer(params, *, learning_rate, lr_scheduler="cosine",
                   warmup_steps=0, total_steps=1_000_000, weight_decay=0.0,
                   embed_no_wd=True, b1=0.9, b2=0.999, eps=1e-8,
                   max_grad_norm: Optional[float] = 1.0,
                   gradient_accumulation_steps: int = 1):
    sched = make_lr_schedule(lr_scheduler, learning_rate, warmup_steps,
                             total_steps)
    mask = _no_wd_mask(params) if embed_no_wd else None
    tx = optax.adamw(sched, b1=b1, b2=b2, eps=eps,
                     weight_decay=weight_decay, mask=mask)
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    if gradient_accumulation_steps > 1:
        # accumulate micro-batch grads, apply every k steps
        # (reference accelerator.accumulate, train_tokenizer.py:638)
        tx = optax.MultiSteps(tx, gradient_accumulation_steps)
    return tx, sched


class TrainState(struct.PyTreeNode):
    """Minimal functional train state (params + opt state + step)."""
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt)


def ema_update(ema_params, params, decay: float):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params)


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


def per_module_grad_norms(grads, depth: int = 2):
    """Per-submodule gradient norms for diagnostics (the reference dumps
    grad-norm-per-parameter every log_grad_norm_steps,
    train_tokenizer.py:115-120)."""
    groups = {}

    def visit(path, x):
        key = "/".join(str(getattr(k, "key", k)) for k in path[:depth])
        groups.setdefault(key, []).append(jnp.sum(jnp.square(x)))
        return x

    jax.tree_util.tree_map_with_path(visit, grads)
    return {f"grad_norm/{k}": jnp.sqrt(sum(v)) for k, v in groups.items()}
