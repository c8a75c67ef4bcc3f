"""LoRA adapters for the token transformer.

Rebuild of the reference's peft-LoRA option (reference train_gpt.py:621-633:
r/alpha/dropout on q/k/v/o/gate/up/down projections, embed_tokens, lm_head).

Functional design: the adapter is a separate pytree of (a, b) factor pairs;
``merge`` materializes base + (alpha/r) * a @ b inside the jitted step (the
rank-r matmul is negligible next to the forward), and the train step
differentiates only the adapter tree — the memory/optimizer-state win LoRA
exists for.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj",
                   "gate_proj", "up_proj", "down_proj",
                   "embed_tokens", "lm_head")


def _is_target(path, targets) -> bool:
    names = [str(getattr(k, "key", k)) for k in path]
    return any(t in names for t in targets)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def init_lora(params, rng, rank: int = 8,
              targets: Sequence[str] = DEFAULT_TARGETS):
    """Build the adapter tree: {"a/b/kernel": {"a": [in, r], "b": [r, out]}}
    for every 2D kernel under a target module. a ~ N(0, 0.02), b = 0
    (delta starts at zero)."""
    import zlib
    flat = {}

    def visit(path, x):
        if x.ndim == 2 and _is_target(path, targets):
            name = _path_str(path)
            key = jax.random.fold_in(rng, zlib.crc32(name.encode()))
            flat[name] = {
                "a": jax.random.normal(key, (x.shape[0], rank),
                                       jnp.float32) * 0.02,
                "b": jnp.zeros((rank, x.shape[1]), jnp.float32),
            }
        return x

    jax.tree_util.tree_map_with_path(visit, params)
    return flat


def merge(params, lora, alpha: float = 16.0, rank: int = 8):
    """base + (alpha/rank) * a @ b at every adapted kernel."""
    scale = alpha / rank

    def apply(path, x):
        name = _path_str(path)
        if name in lora:
            delta = (lora[name]["a"] @ lora[name]["b"]) * scale
            return x + delta.astype(x.dtype)
        return x

    return jax.tree_util.tree_map_with_path(apply, params)


def make_lora_train_step(model, tx, *, action_conditioned: bool,
                         alpha: float = 16.0, rank: int = 8):
    """GPT train step over LoRA params only; base params frozen."""

    @functools.partial(jax.jit, donate_argnums=(1,))
    def step(base_params, lora_params, opt_state, batch, rng):
        def loss_fn(lora_p):
            merged = merge(base_params, lora_p, alpha, rank)
            out = model.apply(
                merged, batch["input_ids"], batch["labels"],
                batch.get("action") if action_conditioned else None,
                deterministic=False, rngs={"dropout": rng})
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(lora_params)
        import optax
        updates, opt_state = tx.update(grads, opt_state, lora_params)
        lora_params = optax.apply_updates(lora_params, updates)
        return lora_params, opt_state, {"loss": loss,
                                        "perplexity": jnp.exp(loss)}

    return step
