"""Token-LM training: jitted train/eval steps, data-parallel over the mesh.

Rebuild of the reference train driver's hot loop (reference
train_gpt.py:766-804): tokenize pixels under stop_gradient, LM forward with
action injection, CE loss, clipped AdamW step. The DDP all-reduce is replaced
by GSPMD: batches are sharded on the "data" mesh axis and XLA inserts the
gradient psum.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ivideogpt_tpu.train.optim import TrainState, global_norm


def make_tokenize_fn(tokenizer_model, tokenizer_params, context_length: int):
    """Frozen-tokenizer pixel->token function (reference train_gpt.py:777:
    tokenize under no_grad)."""
    @jax.jit
    def tokenize(pixels):
        params = jax.lax.stop_gradient(tokenizer_params)
        return tokenizer_model.apply(params, pixels, context_length,
                                     method=tokenizer_model.tokenize)
    return tokenize


def make_train_step(model, *, action_conditioned: bool):
    """Returns step(state, batch, rng) -> (state, metrics).

    batch: {"input_ids": [B, L], "labels": [B, L][, "action": [B, T, A]]}
    """
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        def loss_fn(params):
            out = model.apply(
                params, batch["input_ids"], batch["labels"],
                batch.get("action") if action_conditioned else None,
                deterministic=False, rngs={"dropout": rng})
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        gnorm = global_norm(grads)
        state = state.apply_gradients(grads)
        return state, {"loss": loss, "grad_norm": gnorm,
                       "perplexity": jnp.exp(loss)}

    return step


def make_eval_step(model, *, action_conditioned: bool):
    @jax.jit
    def step(params, batch):
        out = model.apply(
            params, batch["input_ids"], batch["labels"],
            batch.get("action") if action_conditioned else None,
            deterministic=True)
        return {"loss": out["loss"], "perplexity": jnp.exp(out["loss"])}
    return step
