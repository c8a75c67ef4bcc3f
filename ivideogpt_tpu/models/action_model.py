"""Action-conditioned LM head wrapper.

Rebuild of reference ivideogpt/transformer/action_model.py:8-205:
- continuous robot actions -> zero-init linear -> added to the embedding at
  each per-frame sdf separator slot
- optional reward head (linear on the last hidden state) and action-
  reconstruction auxiliary loss

Token geometry (ctx=2, T=16):
          prelude                         dyna
             |                             |
  ([0:255] scf [0:255])   sdf [0:15] sdf [0:15] ...
  action[0]    action[1]  action[2]  ...

Autoregressive generation lives in ivideogpt_tpu/generation.py as one jitted
lax.scan over the KV cache (the reference's host-side HF generate loop,
action_model.py:57-121, is the main thing this framework replaces).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ivideogpt_tpu.configs import ActionModelConfig, TransformerConfig
from ivideogpt_tpu.models.llama import LlamaForCausalLM, cross_entropy_loss


class HeadModelWithAction(nn.Module):
    llm_config: TransformerConfig
    head_config: ActionModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        h = self.head_config
        self.llm = LlamaForCausalLM(self.llm_config, dtype=self.dtype, name="llm")
        # zero-init so action conditioning starts as a no-op
        # (reference action_model.py:36-39)
        self.action_linear = nn.Dense(
            self.llm_config.hidden_size, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            name="action_linear")
        if h.reward_prediction:
            self.reward_linear = nn.Dense(1, dtype=self.dtype,
                                          name="reward_linear")
        if h.action_recon is not None:
            self.action_recon_linear = nn.Dense(
                h.action_dim, dtype=self.dtype, name="action_recon_linear")

    # --- building blocks reused by the jitted generation scan -------------

    def embed_tokens(self, input_ids):
        return self.llm.embed(input_ids)

    def action_embeds(self, action):
        return self.action_linear(action)

    def reward(self, hidden):
        return self.reward_linear(hidden)[..., 0]

    def unembed(self, hidden):
        return self.llm.unembed(hidden)

    def init_cache(self, batch, max_len, cache_dtype=jnp.bfloat16,
                   layout="bshd"):
        return self.llm.init_cache(batch, max_len, cache_dtype, layout)

    def decode_cached(self, inputs_embeds, cache, cache_index,
                      deterministic: bool = True, read_len=None):
        return self.llm.forward_cached(inputs_embeds, cache, cache_index,
                                       deterministic=deterministic,
                                       read_len=read_len)

    def sdf_positions(self):
        h = self.head_config
        return (h.prelude_tokens_num
                + jnp.arange(h.segment_length - h.context_length)
                * (h.tokens_per_dyna + 1))

    # -----------------------------------------------------------------------

    def __call__(self, input_ids: jnp.ndarray,
                 labels: Optional[jnp.ndarray] = None,
                 action: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        """Training forward (reference action_model.py:154-205).

        input_ids: [B, L], action: [B, T, A] (full segment of actions).
        Returns dict(loss, logits[, reward_pred, action_recon_loss]).
        """
        h = self.head_config
        inputs_embeds = self.llm.embed(input_ids)
        positions = self.sdf_positions()

        if action is not None:
            a = self.action_linear(action)
            a = a[:, h.context_length - 1:-1, :]  # drop unused ctx-1 head / last
            inputs_embeds = inputs_embeds.at[:, positions, :].add(
                a.astype(inputs_embeds.dtype))

        need_hidden = h.reward_prediction or (h.action_recon is not None)
        out = self.llm(inputs_embeds=inputs_embeds, labels=labels,
                       deterministic=deterministic,
                       output_hidden_states=need_hidden)
        result = {"logits": out["logits"]}
        if labels is not None:
            result["loss"] = out["loss"]

        if h.action_recon is not None and action is not None:
            hidden = out["hidden_states"]
            F = h.segment_length - h.context_length
            rec_h = hidden[:, h.prelude_tokens_num:, :]
            rec = self.action_recon_linear(rec_h).reshape(
                -1, F, h.tokens_per_dyna + 1, h.action_dim)
            target = action[:, h.context_length - 1:-1, None, :]
            target = jnp.broadcast_to(target, rec.shape)
            recon_loss = jnp.mean(jnp.square(rec - target))
            result["action_recon_loss"] = recon_loss
            if "loss" in result:
                result["loss"] = result["loss"] + h.action_recon * recon_loss

        if h.reward_prediction:
            hidden = out["hidden_states"]
            # hidden state at the last dyn token of each frame
            # (reference action_model.py:198-204)
            reward_pos = positions + h.tokens_per_dyna
            reward_h = hidden[:, reward_pos, :]
            result["reward_pred"] = self.reward_linear(reward_h)[..., 0]

        return result
