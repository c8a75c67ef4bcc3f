"""LoRA adapter tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ivideogpt_tpu.train import lora
from tests.test_llama import TINY_LM
from ivideogpt_tpu.models.llama import LlamaForCausalLM


def test_lora_init_and_merge_identity():
    model = LlamaForCausalLM(TINY_LM)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.key(0), ids)

    adapters = lora.init_lora(params, jax.random.key(1), rank=4)
    assert adapters, "no adapters created"
    # b is zero-init -> merge is identity at init
    merged = lora.merge(params, adapters)
    a = model.apply(params, ids)["logits"]
    b = model.apply(merged, ids)["logits"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_train_step_changes_output():
    model = LlamaForCausalLM(TINY_LM)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 130, (2, 12)), jnp.int32)
    params = model.init(jax.random.key(0), ids)
    adapters = lora.init_lora(params, jax.random.key(1), rank=4)
    n_lora = sum(x.size for x in jax.tree.leaves(adapters))
    n_base = sum(x.size for x in jax.tree.leaves(params))
    assert n_lora < 0.2 * n_base

    tx = optax.adam(1e-2)
    opt_state = tx.init(adapters)

    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    # use the raw LM via a shim matching make_lora_train_step's interface
    class Shim:
        @staticmethod
        def apply(p, input_ids, labels, action, deterministic, rngs):
            return model.apply(p, input_ids, labels=labels,
                               deterministic=deterministic)
    step = lora.make_lora_train_step(Shim, tx, action_conditioned=False)

    batch = {"input_ids": ids, "labels": ids}
    before = model.apply(params, ids)["logits"]
    adapters, opt_state, m = step(params, adapters, opt_state, batch,
                                  jax.random.key(2))
    assert np.isfinite(m["loss"])
    after = model.apply(lora.merge(params, adapters), ids)["logits"]
    assert np.abs(np.asarray(after) - np.asarray(before)).max() > 0
