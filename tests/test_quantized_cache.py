"""int8 KV-cache decode: close to the fp32-cache decode."""

import jax
import jax.numpy as jnp
import numpy as np

from ivideogpt_tpu.models.llama import LlamaForCausalLM
from tests.test_llama import TINY_LM


def test_int8_cache_matches_fp32_decode():
    model = LlamaForCausalLM(TINY_LM)
    B, S = 2, 12
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 130, (B, S)), jnp.int32)
    params = model.init(jax.random.key(0), ids)
    embeds = model.apply(params, ids, method=model.embed)

    def run(cache_dtype):
        cache = model.apply(params, B, S, cache_dtype,
                            method=model.init_cache)
        h, cache = model.apply(params, embeds[:, :5], cache, 0,
                               method=model.forward_cached)
        outs = [h]
        for t in range(5, S):
            h, cache = model.apply(params, embeds[:, t:t + 1], cache, t,
                                   method=model.forward_cached)
            outs.append(h)
        return jnp.concatenate(outs, axis=1)

    ref = np.asarray(run(jnp.float32))
    q = np.asarray(run(jnp.int8))
    # int8 quantization error is small relative to hidden magnitudes
    denom = np.abs(ref).mean()
    assert np.abs(q - ref).mean() / denom < 0.05, \
        (np.abs(q - ref).mean(), denom)
    # and the cache halves its big-buffer bytes
    c8 = model.apply(params, B, S, jnp.int8, method=model.init_cache)
    cbf = model.apply(params, B, S, jnp.bfloat16, method=model.init_cache)
    bytes8 = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(c8))
    bytes16 = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(cbf))
    assert bytes8 < 0.6 * bytes16


def test_ghdm_cache_layout_matches_bshd():
    """The kernel-native transposed int8 cache (cache_layout='ghdm') must
    sample the same tokens as the standard int8 cache (on CPU the math runs
    through the XLA oracle; the Pallas kernel itself is parity-tested in
    ops tests)."""
    import numpy as np
    from ivideogpt_tpu import generation, tokens
    from ivideogpt_tpu.configs import ActionModelConfig, TransformerConfig
    from ivideogpt_tpu.models.action_model import HeadModelWithAction

    lm_cfg = TransformerConfig(
        vocab_size=130, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=512)
    head = ActionModelConfig(action_dim=4, context_length=2,
                             segment_length=6, tokens_per_context=16,
                             tokens_per_dyna=4)
    model = HeadModelWithAction(lm_cfg, head)
    L = tokens.seq_len(2, 6, ctx_tokens=16, dyn_tokens=4)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 128, (2, L)), jnp.int32)
    act = jnp.asarray(rng.normal(size=(2, 6, 4)), jnp.float32)
    params = model.init(jax.random.key(0), ids, ids, act)
    P1 = tokens.prelude_len(2, 16) + 1

    kw = dict(segment_length=6, context_length=2, action=act,
              tokens_per_dyna=4, top_k=10)
    r_std = generation.generate(model, params, ids[:, :P1], jax.random.key(5),
                                cache_dtype=jnp.int8, **kw)
    r_ghdm = generation.generate(model, params, ids[:, :P1],
                                 jax.random.key(5), cache_dtype=jnp.int8,
                                 cache_layout="ghdm", **kw)
    np.testing.assert_array_equal(np.asarray(r_std.tokens),
                                  np.asarray(r_ghdm.tokens))
