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
