"""Fused decode-attention kernel: interpret-mode parity vs the XLA oracle
across valid lengths, tilings, and tie-prone inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivideogpt_tpu.ops.decode_attention import (decode_attention,
                                                decode_attention_xla,
                                                pick_tiles)


@pytest.mark.parametrize("valid", [1, 5, 127, 128, 129, 200, 256])
def test_kernel_matches_oracle(valid):
    rng = np.random.default_rng(valid)
    G, hd, M = 96, 64, 256
    q = jnp.asarray(rng.normal(size=(G, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.integers(-127, 128, (G, hd, M)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, (G, hd, M)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (G, M)), jnp.bfloat16)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (G, M)), jnp.bfloat16)
    ref = decode_attention_xla(q, k, ks, v, vs, valid)
    got = decode_attention(q, k, ks, v, vs, valid, tg=48, tm=128,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-3)


def test_pick_tiles():
    assert pick_tiles(3072, 768) == (384, 256)
    assert pick_tiles(8, 256) == (8, 256)
    assert pick_tiles(12, 128) == (12, 128)
    with pytest.raises(ValueError):
        pick_tiles(96, 100)
