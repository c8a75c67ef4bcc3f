"""VQ kernel tests: Pallas (interpret mode on CPU) vs XLA vs numpy reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivideogpt_tpu.ops import vq


def _assert_near_optimal(z, e, got):
    """The chosen code must be (numerically) a nearest neighbor.

    Exact argmin ids can legitimately differ between the expanded-form fp32
    distance (||E||^2 - 2zE, what any matmul-based kernel computes) and the
    exact pairwise form at float tie boundaries; correctness = the selected
    distance matches the true min to fp32 rounding.
    """
    d = ((z[:, None, :].astype(np.float64) - e[None, :, :].astype(np.float64)) ** 2).sum(-1)
    chosen = d[np.arange(len(got)), got]
    best = d.min(1)
    scale = np.maximum(np.abs(d).max(1), 1.0)
    assert (chosen - best <= 1e-3 * scale).all(), \
        f"max gap {np.max((chosen - best) / scale)}"
    # and the vast majority must be the exact argmin
    mismatches = int((got != d.argmin(1)).sum())
    assert mismatches <= max(2, int(0.05 * len(got)))


@pytest.mark.parametrize("n,k,d", [
    (64, 256, 64),
    pytest.param(300, 8192, 64, marks=pytest.mark.slow),
    (17, 100, 32)])
def test_xla_lookup_matches_numpy(n, k, d):
    rng = np.random.default_rng(n + k)
    z = rng.normal(size=(n, d)).astype(np.float32)
    e = rng.normal(size=(k, d)).astype(np.float32)
    got = np.asarray(vq.vq_lookup(jnp.asarray(z), jnp.asarray(e), use_pallas=False))
    _assert_near_optimal(z, e, got)


@pytest.mark.parametrize("n,k,d", [
    (256, 2048, 64),
    pytest.param(300, 8192, 64, marks=pytest.mark.slow),
    (100, 300, 64)])
def test_pallas_kernel_interpret_matches_numpy(n, k, d):
    rng = np.random.default_rng(n * 7 + k)
    z = rng.normal(size=(n, d)).astype(np.float32)
    e = rng.normal(size=(k, d)).astype(np.float32)
    got = np.asarray(vq._vq_lookup_pallas(jnp.asarray(z), jnp.asarray(e), interpret=True))
    _assert_near_optimal(z, e, got)


def test_pallas_and_xla_agree():
    """Both paths use the expanded-form fp32 distance -> identical ids."""
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(size=(300, 64)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(8192, 64)).astype(np.float32))
    a = np.asarray(vq._vq_lookup_pallas(z, e, interpret=True))
    b = np.asarray(vq._vq_lookup_xla(z, e))
    assert (a == b).mean() > 0.999  # tile-chunked fp32 sums may flip rare ties


def test_quantize_straight_through_and_commit():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(4, 16, 8)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))

    res = vq.quantize(z, e, use_pallas=False)
    assert res.indices.shape == (4, 16)
    # forward value equals codebook entries
    np.testing.assert_allclose(
        np.asarray(res.quantized),
        np.asarray(e)[np.asarray(res.indices)], rtol=1e-5, atol=1e-6)

    # straight-through: d(sum(z_q))/dz == ones
    g = jax.grad(lambda zz: vq.quantize(zz, e, use_pallas=False).quantized.sum())(z)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(np.asarray(g)))

    # commit loss with beta=1, legacy=False: 2 * mean((z_q - z)^2) in value
    zq = np.asarray(e)[np.asarray(res.indices)]
    expect = 2.0 * np.mean((zq - np.asarray(z)) ** 2)
    np.testing.assert_allclose(float(res.commit_loss), expect, rtol=1e-5)

    # codebook receives gradient through the non-sg term
    ge = jax.grad(lambda ee: vq.quantize(z, ee, use_pallas=False).commit_loss)(e)
    assert float(jnp.abs(ge).sum()) > 0
