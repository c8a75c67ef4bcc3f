"""CompressiveVQModel shape/contract tests on a tiny config (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivideogpt_tpu.configs import CompressiveVQConfig
from ivideogpt_tpu.models.tokenizer import (
    CompressiveVQModel, depatchify, patchify)

# tiny: 32px, 2 downs -> 8x8 latent -> 64 ctx tokens; patch 4 -> 2x2=4 dyn tokens
TINY = CompressiveVQConfig(
    block_out_channels=(16, 32, 32),
    layers_per_block=1,
    latent_channels=8,
    num_vq_embeddings=64,
    num_dyn_embeddings=64,
    norm_num_groups=8,
    mid_block_add_attention=False,
    context_length=2,
    resolution=32,
    max_att_resolution=8,
    patch_size=4,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = CompressiveVQModel(TINY, use_pallas=False)
    B, T = 2, 5
    px = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (B, T, 32, 32, 3)),
                     jnp.float32)
    params = model.init(jax.random.key(0), px[:, :2].reshape(-1, 32, 32, 3),
                        px[:, 2:].reshape(-1, 32, 32, 3), segment_len=3)
    return model, params


def test_patchify_roundtrip():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 8, 8, 5)), jnp.float32)
    p = patchify(x, 4)
    assert p.shape == (3, 4, 80)
    y = depatchify(p, 8, 8, 4, 5)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_derived_config_quantities():
    assert TINY.latent_resolution == 8
    assert TINY.ctx_tokens_per_frame == 64
    assert TINY.dyn_tokens_per_frame == 4
    assert TINY.scf_token == 128
    assert TINY.sdf_token == 129
    assert TINY.vocab_size == 130


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    B, T, ctx = 2, 5, 2
    F = T - ctx
    px = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (B, T, 32, 32, 3)),
                     jnp.float32)
    dec, ref_dec, commit, dyn_commit = model.apply(
        params, px[:, :ctx].reshape(-1, 32, 32, 3),
        px[:, ctx:].reshape(-1, 32, 32, 3), segment_len=F)
    assert dec.shape == (B * F, 32, 32, 3)
    assert ref_dec.shape == (B * ctx, 32, 32, 3)
    assert commit.shape == () and dyn_commit.shape == ()
    assert np.isfinite(np.asarray(dec)).all()


def test_tokenize_detokenize_contract(model_and_params):
    model, params = model_and_params
    B, T, ctx = 2, 5, 2
    F = T - ctx
    px = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (B, T, 32, 32, 3)),
                     jnp.float32)

    indices, labels = model.apply(params, px, ctx, method=model.tokenize)
    L = (64 + 1) * ctx - 1 + (4 + 1) * F
    assert indices.shape == (B, L)
    ind = np.asarray(indices)
    # scf between context frames, sdf before each dyn frame
    assert (ind[:, 64] == TINY.scf_token).all()
    for f in range(F):
        assert (ind[:, 129 + f * 5] == TINY.sdf_token).all()
    # dyn tokens live in [num_vq, num_vq + num_dyn)
    for f in range(F):
        chunk = ind[:, 130 + f * 5: 134 + f * 5]
        assert (chunk >= TINY.num_vq_embeddings).all()
        assert (chunk < TINY.num_vq_embeddings + TINY.num_dyn_embeddings).all()

    frames = model.apply(params, indices, ctx, method=model.detokenize)
    assert frames.shape == (B, T, 32, 32, 3)
    assert np.isfinite(np.asarray(frames)).all()

    # detokenize with cache returns identical frames
    frames2, cache = model.apply(params, indices, ctx, None, True,
                                 method=model.detokenize)
    np.testing.assert_allclose(np.asarray(frames), np.asarray(frames2), atol=1e-6)
    frames3 = model.apply(params, indices, ctx, cache, method=model.detokenize)
    np.testing.assert_allclose(np.asarray(frames), np.asarray(frames3), atol=1e-6)


def test_tokenize_is_deterministic(model_and_params):
    model, params = model_and_params
    px = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (1, 4, 32, 32, 3)),
                     jnp.float32)
    i1, _ = model.apply(params, px, 2, method=model.tokenize)
    i2, _ = model.apply(params, px, 2, method=model.tokenize)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_detokenize_finite_on_arbitrary_vocab_ids(model_and_params):
    """An LM-sampled stream can carry ANY vocab id in any slot (top-k over
    the full vocab, especially early in training). disassemble clamps both
    grids into their codebooks because jnp.take under jit fills
    out-of-bounds reads with NaN — without the ctx-side clamp one stray id
    silently poisons the whole decoded batch (round-4 regression: the KV
    divergence study's random prelude produced all-NaN frames)."""
    from ivideogpt_tpu import tokens as token_lib
    model, params = model_and_params
    B, T, ctx = 2, 5, 2
    L = token_lib.seq_len(ctx, T, ctx_tokens=TINY.ctx_tokens_per_frame,
                          dyn_tokens=TINY.dyn_tokens_per_frame)
    rng = np.random.default_rng(11)
    # ids across the FULL LM vocab incl. specials, in every slot
    ids = jnp.asarray(rng.integers(0, TINY.vocab_size, (B, L)), jnp.int32)
    frames = jax.jit(lambda p, i: model.apply(
        p, i, ctx, method=model.detokenize))(params, ids)
    assert frames.shape[:2] == (B, T)
    assert np.isfinite(np.asarray(frames)).all()
