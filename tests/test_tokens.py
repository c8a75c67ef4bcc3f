"""Token-stream contract tests (layout math from reference
compressive_vq_model.py:199-236 and action_model.py:11-16)."""

import jax.numpy as jnp
import numpy as np

from ivideogpt_tpu import tokens
from ivideogpt_tpu.configs import TOKENIZER_64


def test_seq_len_matches_reference_arithmetic():
    # ctx=2, T=16: 2*257 - 1 + 14*17 = 751 (BASELINE.md token budget)
    assert tokens.seq_len(2, 16) == 751
    assert tokens.seq_len(1, 16) == 256 + 15 * 17
    assert tokens.prelude_len(2) == 513
    assert tokens.max_new_tokens(2, 16) == 17 * 14 - 1


def test_assemble_layout():
    cfg = TOKENIZER_64
    B, ctx, F = 2, 2, 3
    rng = np.random.default_rng(0)
    ctx_idx = jnp.asarray(rng.integers(0, cfg.num_vq_embeddings, (B, ctx, 256)), jnp.int32)
    dyn_idx = jnp.asarray(rng.integers(0, cfg.num_dyn_embeddings, (B, F, 16)), jnp.int32)

    indices, labels = tokens.assemble(ctx_idx, dyn_idx,
                                      cfg.num_vq_embeddings, cfg.num_dyn_embeddings)
    L = tokens.seq_len(ctx, ctx + F)
    assert indices.shape == (B, L)
    assert labels.shape == (B, L)

    ind = np.asarray(indices)
    # frame 1 context tokens, then scf, then frame 2
    np.testing.assert_array_equal(ind[:, :256], np.asarray(ctx_idx[:, 0]))
    assert (ind[:, 256] == cfg.scf_token).all()
    np.testing.assert_array_equal(ind[:, 257:513], np.asarray(ctx_idx[:, 1]))
    # dyn frames: sdf then 16 offset tokens
    for f in range(F):
        base = 513 + f * 17
        assert (ind[:, base] == cfg.sdf_token).all()
        np.testing.assert_array_equal(
            ind[:, base + 1: base + 17],
            np.asarray(dyn_idx[:, f]) + cfg.num_vq_embeddings)

    lab = np.asarray(labels)
    # -100 over prelude + first sdf
    assert (lab[:, :514] == tokens.IGNORE_INDEX).all()
    # the rest is the dyn stream shifted by one
    np.testing.assert_array_equal(lab[:, 514:], ind[:, 514:])


def test_assemble_disassemble_roundtrip():
    cfg = TOKENIZER_64
    for ctx, T in [(1, 16), (2, 16), (2, 12), (2, 8)]:
        B, F = 3, T - ctx
        rng = np.random.default_rng(ctx * 100 + T)
        ctx_idx = jnp.asarray(rng.integers(0, cfg.num_vq_embeddings, (B, ctx, 256)), jnp.int32)
        dyn_idx = jnp.asarray(rng.integers(0, cfg.num_dyn_embeddings, (B, F, 16)), jnp.int32)
        indices, _ = tokens.assemble(ctx_idx, dyn_idx,
                                     cfg.num_vq_embeddings, cfg.num_dyn_embeddings)
        c2, d2 = tokens.disassemble(indices, ctx,
                                    cfg.num_vq_embeddings, cfg.num_dyn_embeddings)
        np.testing.assert_array_equal(np.asarray(c2), np.asarray(ctx_idx))
        np.testing.assert_array_equal(np.asarray(d2), np.asarray(dyn_idx))


def test_sdf_positions():
    pos = np.asarray(tokens.sdf_positions(2, 16))
    assert pos[0] == 513
    assert (np.diff(pos) == 17).all()
    assert len(pos) == 14


def test_make_prelude_matches_full_tokenize_prefix():
    """make_prelude(ctx tokens) must equal the first prelude_len+1 tokens of
    the assembled full stream (what generate() consumes)."""
    from ivideogpt_tpu import tokens as T
    rng = np.random.default_rng(0)
    B, ctx, F, n_ctx, n_dyn, nv, nd = 3, 2, 4, 16, 4, 64, 64
    ctx_idx = jnp.asarray(rng.integers(0, nv, (B, ctx, n_ctx)), jnp.int32)
    dyn_idx = jnp.asarray(rng.integers(0, nd, (B, F, n_dyn)), jnp.int32)
    full, _ = T.assemble(ctx_idx, dyn_idx, nv, nd)
    P1 = T.prelude_len(ctx, n_ctx) + 1
    np.testing.assert_array_equal(
        np.asarray(T.make_prelude(ctx_idx, nv, nd)),
        np.asarray(full[:, :P1]))
