"""The token-stream contract, as pure shape-static functions.

This is the single most important contract shared by the tokenizer and the
transformer (derived from reference compressive_vq_model.py:199-220 and
transformer/action_model.py:11-16):

    [ctx frame 1: 256 ctx-tokens] [scf] [ctx frame 2: 256 ctx-tokens]
    [sdf] [16 dyn-tokens] [sdf] [16 dyn-tokens] ...   (T - ctx times)

- the *first* scf is dropped (reference compressive_vq_model.py:208)
- dyn token ids are offset by +num_vq_embeddings (reference :210)
- scf = num_vq + num_dyn, sdf = scf + 1 (reference :206,:211)
- labels are -100 over the prelude *and the first sdf*; next-token CE
  elsewhere (reference :216-218)
- sequence length for (ctx=2, T=16, 64px): 2*257 - 1 + 14*17 = 751

Everything here is static-shaped and jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

IGNORE_INDEX = -100


def seq_len(context_length: int, segment_length: int,
            ctx_tokens: int = 256, dyn_tokens: int = 16) -> int:
    """Total token-stream length for a (ctx, T) segment."""
    return (ctx_tokens + 1) * context_length - 1 \
        + (dyn_tokens + 1) * (segment_length - context_length)


def prelude_len(context_length: int, ctx_tokens: int = 256) -> int:
    """Number of context tokens incl. interleaved scf, excl. the first sdf."""
    return (ctx_tokens + 1) * context_length - 1


def max_new_tokens(context_length: int, segment_length: int,
                   dyn_tokens: int = 16) -> int:
    """HF-generate-equivalent budget: (1+16)*(T-ctx) - 1 (reference predict.py:57)."""
    return (dyn_tokens + 1) * (segment_length - context_length) - 1


def assemble(ctx_indices: jnp.ndarray, dyn_indices: jnp.ndarray,
             num_vq_embeddings: int, num_dyn_embeddings: int):
    """Interleave per-frame token grids with separators into one stream.

    Args:
      ctx_indices: [B, ctx, ctx_tokens] int32, raw context codebook ids.
      dyn_indices: [B, F, dyn_tokens] int32, raw dynamics codebook ids
        (NOT yet offset).
    Returns:
      (indices [B, L], labels [B, L]) with L = seq_len(...).
    """
    B, ctx, n_ctx = ctx_indices.shape
    _, F, n_dyn = dyn_indices.shape
    scf = num_vq_embeddings + num_dyn_embeddings
    sdf = scf + 1

    scf_col = jnp.full((B, ctx, 1), scf, dtype=ctx_indices.dtype)
    # [scf c c ... c] per frame, flattened, first scf dropped
    stream_c = jnp.concatenate([scf_col, ctx_indices], axis=2).reshape(B, -1)[:, 1:]

    sdf_col = jnp.full((B, F, 1), sdf, dtype=dyn_indices.dtype)
    stream_d = jnp.concatenate([sdf_col, dyn_indices + num_vq_embeddings],
                               axis=2).reshape(B, -1)

    indices = jnp.concatenate([stream_c, stream_d], axis=1)
    # -100 over the context stream plus the first sdf; the dyn stream shifted
    # left by one supplies the remaining labels (reference :216-218).
    labels = jnp.concatenate([
        jnp.full((B, stream_c.shape[1] + 1), IGNORE_INDEX, dtype=indices.dtype),
        stream_d[:, 1:],
    ], axis=1)
    return indices, labels


def make_prelude(ctx_indices: jnp.ndarray, num_vq_embeddings: int,
                 num_dyn_embeddings: int) -> jnp.ndarray:
    """Generation prelude from context tokens alone.

    [B, ctx, ctx_tokens] raw context ids -> [B, prelude_len + 1] stream
    ending in the first sdf — exactly the prefix generate() consumes. Lets
    rollouts skip tokenizing future frames entirely (the reference pads
    futures with zeros and tokenizes the whole clip, video_predictor.py:280-283).
    """
    B, ctx, n_ctx = ctx_indices.shape
    scf = num_vq_embeddings + num_dyn_embeddings
    sdf = scf + 1
    scf_col = jnp.full((B, ctx, 1), scf, dtype=ctx_indices.dtype)
    stream_c = jnp.concatenate([scf_col, ctx_indices], axis=2).reshape(B, -1)[:, 1:]
    return jnp.concatenate(
        [stream_c, jnp.full((B, 1), sdf, dtype=ctx_indices.dtype)], axis=1)


def disassemble(indices: jnp.ndarray, context_length: int,
                num_vq_embeddings: int, num_dyn_embeddings: int,
                ctx_tokens: int = 256, dyn_tokens: int = 16):
    """Inverse of :func:`assemble`: split a stream back into token grids.

    Mirrors reference compressive_vq_model.py:223-236 (dummy-token prepend,
    per-frame slicing, dyn offset removal with clamping).

    Returns:
      (ctx_indices [B, ctx, ctx_tokens], dyn_indices [B, F, dyn_tokens])
    """
    B, L = indices.shape
    assert (L + 1 - (1 + ctx_tokens) * context_length) % (1 + dyn_tokens) == 0, (
        f"stream length {L} does not match ctx={context_length}")
    future = (L + 1 - (1 + ctx_tokens) * context_length) // (1 + dyn_tokens)

    # prepend a dummy so every frame becomes [sep, tokens...]
    dummy = jnp.ones((B, 1), dtype=indices.dtype)
    full = jnp.concatenate([dummy, indices], axis=1)
    n_ctx_tok = context_length * (1 + ctx_tokens)

    ctx_part = full[:, :n_ctx_tok].reshape(B, context_length, 1 + ctx_tokens)[:, :, 1:]
    dyn_part = full[:, n_ctx_tok:].reshape(B, future, 1 + dyn_tokens)[:, :, 1:]
    # clamp BOTH grids into their codebooks: a well-formed stream is always
    # in range, but an LM-sampled stream can carry any vocab id in any slot
    # (especially early in training), and jnp.take under jit fills
    # out-of-bounds reads with NaN — one stray id would silently poison the
    # whole decoded batch
    ctx_part = jnp.clip(ctx_part, 0, num_vq_embeddings - 1)
    dyn_part = jnp.clip(dyn_part - num_vq_embeddings, 0, num_dyn_embeddings - 1)
    return ctx_part, dyn_part


def sdf_positions(context_length: int, segment_length: int,
                  ctx_tokens: int = 256, dyn_tokens: int = 16) -> jnp.ndarray:
    """Positions of the sdf separators in the stream: the action-injection slots
    (reference action_model.py:175-177)."""
    start = prelude_len(context_length, ctx_tokens)
    return start + jnp.arange(segment_length - context_length) * (dyn_tokens + 1)
