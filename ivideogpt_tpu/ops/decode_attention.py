"""Fused single-query decode attention over an int8-quantized KV cache.

This is the rollout hot op: every generated token re-reads the whole KV
cache once per layer (reference equivalent: HF generate's cached attention,
transformer/action_model.py:86-110 / mbrl/video_predictor.py:298-308). At
batch 256 the cache reads dominate the step, so the kernel's job is to make
every HBM byte count:

- K/V stay int8 end to end; scales fold into the scores / weights inside
  the kernel (never a dequantized cache in HBM or VMEM)
- flash-style running max/denominator over M tiles -> softmax fused, no
  [B*H, M] probability tensor in HBM
- masked-tail skip: tiles beyond the valid prefix are neither fetched nor
  computed (the BlockSpec index_map clamps dead tiles to the last live one,
  so Mosaic re-uses the already-resident block and `pl.when` skips the
  compute). Early in the rollout only ~2/3 of the cache is live; the XLA
  einsum path reads and masks all of it every step.

Cache layout (kernel-native): K/V [B*H, hd, M] int8 (lanes = M tiles,
sublanes = hd), scales [B*H, M] bfloat16, queries/outputs [B*H, hd].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def pick_tiles(G: int, M: int):
    """Largest (tg, tm) tile sizes that divide (G, M)."""
    tg = next((t for t in (384, 192, 96, 48, 24, 16, 12, 8, 4, 2, 1)
               if G % t == 0))
    tm = next((t for t in (256, 128) if M % t == 0), None)
    if tm is None:
        raise ValueError(f"cache length {M} must be a multiple of 128")
    return tg, tm


def _decode_attn_kernel(valid_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                        o_ref, acc_ref, m_ref, d_ref, *, tm: int,
                        scale: float):
    """Grid (G_tiles, M_tiles); one (TG, hd, TM) KV tile per step.

    valid_ref: scalar-prefetch (1,) int32 — number of live cache slots
    (uniform across the batch: one rollout step for everyone).
    acc/m/d: VMEM scratch carrying flash state across the M tiles.
    """
    mt = pl.program_id(1)
    num_mt = pl.num_programs(1)
    valid = valid_ref[0]
    n_live_tiles = pl.cdiv(valid, tm)

    @pl.when(mt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        d_ref[:] = jnp.zeros_like(d_ref)

    @pl.when(mt < n_live_tiles)
    def _():
        q = q_ref[:].astype(jnp.float32)               # (TG, hd)
        k = k_ref[:].astype(jnp.float32)               # (TG, hd, TM)
        ks = ks_ref[:].astype(jnp.float32)             # (TG, TM)
        s = jnp.sum(q[:, :, None] * k, axis=1) * ks * scale  # (TG, TM)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + mt * tm
        s = jnp.where(col < valid, s, NEG_INF)

        m_prev = m_ref[:][:, :1]                       # (TG, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)                # (TG, 1)
        p = jnp.exp(s - m_new)                         # (TG, TM)

        v = v_ref[:].astype(jnp.float32)               # (TG, hd, TM)
        vs = vs_ref[:].astype(jnp.float32)             # (TG, TM)
        pv = p * vs
        acc_ref[:] = acc_ref[:] * alpha \
            + jnp.sum(pv[:, None, :] * v, axis=2)      # (TG, hd)
        d_new = d_ref[:][:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        d_ref[:] = jnp.broadcast_to(d_new, d_ref.shape)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(mt == num_mt - 1)
    def _():
        d = jnp.maximum(d_ref[:][:, :1], 1e-30)
        o_ref[:] = (acc_ref[:] / d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tg", "tm", "interpret"))
def decode_attention(q, k_cache, ks, v_cache, vs, valid, *, tg: int = 96,
                     tm: int = 256, interpret: bool = False):
    """Single-token attention read. Shapes (G = B*H):

      q [G, hd] (rope applied), k_cache/v_cache [G, hd, M] int8,
      ks/vs [G, M] bf16 scales, valid scalar int32 (live slots).
    Returns out [G, hd] in q's dtype.
    """
    G, hd = q.shape
    M = k_cache.shape[-1]
    assert M % tm == 0, (M, tm)
    assert G % tg == 0, (G, tg)
    scale = hd ** -0.5
    valid_arr = jnp.asarray(valid, jnp.int32).reshape((1,))

    grid = (G // tg, M // tm)

    def kv_map(i, mt, valid_ref):
        live = jnp.maximum(pl.cdiv(valid_ref[0], tm) - 1, 0)
        return (i, 0, jnp.minimum(mt, live))

    def sc_map(i, mt, valid_ref):
        live = jnp.maximum(pl.cdiv(valid_ref[0], tm) - 1, 0)
        return (i, jnp.minimum(mt, live))

    kernel = functools.partial(_decode_attn_kernel, tm=tm, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tg, hd), lambda i, mt, v: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tg, hd, tm), kv_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((tg, tm), sc_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((tg, hd, tm), kv_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((tg, tm), sc_map, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tg, hd), lambda i, mt, v: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((tg, hd), jnp.float32),
                pltpu.VMEM((tg, 128), jnp.float32),
                pltpu.VMEM((tg, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((G, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * G * hd * M,
            bytes_accessed=2 * G * hd * M + 4 * G * M,
            transcendentals=G * M,
        ),
        interpret=interpret,
    )(valid_arr, q, k_cache, ks, v_cache, vs)
    return out


def decode_attention_xla(q, k_cache, ks, v_cache, vs, valid):
    """Reference XLA path, same [G, hd, M] layout (parity oracle).

    Written as explicit broadcast-multiply-reduce (not dot_general): a
    batched GEMV dot forces XLA to materialize the dequantized fp32 cache
    (~600MB/layer at B=256) instead of fusing the int8 convert into the
    read.
    """
    qf = q.astype(jnp.float32)
    s = jnp.sum(qf[:, :, None] * k_cache.astype(jnp.float32), axis=1)
    s = s * ks.astype(jnp.float32) * (q.shape[-1] ** -0.5)
    mask = jnp.arange(k_cache.shape[-1])[None, :] < valid
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    pv = (p * vs.astype(jnp.float32))[:, None, :]
    out = jnp.sum(pv * v_cache.astype(jnp.float32), axis=2)
    return out.astype(q.dtype)
