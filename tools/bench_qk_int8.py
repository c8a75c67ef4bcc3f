"""Can the decode step's q.K^T run as a native int8 x int8 MXU matmul?

The headroom analysis (COMPONENTS.md) found the int8-cache QK read is
VPU-CONVERT-bound, not DMA-bound: ~260us/layer vs the ~180us int8 DMA
floor — the s8->bf16 unpack is the limit. An int8 x int8 contraction with
int32 accumulation skips the unpack entirely (q quantized on the fly,
both scales folded into the fp32 scores afterwards).

Isolated A/B at the decode shape (one 12-layer-equivalent attention read
per step, B x H batched GEMV over M cached slots), measured inside one
jitted lax.scan per the tunnel measurement discipline.

Run: python tools/bench_qk_int8.py   (optional BENCH_BATCH, default 256)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ivg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_scan(name, fn, operands, steps=64, iters=3):
    scan = jax.jit(lambda ops: jax.lax.scan(
        lambda c, s: (fn(ops, c, s), None), jnp.zeros((), jnp.float32),
        jnp.arange(steps)))
    out = scan(operands)
    float(out[0])
    t0 = time.time()
    for _ in range(iters):
        float(scan(operands)[0])
    dt = (time.time() - t0) / iters
    print(f"{name:34s} {dt/steps*1e6:8.0f} us/step", flush=True)
    return dt / steps


def main():
    B = int(os.environ.get("BENCH_BATCH", "256"))
    H, M, D = 12, 751, 64     # LLAMA_BASE decode shape, full cache read
    LAYERS = 12
    # generate ON DEVICE: the int8 cache is ~1.8GB at B=256 — building it
    # host-side and shipping it over the tunnel would dominate the run
    @jax.jit
    def make_ops(key):
        k1, k2, k3 = jax.random.split(key, 3)
        k_i8 = jax.random.randint(
            k1, (LAYERS, B, M, H, D), -127, 128, jnp.int32).astype(jnp.int8)
        ks = jax.random.uniform(
            k2, (LAYERS, B, M, H), jnp.float32, 0.005, 0.02).astype(
            jnp.bfloat16)
        q = jax.random.normal(k3, (B, 1, H, D), jnp.float32).astype(
            jnp.bfloat16)
        return {"k": k_i8, "ks": ks, "q": q}

    ops = make_ops(jax.random.key(0))

    def qk_bf16(ops, acc, s):
        """Current path: s8->bf16 unpack + bf16 einsum, k-scale folded."""
        out = acc
        qv = ops["q"] + acc.astype(jnp.bfloat16)  # depend on carry
        for l in range(LAYERS):
            keys = ops["k"][l].astype(jnp.bfloat16)
            attn = jnp.einsum("bqhd,bkhd->bhqk", qv, keys).astype(jnp.float32)
            attn = attn * (D ** -0.5)
            attn = attn * ops["ks"][l].astype(jnp.float32).transpose(
                0, 2, 1)[:, :, None, :]
            out = out + jnp.sum(attn) * 1e-9
        return out

    def qk_int8(ops, acc, s):
        """Candidate: quantize q per (B,1,H), int8 x int8 -> int32."""
        out = acc
        qv = ops["q"] + acc.astype(jnp.bfloat16)
        qs = jnp.max(jnp.abs(qv.astype(jnp.float32)), axis=-1) / 127.0 + 1e-8
        q_i8 = jnp.round(qv.astype(jnp.float32) / qs[..., None]).astype(
            jnp.int8)
        for l in range(LAYERS):
            attn = jnp.einsum("bqhd,bkhd->bhqk", q_i8, ops["k"][l],
                              preferred_element_type=jnp.int32)
            attn = attn.astype(jnp.float32) * (D ** -0.5)
            attn = attn * qs.transpose(0, 2, 1)[:, :, :, None]
            attn = attn * ops["ks"][l].astype(jnp.float32).transpose(
                0, 2, 1)[:, :, None, :]
            out = out + jnp.sum(attn) * 1e-9
        return out

    print(f"B={B} H={H} M={M} D={D} x{LAYERS} layers")
    t_bf16 = bench_scan("qk s8->bf16 unpack (current)", qk_bf16, ops)
    t_int8 = bench_scan("qk int8 x int8 -> int32", qk_int8, ops)
    print(f"speedup: {t_bf16 / t_int8:.2f}x "
          f"({(t_bf16 - t_int8) * 1e6:+.0f} us/step over {LAYERS} layers)")


if __name__ == "__main__":
    main()
