"""Microbench: Pallas fused decode attention vs XLA einsum (same layout),
B=256 x H=12, hd=64, M=768 (the bench rollout geometry, padded to 256).

Run: python tools/bench_decode_attn.py
"""

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ivg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from ivideogpt_tpu.ops.decode_attention import (decode_attention,
                                                    decode_attention_xla)
    B, H, hd, M = 256, 12, 64, 768
    G = B * H
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(G, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.integers(-127, 128, (G, hd, M)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, (G, hd, M)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (G, M)), jnp.bfloat16)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (G, M)), jnp.bfloat16)

    def bench(fn, *args, iters=20, **kw):
        out = fn(*args, **kw)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args, **kw)
        float(jnp.sum(out.astype(jnp.float32)))
        return (time.time() - t0) / iters

    xla = jax.jit(decode_attention_xla)
    for valid in (752, 514):
        t = bench(xla, q, k, ks, v, vs, valid)
        print(f"xla einsum      valid={valid}: {t*1e3:8.3f} ms", flush=True)
    for tg, tm in itertools.product((96, 192, 384), (128, 256)):
        for valid in (752, 514):
            try:
                t = bench(decode_attention, q, k, ks, v, vs, valid,
                          tg=tg, tm=tm)
                print(f"pallas tg={tg:3d} tm={tm:3d} valid={valid}: "
                      f"{t*1e3:8.3f} ms", flush=True)
            except Exception as e:
                print(f"pallas tg={tg} tm={tm}: FAILED {type(e).__name__} "
                      f"{str(e)[:200]}", flush=True)
                break


if __name__ == "__main__":
    main()
