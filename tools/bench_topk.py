"""Sweep exact/approx top-k sampling variants in-scan on the real TPU.

The decode loop pays this every token; lax.top_k over the 16386 vocab is
~1.4ms at B=256. Run: python tools/bench_topk.py
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

B = int(os.environ.get("BENCH_BATCH", "256"))
V = 16386
K = 100
STEPS = 64


def bench(name, fn, logits, impl=None):
    def body(carry, s):
        lg, rng = carry
        rng, sub = jax.random.split(rng)
        tok = fn(sub, lg)
        return (lg + tok[:, None].astype(lg.dtype) * 0.0, rng), ()

    key = jax.random.key(0, impl=impl) if impl else jax.random.key(0)
    scan = jax.jit(lambda lg: jax.lax.scan(
        body, (lg, key), jnp.arange(STEPS)))
    out = scan(logits)
    float(jnp.sum(out[0][0]))
    t0 = time.time()
    for _ in range(3):
        out = scan(logits)
        float(jnp.sum(out[0][0]))
    dt = (time.time() - t0) / 3 / STEPS
    print(f"{name:44s} {dt*1e6:8.0f} us/step", flush=True)
    return dt


def main():
    from ivideogpt_tpu import generation

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(B, V)) * 3, jnp.float32)

    def exact_global(sub, lg):
        v, i = jax.lax.top_k(lg, K)
        c = jax.random.categorical(sub, v, axis=-1)
        return jnp.take_along_axis(i, c[:, None], axis=-1)[:, 0]

    def two_stage(group):
        def fn(sub, lg):
            v, i = generation.exact_top_k_two_stage(lg, K, group=group)
            c = jax.random.categorical(sub, v, axis=-1)
            return jnp.take_along_axis(i, c[:, None], axis=-1)[:, 0]
        return fn

    def exact_bf16_select(sub, lg):
        # select indices on bf16 keys (tie ordering may differ at the k
        # boundary), then sample over exact fp32 values at those indices
        v, i = jax.lax.top_k(lg.astype(jnp.bfloat16), K)
        vals = jnp.take_along_axis(lg, i, axis=-1)
        c = jax.random.categorical(sub, vals, axis=-1)
        return jnp.take_along_axis(i, c[:, None], axis=-1)[:, 0]

    def approx(recall):
        def fn(sub, lg):
            v, i = jax.lax.approx_max_k(lg, K, recall_target=recall)
            c = jax.random.categorical(sub, v, axis=-1)
            return jnp.take_along_axis(i, c[:, None], axis=-1)[:, 0]
        return fn

    def sort_based(sub, lg):
        # full descending sort, slice K — baseline sanity
        v = -jnp.sort(-lg, axis=-1)[:, :K]
        t = v[:, K - 1:K]
        masked = jnp.where(lg >= t, lg, -jnp.inf)
        return jax.random.categorical(sub, masked, axis=-1)

    def threshold_search(sub, lg):
        return generation.sample_top_k(sub, lg, K, 1.0,
                                       threshold_search=True)

    def threshold_search_bf16(sub, lg):
        # the SHIPPED path: generate() passes bf16_exact=True for bf16
        # models (16-pass uint16 search instead of 32-pass uint32)
        return generation.sample_top_k(sub, lg, K, 1.0,
                                       threshold_search=True,
                                       bf16_exact=True)

    def search_only(sub, lg):
        keys, kth = generation.exact_kth_largest_key(lg, K)
        return kth.astype(jnp.int32)

    def search_only_bf16(sub, lg):
        keys, kth = generation.exact_kth_largest_key_bf16(lg, K)
        return kth.astype(jnp.int32)

    def categorical_only(sub, lg):
        return jax.random.categorical(sub, lg, axis=-1)

    bench("bit-search threshold (exact)", threshold_search, logits)
    bench("bit-search threshold bf16 16-pass (shipped)",
          threshold_search_bf16, logits)
    bench("bit-search threshold (rbg keys)", threshold_search, logits,
          impl="rbg")
    bench("  - kth-key search only", search_only, logits)
    bench("  - kth-key search only (bf16 16-pass)", search_only_bf16,
          logits)
    bench("  - full-vocab categorical only", categorical_only, logits)
    bench("  - categorical only (rbg keys)", categorical_only, logits,
          impl="rbg")
    bench("lax.top_k (global exact)", exact_global, logits)
    for g in (512, 1024, 2048, 4096, 8192):
        bench(f"two-stage exact group={g}", two_stage(g), logits)
    bench("bf16-key select, fp32 sample", exact_bf16_select, logits)
    for r in (0.95, 0.99, 0.999):
        bench(f"approx_max_k recall={r}", approx(r), logits)
    bench("full sort + threshold mask", sort_based, logits)


if __name__ == "__main__":
    main()
