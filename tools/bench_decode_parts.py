"""Decompose the per-token decode step cost on the real TPU:
attention+MLP (forward_cached) vs unembed vs top-k sampling.

Run: python tools/bench_decode_parts.py
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


def bench_scan(name, fn, carry, steps, params, iters=3):
    # params threaded as an ARG: a closure would bake 553MB of weights into
    # the HLO as constants (the compile tunnel rejects >100MB programs)
    scan = jax.jit(lambda p, c: jax.lax.scan(
        lambda cc, s: fn(p, cc, s), c, jnp.arange(steps)))
    out = scan(params, carry)
    float(jnp.sum(jax.tree.leaves(out[0])[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = scan(params, carry)
        float(jnp.sum(jax.tree.leaves(out[0])[0].astype(jnp.float32)))
    dt = (time.time() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.1f} ms total, {dt/steps*1e6:7.0f} us/step",
          flush=True)
    return dt


def main():
    from ivideogpt_tpu.configs import ActionModelConfig, LLAMA_BASE
    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    from ivideogpt_tpu import generation, tokens

    B = int(os.environ.get("BENCH_BATCH", "256"))
    ctx, T = 2, 16
    head = ActionModelConfig(action_dim=4, context_length=ctx, segment_length=T)
    lm = HeadModelWithAction(LLAMA_BASE, head, dtype=jnp.bfloat16)
    L = tokens.seq_len(ctx, T)
    P1 = tokens.prelude_len(ctx) + 1
    steps = L + 1 - P1

    params = lm.init(jax.random.key(1), jnp.zeros((1, L), jnp.int32), None,
                     jnp.zeros((1, T, 4)))

    def m(p, method, *args):
        return lm.apply(p, *args, method=getattr(lm, method))

    kv = os.environ.get("BENCH_KV", "int8")
    layout = os.environ.get("BENCH_LAYOUT", "bshd")
    cache_dtype = {"int8": jnp.int8, "mixed": "mixed"}.get(kv, jnp.bfloat16)
    cache = jax.jit(lambda p: m(p, "init_cache", B, L + 1, cache_dtype,
                                layout))(params)
    emb = jnp.zeros((B, 1, 768), jnp.bfloat16)
    hidden0 = jnp.zeros((B, 768), jnp.bfloat16)
    logits0 = jnp.zeros((B, 16386), jnp.float32)

    # 1. transformer body only
    def step_body(p, carry, s):
        c, h = carry
        hidden, c = m(p, "decode_cached", emb, c, P1 + s)
        return (c, hidden[:, 0, :]), ()

    bench_scan(f"forward_cached (kv={kv})", step_body, (cache, hidden0),
               steps, params)

    # 2. + unembed
    def step_unembed(p, carry, s):
        h, acc = carry
        logits = m(p, "unembed", h)
        return (h, acc + jnp.mean(logits)), ()

    bench_scan("unembed only", step_unembed, (hidden0, jnp.zeros(())), steps,
               params)

    # 3. top-k sampling only
    def step_topk(p, carry, s):
        lg, rng = carry
        rng, sub = jax.random.split(rng)
        tok = generation.sample_top_k(sub, lg, 100, 1.0)
        return (lg + tok[:, None] * 0.0, rng), ()

    bench_scan("top_k(100) sample only", step_topk,
               (logits0, jax.random.key(0)), steps, {})

    # 3b. the SHIPPED sampler: bf16 16-pass search (generate() passes
    # bf16_exact=True whenever the model computes in bf16 — the default)
    def step_topk_bf16(p, carry, s):
        lg, rng = carry
        rng, sub = jax.random.split(rng)
        tok = generation.sample_top_k(sub, lg, 100, 1.0, bf16_exact=True)
        return (lg + tok[:, None] * 0.0, rng), ()

    bench_scan("top_k(100) bf16-search (shipped)", step_topk_bf16,
               (logits0, jax.random.key(0)), steps, {})

    # 4. approx top-k
    def step_approx(p, carry, s):
        lg, rng = carry
        rng, sub = jax.random.split(rng)
        tok = generation.sample_top_k(sub, lg, 100, 1.0, approx=True)
        return (lg + tok[:, None] * 0.0, rng), ()

    bench_scan("approx_top_k sample only", step_approx,
               (logits0, jax.random.key(0)), steps, {})

    # 5. embed
    def step_embed(p, carry, s):
        tok, acc = carry
        e = m(p, "embed_tokens", tok)
        return (tok, acc + jnp.mean(e.astype(jnp.float32))), ()

    bench_scan("embed only", step_embed,
               (jnp.zeros((B, 1), jnp.int32), jnp.zeros(())), steps, params)


if __name__ == "__main__":
    main()
