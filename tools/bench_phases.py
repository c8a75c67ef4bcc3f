"""Phase-level timing probe for the headline rollout: tokenize / generate /
detokenize measured separately on the real TPU, plus per-step decode cost.

Not the official bench (bench.py is); this is the builder's profiling tool.
Run: python tools/bench_phases.py [BENCH_BATCH=256] [BENCH_KV=int8|bf16]
                                  [BENCH_CTX=2] [BENCH_DETOK_CHUNK=128]

Mirrors bench.py's shipped path: context-only prelude (encode_context ->
make_prelude), pre-cast bf16 params, chunked detokenize.
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


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32) if hasattr(x, "astype") else x))


def timeit(fn, *args, iters=3):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        sync(jax.tree.leaves(out)[0])
    return (time.time() - t0) / iters, out


def main():
    from ivideogpt_tpu.configs import ActionModelConfig, LLAMA_BASE, TOKENIZER_64
    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
    from ivideogpt_tpu import generation, tokens

    B = int(os.environ.get("BENCH_BATCH", "256"))
    ctx = int(os.environ.get("BENCH_CTX", "2"))
    T = 16
    F = T - ctx

    tokenizer = CompressiveVQModel(
        TOKENIZER_64.replace(context_length=ctx), dtype=jnp.bfloat16)
    head = ActionModelConfig(action_dim=4, context_length=ctx, segment_length=T)
    lm = HeadModelWithAction(LLAMA_BASE, head, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(0, 1, (B, T, 64, 64, 3)), jnp.float32)
    action = jnp.asarray(rng.normal(size=(B, T, 4)), jnp.float32)

    tok_params = tokenizer.init(
        jax.random.key(0), px[:1, :ctx].reshape(-1, 64, 64, 3),
        px[:1, ctx:].reshape(-1, 64, 64, 3), segment_len=F)
    tok_params = generation.cast_conv_params(tok_params)
    L = tokens.seq_len(ctx, T)
    lm_params = lm.init(jax.random.key(1), jnp.zeros((1, L), jnp.int32),
                        None, action[:1])
    lm_params = generation.cast_matmul_params(lm_params)

    tok_cfg = tokenizer.config
    prelude_fn = jax.jit(lambda p, x: tokens.make_prelude(
        tokenizer.apply(p, x, method=tokenizer.encode_context),
        tok_cfg.num_vq_embeddings, tok_cfg.num_dyn_embeddings))
    detokenize_one = jax.jit(lambda p, i: tokenizer.apply(
        p, i, ctx, method=tokenizer.detokenize))
    chunk = int(os.environ.get("BENCH_DETOK_CHUNK", "128"))

    def detokenize(p, ids):
        if B <= chunk:
            return detokenize_one(p, ids)
        return jnp.concatenate([detokenize_one(p, ids[i:i + chunk])
                                for i in range(0, B, chunk)], axis=0)

    P1 = tokens.prelude_len(ctx) + 1
    kv = os.environ.get("BENCH_KV", "int8")
    cache_dtype = {"int8": jnp.int8, "mixed": "mixed"}.get(kv, jnp.bfloat16)

    t_tok, prelude = timeit(lambda: prelude_fn(tok_params, px[:, :ctx]))
    print(f"prelude:     {t_tok*1e3:8.1f} ms  (P1={prelude.shape[1]})")

    def gen(key):
        return generation.generate(
            lm, lm_params, prelude, key, segment_length=T,
            context_length=ctx, action=action, cache_dtype=cache_dtype).tokens

    t_gen, toks = timeit(lambda: gen(jax.random.key(0)))
    steps = (tokens.seq_len(ctx, T) + 1) - P1
    print(f"generate:    {t_gen*1e3:8.1f} ms  ({steps} steps, "
          f"{t_gen/steps*1e6:.0f} us/step)  kv={kv}")

    t_det, _ = timeit(lambda: detokenize(tok_params, toks))
    print(f"detokenize:  {t_det*1e3:8.1f} ms")

    total = t_tok + t_gen + t_det
    print(f"total:       {total*1e3:8.1f} ms -> {B*F/total:.1f} frames/s")


if __name__ == "__main__":
    main()
