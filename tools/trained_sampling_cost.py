"""Does a TRAINED model change rollout cost vs the random-init bench?

bench.py measures random-init weights on random pixels (self-flagged).
The only distribution-dependent cost in the rollout is exact top-k
sampling (generation.py's bit-search: per-step iterations depend on the
logit distribution) — a trained model's PEAKED logits could in principle
shift it. This tool measures the full generate+detokenize rollout twice
with the SAME architecture — once with the convergence study's trained
checkpoint (tools/convergence_study.py), once with random init — at the
study geometry (identical token counts per frame to the 64px base
models: 256 ctx + 16 dyn tokens/frame, L=751 at seg 16), and reports the
steady-state delta.

Run AFTER tools/convergence_study.py:
  python tools/trained_sampling_cost.py --study /tmp/convergence_r5
"""

import argparse
import json
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
    from tools.convergence_study import LLM_CONFIG, TOK_CONFIG
    from ivideogpt_tpu.configs import (ActionModelConfig, CompressiveVQConfig,
                                       TransformerConfig)
    from ivideogpt_tpu.models import CompressiveVQModel, HeadModelWithAction
    from ivideogpt_tpu.utils import checkpoint as ckpt_lib
    from ivideogpt_tpu import generation, tokens

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--study", default="/tmp/convergence_r5")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--segment_length", type=int, default=16)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--top_k", type=int, default=100)
    args = ap.parse_args()

    ctx, T, B = 2, args.segment_length, args.batch
    tok_cfg = CompressiveVQConfig(**{**TOK_CONFIG, "block_out_channels":
                                     tuple(TOK_CONFIG["block_out_channels"])})
    lm_cfg = TransformerConfig(**LLM_CONFIG)
    head_cfg = ActionModelConfig(
        action_dim=4, context_length=ctx, segment_length=T,
        tokens_per_context=tok_cfg.ctx_tokens_per_frame,
        tokens_per_dyna=tok_cfg.dyn_tokens_per_frame)
    tokenizer = CompressiveVQModel(tok_cfg, dtype=jnp.bfloat16)
    model = HeadModelWithAction(lm_cfg, head_cfg, dtype=jnp.bfloat16)

    # trained weights from the study; random init with the same shapes
    tok_trained = ckpt_lib.load_tokenizer_safetensors(
        os.path.join(args.study, "tok", "tokenizer"))
    lm_trained = ckpt_lib.load_action_model_safetensors(
        os.path.join(args.study, "gpt", "transformer"))
    L = tokens.seq_len(ctx, T, ctx_tokens=tok_cfg.ctx_tokens_per_frame,
                       dyn_tokens=tok_cfg.dyn_tokens_per_frame)

    def _lm_init(k):
        return generation.cast_matmul_params(model.init(
            k, jnp.zeros((1, L), jnp.int32), None,
            jnp.zeros((1, T, 4), jnp.float32)))

    lm_random = jax.jit(_lm_init)(jax.random.key(1))
    tok_random = jax.jit(lambda k: generation.cast_conv_params(tokenizer.init(
        k, jnp.zeros((ctx, 64, 64, 3), jnp.float32),
        jnp.zeros((T - ctx, 64, 64, 3), jnp.float32),
        segment_len=T - ctx)))(jax.random.key(0))
    cast = generation.cast_matmul_params
    lm_trained = jax.jit(cast)(lm_trained)
    tok_trained = jax.jit(generation.cast_conv_params)(tok_trained)

    # REAL context frames (the study's held-out scenes), tiled to B
    from tools.make_sample_fixture import make_trajectory
    eps = [make_trajectory(seed=9100 + i, T=T) for i in range(4)]
    px = np.stack([e["image"] for e in eps]).astype(np.float32) / 255.0
    px_ctx = jnp.asarray(np.tile(px[:, :ctx], (B // 4, 1, 1, 1, 1)))
    action = jnp.asarray(
        np.tile(np.stack([e["action"] for e in eps]), (B // 4, 1, 1)))

    prelude_fn = jax.jit(lambda p, x: tokens.make_prelude(
        tokenizer.apply(p, x, method=tokenizer.encode_context),
        tok_cfg.num_vq_embeddings, tok_cfg.num_dyn_embeddings))
    detok = jax.jit(lambda p, i: tokenizer.apply(
        p, i, ctx, method=tokenizer.detokenize))

    def rollout(tok_p, lm_p, key):
        prelude = prelude_fn(tok_p, px_ctx)
        res = generation.generate(
            model, lm_p, prelude, key, segment_length=T, context_length=ctx,
            action=action, tokens_per_dyna=tok_cfg.dyn_tokens_per_frame,
            top_k=args.top_k, cache_dtype=jnp.int8, read_len_buckets=4)
        return detok(tok_p, res.tokens)

    out = {}
    for name, (tp, lp) in [("random_init", (tok_random, lm_random)),
                           ("trained", (tok_trained, lm_trained))]:
        t0 = time.time()
        f = rollout(tp, lp, jax.random.key(7))
        float(jnp.mean(f))
        comp = time.time() - t0
        dts = []
        for i in range(args.iters):
            t0 = time.time()
            f = rollout(tp, lp, jax.random.key(10 + i))
            float(jnp.mean(f))
            dts.append(time.time() - t0)
        out[name] = {"s_per_rollout_min": round(min(dts), 4),
                     "s_per_rollout_median": round(sorted(dts)[len(dts)//2], 4),
                     "first_call_s": round(comp, 1)}
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    delta = (out["trained"]["s_per_rollout_min"]
             / out["random_init"]["s_per_rollout_min"] - 1.0)
    out["trained_vs_random_delta_pct"] = round(100 * delta, 2)
    out["batch"] = B
    out["top_k"] = args.top_k
    print(json.dumps(out))


if __name__ == "__main__":
    main()
