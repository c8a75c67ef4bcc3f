"""int8-KV-cache quality study (round-2 verdict item #5).

The headline bench uses the int8 KV cache; the target is ">=5x at FVD
parity", so the cache quantization's effect on the sampling distribution
must be bounded. Published weights are unavailable in this environment, so
the study runs on a random-init base-size model (documented caveat: trained
logit distributions are sharper, which makes top-k sets MORE stable, so the
random-init numbers are conservative for set-overlap metrics).

Two measurements on the BAIR-shape rollout (ctx=2, T=16, 238 steps):

1. Teacher-forced divergence (isolates quantization): replay the SAME
   bf16-generated stream under bf16 and int8 caches (generation.replay_logits)
   and compare per-step logits: MAE, max |diff|, top-100 set overlap,
   argmax agreement.
2. Same-seed sampled-stream agreement: generate with identical keys under
   both cache dtypes; report the per-step token agreement curve (after the
   first divergent sample the streams decorrelate by construction — the
   informative number is how long prefixes survive).
3. Pixel-level (round-3 verdict item #5, closes the chain
   logits→tokens→frames): detokenize BOTH same-seed streams with one
   shared tokenizer and report per-frame PSNR/SSIM between the two
   renders, plus the fraction of frames whose tokens (hence pixels) are
   bit-identical. Early frames quantify the direct pixel cost of cache
   quantization; once streams decorrelate the rows measure sample
   diversity, not quality (flagged by the identical-fraction column).

Run on TPU:  python tools/kv_divergence_study.py        (B=16, ~5 min)
CPU smoke:   JAX_PLATFORMS=cpu STUDY_B=2 STUDY_T=6 python tools/...
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("IVG_JAX_CACHE", "/tmp/ivg_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from ivideogpt_tpu.configs import ActionModelConfig, LLAMA_BASE
    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    from ivideogpt_tpu import generation, tokens

    B = int(os.environ.get("STUDY_B", "16"))
    T = int(os.environ.get("STUDY_T", "16"))
    ctx = 2
    top_k = 100

    head = ActionModelConfig(action_dim=4, context_length=ctx,
                             segment_length=T)
    model = HeadModelWithAction(LLAMA_BASE, head, dtype=jnp.bfloat16)
    L = tokens.seq_len(ctx, T)
    rng = np.random.default_rng(0)
    action = jnp.asarray(rng.normal(size=(B, T, 4)), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.key(1), jnp.zeros((1, L), jnp.int32), None, action[:1])

    P1 = tokens.prelude_len(ctx) + 1
    # prelude ids drawn from the CTX codebook range — what a real tokenized
    # context contains (full-vocab ids in ctx slots decode to clamped
    # codebook rows and are not representative LM input)
    from ivideogpt_tpu.configs import TOKENIZER_64
    prelude = jnp.asarray(
        rng.integers(0, TOKENIZER_64.num_vq_embeddings, (B, P1)), jnp.int32)
    prelude = prelude.at[:, P1 - 1].set(LLAMA_BASE.vocab_size - 1)

    key = jax.random.key(7)
    # STUDY_VARIANT=mixed compares the K-bf16/V-int8 cache instead of the
    # all-int8 one (same harness, same bf16 reference stream)
    variant = os.environ.get("STUDY_VARIANT", "int8")
    qdtype = "mixed" if variant == "mixed" else jnp.int8
    kw = dict(segment_length=T, context_length=ctx, action=action,
              top_k=top_k)
    res_b = generation.generate(model, params, prelude, key,
                                cache_dtype=jnp.bfloat16, **kw)
    res_i = generation.generate(model, params, prelude, key,
                                cache_dtype=qdtype, **kw)
    stream_b = np.asarray(res_b.tokens)
    stream_i = np.asarray(res_i.tokens)

    # --- same-seed sampled agreement curve -------------------------------
    # slice starts at P1 (the first SAMPLED token): stream[P1-1] is the
    # prelude's forced sdf, identical in both streams by construction —
    # including it would pin per_step_agree[0] at 1.0 and inflate the
    # prefix-survival stat by exactly one step
    gen_b, gen_i = stream_b[:, P1:], stream_i[:, P1:]
    # drop the FORCED per-frame sdf separators too (step s%(D+1)==D is
    # written as a constant, not sampled — identical in both streams by
    # construction, so counting it would inflate agreement): keep only the
    # genuinely sampled positions. D1 is derived from the token contract
    # (dyn tokens per frame + 1 sdf), same geometry generate() uses.
    per_frame = tokens.seq_len(ctx, T) - tokens.prelude_len(ctx)
    assert per_frame % (T - ctx) == 0
    D1 = per_frame // (T - ctx)  # dyn_tokens + 1 == 17 for the 4x4 grid
    sampled = (np.arange(gen_b.shape[1]) % D1) < (D1 - 1)
    gen_b, gen_i = gen_b[:, sampled], gen_i[:, sampled]
    agree = (gen_b == gen_i)
    per_step_agree = agree.mean(axis=0)
    # prefix survival: SAMPLED steps until first disagreement per sequence
    first_diff = np.where(~agree, np.arange(agree.shape[1])[None], 10**9)
    prefix_len = first_diff.min(axis=1)
    prefix_len = np.where(prefix_len == 10**9, agree.shape[1], prefix_len)

    # --- teacher-forced logit divergence on the SAME stream --------------
    lg_b = np.asarray(generation.replay_logits(
        model, params, res_b.tokens, segment_length=T, context_length=ctx,
        action=action, cache_dtype=jnp.bfloat16))
    lg_i = np.asarray(generation.replay_logits(
        model, params, res_b.tokens, segment_length=T, context_length=ctx,
        action=action, cache_dtype=qdtype))

    diff = np.abs(lg_b - lg_i)            # [S, B, V]
    mae = diff.mean(axis=(1, 2))
    mx = diff.max(axis=(1, 2))
    scale = np.abs(lg_b).mean()

    # top-100 set overlap + argmax agreement per step
    S = lg_b.shape[0]
    overlaps, argmax_agree = [], []
    for s in range(S):
        tb = np.argpartition(-lg_b[s], top_k, axis=-1)[:, :top_k]
        ti = np.argpartition(-lg_i[s], top_k, axis=-1)[:, :top_k]
        o = [len(set(tb[b]) & set(ti[b])) / top_k for b in range(B)]
        overlaps.append(float(np.mean(o)))
        argmax_agree.append(
            float((lg_b[s].argmax(-1) == lg_i[s].argmax(-1)).mean()))
    overlaps = np.asarray(overlaps)
    argmax_agree = np.asarray(argmax_agree)

    # --- pixel-level: detokenize both same-seed streams ------------------
    from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
    from ivideogpt_tpu.utils import video_metric

    tok_cfg = TOKENIZER_64.replace(context_length=ctx)
    tokenizer = CompressiveVQModel(tok_cfg, dtype=jnp.bfloat16)
    tok_params = jax.jit(tokenizer.init, static_argnames="segment_len")(
        jax.random.key(2), jnp.zeros((ctx, 64, 64, 3)),
        jnp.zeros((T - ctx, 64, 64, 3)), segment_len=T - ctx)
    detok = jax.jit(lambda p, i: tokenizer.apply(
        p, i, ctx, method=tokenizer.detokenize))
    fr_b = np.asarray(detok(tok_params, res_b.tokens), np.float32)
    fr_i = np.asarray(detok(tok_params, res_i.tokens), np.float32)
    F = T - ctx
    fut_b, fut_i = fr_b[:, ctx:], fr_i[:, ctx:]          # [B, F, H, W, 3]
    flat_b = jnp.asarray(fut_b.reshape(B * F, *fut_b.shape[2:]))
    flat_i = jnp.asarray(fut_i.reshape(B * F, *fut_i.shape[2:]))
    pp = np.asarray(video_metric.psnr(flat_b, flat_i)).reshape(B, F).mean(0)
    ps = np.asarray(video_metric.ssim(flat_b, flat_i)).reshape(B, F).mean(0)
    # fraction of frames with bit-identical token grids -> identical pixels
    # (from P1 the stream is blocks of [d0..d(D1-2), sdf] with NO sdf after
    # the final frame, so index the dyn slots instead of reshaping)
    pos = P1 + np.arange(F)[:, None] * D1 + np.arange(D1 - 1)[None]
    dyn_b, dyn_i = stream_b[:, pos], stream_i[:, pos]    # [B, F, D1-1]
    ident = (dyn_b == dyn_i).all(axis=-1).mean(axis=0)   # per frame

    out = {
        "model": "LLAMA_BASE random-init bf16",
        "variant": variant,
        "B": B, "T": T, "steps": int(S),
        "logit_scale_meanabs": round(float(scale), 4),
        "logit_mae_mean": round(float(mae.mean()), 5),
        "logit_mae_last_step": round(float(mae[-1]), 5),
        "logit_maxabs_diff": round(float(mx.max()), 4),
        "top100_overlap_mean": round(float(overlaps.mean()), 4),
        "top100_overlap_min": round(float(overlaps.min()), 4),
        "argmax_agreement_mean": round(float(argmax_agree.mean()), 4),
        "sameseed_token_agreement_mean": round(float(agree.mean()), 4),
        "sameseed_prefix_median_steps": int(np.median(prefix_len)),
        "pixel_psnr_per_frame": [round(float(x), 2) for x in pp],
        "pixel_ssim_per_frame": [round(float(x), 4) for x in ps],
        "pixel_frames_bitidentical_frac": [round(float(x), 3)
                                           for x in ident],
        "note": ("teacher-forced metrics isolate cache quantization; "
                 "same-seed agreement decorrelates after first diff "
                 "by construction"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
