"""Full-size 256x256 tokenizer smoke on the real TPU: one training forward
+ gradient step + tokenize/detokenize round trip with TOKENIZER_256
(310.5M params; reference scripts/pretrain/oxe-256-act-free.sh regime:
batch 2, ctx 2, remat on). Log the output in COMPONENTS.md.

Run: python tools/smoke_256.py
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


def main():
    from ivideogpt_tpu.configs import TOKENIZER_256
    from ivideogpt_tpu.models import CompressiveVQModel
    import optax

    cfg = TOKENIZER_256.replace(remat=True)
    tok = CompressiveVQModel(cfg, dtype=jnp.bfloat16)
    B, ctx, T = 2, 2, 8  # reference 256px regime: batch 2/GPU, seg 8
    F = T - ctx
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(0, 1, (B, T, 256, 256, 3)), jnp.float32)
    ctx_flat = px[:, :ctx].reshape(-1, 256, 256, 3)
    fut_flat = px[:, ctx:].reshape(-1, 256, 256, 3)

    t0 = time.time()
    params = jax.jit(tok.init, static_argnames="segment_len")(
        jax.random.key(0), ctx_flat, fut_flat, segment_len=F)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"init: {n_params/1e6:.1f}M params in {time.time()-t0:.1f}s")

    tx = optax.adam(1e-4)
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            dec, ref_dec, commit, dyn_commit = tok.apply(
                p, ctx_flat, fut_flat, segment_len=F)
            recon = jnp.mean(jnp.abs(dec - fut_flat.astype(dec.dtype)))
            ref_recon = jnp.mean(jnp.abs(ref_dec - ctx_flat.astype(dec.dtype)))
            return (recon + ref_recon + commit + dyn_commit).astype(jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    params2, opt_state, loss = train_step(params, opt_state)
    loss = float(loss)
    compile_s = time.time() - t0
    t0 = time.time()
    _, _, loss2 = train_step(params2, opt_state)
    loss2 = float(loss2)
    step_s = time.time() - t0
    print(f"train step: loss {loss:.4f} -> {loss2:.4f}; compile {compile_s:.1f}s, "
          f"steady {step_s*1e3:.0f}ms (B={B}, seg={T})")

    tokenize = jax.jit(lambda p, x: tok.apply(p, x, ctx, method=tok.tokenize))
    detok = jax.jit(lambda p, i: tok.apply(p, i, ctx, method=tok.detokenize))
    t0 = time.time()
    ids, _ = tokenize(params, px)
    frames = detok(params, ids)
    finite = bool(jnp.isfinite(frames).all())
    print(f"round trip: ids {ids.shape} frames {frames.shape} finite={finite} "
          f"({time.time()-t0:.1f}s incl. compile)")
    assert finite and np.isfinite(loss) and np.isfinite(loss2)

    # --- 256px autoregressive generation (the ivideogpt-oxe-256-act-free
    # geometry: same token stream as 64px — 256 ctx + 16 dyn tokens/frame,
    # cross-attention active up to max_att_resolution 32 — through the
    # real generation.generate + detokenize path) -------------------------
    from ivideogpt_tpu.configs import ActionModelConfig, LLAMA_BASE
    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    from ivideogpt_tpu import generation, tokens

    lm = HeadModelWithAction(
        LLAMA_BASE,
        ActionModelConfig(action_dim=4, context_length=ctx,
                          segment_length=T,
                          tokens_per_context=cfg.ctx_tokens_per_frame,
                          tokens_per_dyna=cfg.dyn_tokens_per_frame),
        dtype=jnp.bfloat16)
    L = tokens.seq_len(ctx, T, ctx_tokens=cfg.ctx_tokens_per_frame,
                       dyn_tokens=cfg.dyn_tokens_per_frame)
    lm_params = jax.jit(lm.init)(jax.random.key(1),
                                 jnp.zeros((1, L), jnp.int32), None, None)
    P1 = tokens.prelude_len(ctx, cfg.ctx_tokens_per_frame) + 1
    t0 = time.time()
    res = generation.generate(
        lm, lm_params, ids[:, :P1], jax.random.key(2), segment_length=T,
        context_length=ctx, tokens_per_dyna=cfg.dyn_tokens_per_frame,
        cache_dtype=jnp.int8)
    gen_frames = detok(params, res.tokens)
    gen_finite = bool(jnp.isfinite(gen_frames).all())
    dt = time.time() - t0
    print(f"256px generate: stream {res.tokens.shape} -> frames "
          f"{gen_frames.shape} finite={gen_finite} "
          f"({dt:.1f}s incl. compile)")
    assert gen_finite
    assert gen_frames.shape == (B, T, 256, 256, 3)
    print("OK")


if __name__ == "__main__":
    main()
