"""Medium (436M) transformer smoke on the real TPU: one training step
(tokenized-stream CE + grad + AdamW update) and a short KV-cached
generation, at the reference's medium regime (configs/llama/config_medium.json,
reference README.md:36 "oxe-64-act-free-medium").

Log the output in COMPONENTS.md. Run: python tools/smoke_medium.py
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
    from ivideogpt_tpu.configs import ActionModelConfig, LLAMA_MEDIUM
    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    from ivideogpt_tpu.train.gpt_trainer import make_train_step
    from ivideogpt_tpu.train.optim import TrainState, make_optimizer
    from ivideogpt_tpu import generation, tokens

    ctx, T = 2, 16
    B = int(os.environ.get("SMOKE_BATCH", "8"))
    head = ActionModelConfig(action_dim=4, context_length=ctx,
                             segment_length=T)
    # remat: the reference medium regime trains with attention dropout 0.1
    # (scripts/pretrain/oxe-64-act-free-medium.sh), whose backward keeps
    # the per-layer [B,H,S,S] scores without checkpointing
    lm_cfg = LLAMA_MEDIUM.replace(remat=True, attention_dropout=0.1)
    model = HeadModelWithAction(lm_cfg, head, dtype=jnp.bfloat16)
    L = tokens.seq_len(ctx, T)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 16384, (B, L)), jnp.int32)
    act = jnp.asarray(rng.normal(size=(B, T, 4)), jnp.float32)

    t0 = time.time()
    params = jax.jit(model.init)(jax.random.key(0), ids[:1], ids[:1],
                                 act[:1])
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"medium params: {n/1e6:.1f}M (published: 436M) "
          f"init {time.time()-t0:.1f}s", flush=True)

    tx, _ = make_optimizer(params, learning_rate=1e-4, warmup_steps=10,
                           total_steps=100, weight_decay=0.01)
    state = TrainState.create(params, tx)
    step_fn = make_train_step(model, action_conditioned=True)
    batch = {"input_ids": ids, "labels": ids, "action": act}

    t0 = time.time()
    state, metrics = step_fn(state, batch, jax.random.key(1))
    loss = float(metrics["loss"])
    print(f"train step (B={B}, L={L}): compile+run {time.time()-t0:.1f}s "
          f"loss={loss:.4f}", flush=True)
    t0 = time.time()
    iters = 3
    for i in range(iters):
        state, metrics = step_fn(state, batch, jax.random.key(2 + i))
    loss = float(metrics["loss"])
    dt = (time.time() - t0) / iters
    print(f"train step steady: {dt*1e3:.0f} ms -> "
          f"{B*L/dt:.0f} tokens/s/chip, loss={loss:.4f}", flush=True)

    # short rollout with the int8 cache
    P1 = tokens.prelude_len(ctx) + 1
    t0 = time.time()
    res = generation.generate(model, state.params, ids[:, :P1],
                              jax.random.key(9), segment_length=T,
                              context_length=ctx, action=act,
                              cache_dtype=jnp.int8)
    assert res.tokens.shape == (B, L), res.tokens.shape
    print(f"generate (B={B}): compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    res = generation.generate(model, state.params, ids[:, :P1],
                              jax.random.key(10), segment_length=T,
                              context_length=ctx, action=act,
                              cache_dtype=jnp.int8)
    ok = bool(jnp.all((res.tokens >= 0) & (res.tokens < 16386)))
    print(f"generate steady: {time.time()-t0:.2f}s tokens-valid={ok}",
          flush=True)


if __name__ == "__main__":
    main()
