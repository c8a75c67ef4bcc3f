"""VP2 planner-interface latency at CEM scale on the real TPU.

Drives ivideogpt_tpu/vp/interface.py the way the VP2 harness's CEM/MPPI
planner does (reference vp/ivideogpt_interface.py:155-203: candidate
populations of ~200 sharing one context, chunked at
generate_max_batchsize=100 / decode_max_batchsize=67): one __call__ per
planning query, B=200 candidates, 2 context frames, 11 predicted frames.
Reports per-query latency (compile excluded after the first call) and
candidate-frames/s.

Run on TPU: python tools/bench_vp2_plan.py   [VP2_POP=200 VP2_CHUNK=100]
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
    from ivideogpt_tpu.configs import (ActionModelConfig, LLAMA_BASE,
                                       TOKENIZER_64)
    from ivideogpt_tpu.models import CompressiveVQModel, HeadModelWithAction
    from ivideogpt_tpu.vp.interface import IVideoGPTPredictor

    pop = int(os.environ.get("VP2_POP", "200"))
    chunk = int(os.environ.get("VP2_CHUNK", "100"))
    ctx, seg, act_dim = 2, 12, 5   # the fixed VP2 contract

    tokenizer = CompressiveVQModel(TOKENIZER_64, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(0, 1, (1, seg, 64, 64, 3)), jnp.float32)
    tok_params = jax.jit(tokenizer.init, static_argnames="segment_len")(
        jax.random.key(1), px[:, :ctx].reshape(-1, 64, 64, 3),
        px[:, ctx:].reshape(-1, 64, 64, 3), segment_len=seg - ctx)

    head = ActionModelConfig(action_dim=act_dim, context_length=ctx,
                             segment_length=seg)
    model = HeadModelWithAction(LLAMA_BASE, head, dtype=jnp.bfloat16)
    from ivideogpt_tpu import tokens
    L = tokens.seq_len(ctx, seg)
    ids = jnp.zeros((1, L), jnp.int32)
    lm_params = jax.jit(model.init)(
        jax.random.key(2), ids, None, jnp.zeros((1, seg, act_dim)))

    pred = IVideoGPTPredictor(tokenizer, tok_params, model, lm_params,
                              context_length=ctx, segment_length=seg,
                              max_batch=chunk, top_k=100, seed=0)

    # one shared context across the whole candidate population — the CEM
    # regime the interface's shared-context fast path targets
    context = np.repeat(rng.uniform(0, 1, (1, ctx, 64, 64, 3)), pop, 0)
    actions = rng.uniform(-1, 1, (pop, seg - 1, act_dim)).astype(np.float32)
    batch = {"video": context.astype(np.float32), "actions": actions}

    t0 = time.time()
    out = pred(batch)
    print(f"planning query 1 (compile): {time.time()-t0:.1f}s "
          f"rgb={out['rgb'].shape}", flush=True)
    assert out["rgb"].shape == (pop, seg - 1, 64, 64, 3)
    assert np.isfinite(out["rgb"]).all()

    lat = []
    for q in range(3):
        batch["actions"] = rng.uniform(
            -1, 1, (pop, seg - 1, act_dim)).astype(np.float32)
        t0 = time.time()
        pred(batch)
        lat.append(time.time() - t0)
        print(f"planning query {q+2}: {lat[-1]*1e3:.0f} ms", flush=True)
    best = min(lat)
    print(f"steady planning query: {best*1e3:.0f} ms "
          f"(pop={pop}, chunk={chunk}) -> "
          f"{pop*(seg-ctx)/best:.0f} candidate-frames/s/chip", flush=True)


if __name__ == "__main__":
    main()
