"""Imagination-rollout throughput on the real TPU: the MBPO `generate()`
hot loop (reference mbrl/video_predictor.py:267-339 runs this on the host,
one HF generate + detokenize per imagined step).

MBPO regime: gen_batch 32, horizon 10, ctx 2 (reference mbrl/cfgs/
mbpo_config.yaml). Run: python tools/bench_mbrl_rollout.py

`--gen_rounds 1,2,4` sweeps the MBPOConfig.gen_rounds trade (N rounds
batched into one B = N*gen_batch device program). The round-3 default
(gen_rounds=1) was set from a TUNNELED attachment whose 6-20 MB/s D2H
made bigger fetches lose; run this sweep on your own attachment —
direct-attached chips likely prefer N>1.
"""

import argparse
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
    from ivideogpt_tpu.mbrl.video_predictor import VideoPredictor

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gen_batch", type=int,
                    default=int(os.environ.get("BENCH_GEN_BATCH", "32")))
    ap.add_argument("--horizon", type=int,
                    default=int(os.environ.get("BENCH_GEN_HORIZON", "10")))
    ap.add_argument("--gen_rounds", type=str, default="1",
                    help="comma list, e.g. 1,2,4: each N measures the "
                         "B = N*gen_batch single-program rollout that "
                         "MBPOConfig.gen_rounds=N dispatches, reported "
                         "per-imagined-frame so settings compare directly")
    args = ap.parse_args()

    B = args.gen_batch
    horizon = args.horizon
    rounds = [int(x) for x in args.gen_rounds.split(",") if x]
    frame_stack = 3
    ctx = 2

    head = ActionModelConfig(action_dim=4, context_length=ctx,
                             segment_length=12, reward_prediction=True)
    vp = VideoPredictor(TOKENIZER_64, LLAMA_BASE, head)

    # random policy standing in for DrQ-v2 (same shapes/cost profile as the
    # jitted actor; the policy runs INSIDE the rollout scan either way)
    def policy_fn(agent_state, obs, stddev, rng):
        return jax.random.uniform(rng, (obs.shape[0], 4), minval=-1.0)

    rng = np.random.default_rng(0)

    for n_rounds in rounds:
        nb = n_rounds * B
        obs = rng.uniform(0, 255,
                          (nb, 64, 64, 3 * frame_stack)).astype(np.float32)
        t0 = time.time()
        vp.rollout(obs, policy_fn, None, horizon, frame_stack=frame_stack,
                   rng=jax.random.key(0))
        print(f"gen_rounds={n_rounds} (B={nb}) compile+run: "
              f"{time.time()-t0:.1f}s", flush=True)

        iters = 5
        t0 = time.time()
        for i in range(iters):
            vp.rollout(obs, policy_fn, None, horizon,
                       frame_stack=frame_stack, rng=jax.random.key(i + 1))
        # dt covers n_rounds generation rounds; per-round cadence is
        # dt / n_rounds, throughput is total imagined frames over dt
        dt = (time.time() - t0) / iters
        print(f"gen_rounds={n_rounds}: rollout sync {dt*1e3:.0f} ms -> "
              f"{nb*horizon/dt:.0f} imagined frames/s/chip "
              f"(gen_batch={B}, horizon={horizon})", flush=True)

    obs = rng.uniform(0, 255, (B, 64, 64, 3 * frame_stack)).astype(np.float32)

    # the mbpo.generate() pipeline (cfg.gen_pipeline, the default): dispatch
    # round i+1, then fetch round i's episodes while the device works — the
    # ~200ms result transfer hides under the next rollout's execution
    iters = 8
    pend = vp.rollout_async(obs, policy_fn, None, horizon,
                            frame_stack=frame_stack, rng=jax.random.key(100))
    t0 = time.time()
    for i in range(iters):
        nxt = vp.rollout_async(obs, policy_fn, None, horizon,
                               frame_stack=frame_stack,
                               rng=jax.random.key(101 + i))
        pend.fetch()
        pend = nxt
    dt = (time.time() - t0) / iters
    pend.fetch()
    print(f"rollout pipelined (gen_pipeline): {dt*1e3:.0f} ms -> "
          f"{B*horizon/dt:.0f} imagined frames/s/chip "
          f"(B={B}, horizon={horizon})", flush=True)


if __name__ == "__main__":
    main()
