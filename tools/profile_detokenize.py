"""Profile detokenize on the real TPU and print the top device ops.

Run: python tools/profile_detokenize.py [BENCH_BATCH=256]
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ivg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from ivideogpt_tpu.configs import TOKENIZER_64
    from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
    from ivideogpt_tpu import tokens

    B = int(os.environ.get("BENCH_BATCH", "256"))
    ctx, T = 2, 16
    tokenizer = CompressiveVQModel(TOKENIZER_64, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(0, 1, (1, T, 64, 64, 3)), jnp.float32)
    tok_params = tokenizer.init(
        jax.random.key(0), px[:, :ctx].reshape(-1, 64, 64, 3),
        px[:, ctx:].reshape(-1, 64, 64, 3), segment_len=T - ctx)
    L = tokens.seq_len(ctx, T)
    ids = jnp.asarray(rng.integers(0, 16384, (B, L)), jnp.int32)
    # clamp into valid token ranges via detokenize's own clamping
    detok = jax.jit(lambda p, i: tokenizer.apply(
        p, i, ctx, method=tokenizer.detokenize))

    out = detok(tok_params, ids)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(3):
        out = detok(tok_params, ids)
        float(jnp.sum(out.astype(jnp.float32)))
    print(f"detokenize steady: {(time.time()-t0)/3*1e3:.1f} ms")

    trace_dir = "/tmp/ivg_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        out = detok(tok_params, ids)
        float(jnp.sum(out.astype(jnp.float32)))

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace file found", glob.glob(f"{trace_dir}/**", recursive=True)[:10])
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    # aggregate device op durations by INDIVIDUAL op, keep shape detail
    agg = defaultdict(float)
    detail = {}
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        args = ev.get("args", {}) or {}
        dur = ev.get("dur", 0) / 1e3  # ms
        if "tid" in ev and dur > 0 and ("fusion" in name or "conv" in name
                                        or "copy" in name or "dot" in name
                                        or "reduce" in name or "transpose" in name
                                        or "dynamic" in name or "gather" in name
                                        or "custom" in name or "all-" in name):
            agg[name] += dur
            total += dur
            ln = args.get("long_name") or args.get("tf_op") or ""
            if ln:
                detail[name] = str(ln)[:300]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:20]
    print(f"aggregated device op time: {total:.1f} ms")
    for k, v in top:
        print(f"  {v:9.2f} ms  {k}")
        if k in detail:
            print(f"             {detail[k]}")


if __name__ == "__main__":
    main()
