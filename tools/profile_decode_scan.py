"""Op-level profile of the single-token decode scan on the real TPU.

Finds where the per-step time beyond the int8 cache-read bandwidth floor
goes. Run: python tools/profile_decode_scan.py [BENCH_BATCH=256]
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
    from ivideogpt_tpu.configs import ActionModelConfig, LLAMA_BASE
    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    from ivideogpt_tpu import tokens

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

    cache = jax.jit(lambda p: m(p, "init_cache", B, L + 1, jnp.int8,
                                "bshd"))(params)
    emb = jnp.zeros((B, 1, 768), jnp.bfloat16)

    def step_body(p, carry, s):
        c, h = carry
        hidden, c = m(p, "decode_cached", emb, c, P1 + s)
        return (c, hidden[:, 0, :]), ()

    scan = jax.jit(lambda p, c: jax.lax.scan(
        lambda cc, s: step_body(p, cc, s), c, jnp.arange(steps)))

    carry = (cache, jnp.zeros((B, 768), jnp.bfloat16))
    out = scan(params, carry)
    float(jnp.sum(out[0][1].astype(jnp.float32)))
    t0 = time.time()
    out = scan(params, carry)
    float(jnp.sum(out[0][1].astype(jnp.float32)))
    dt = time.time() - t0
    print(f"scan steady: {dt*1e3:.1f} ms total, {dt/steps*1e6:.0f} us/step")

    trace_dir = "/tmp/ivg_trace_scan"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        out = scan(params, carry)
        float(jnp.sum(out[0][1].astype(jnp.float32)))

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace file found")
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    detail = {}
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        args = ev.get("args", {}) or {}
        dur = ev.get("dur", 0) / 1e3
        if "tid" in ev and dur > 0 and ("fusion" in name or "conv" in name
                                        or "copy" in name or "dot" in name
                                        or "reduce" in name or "transpose" in name
                                        or "dynamic" in name or "gather" in name
                                        or "custom" in name or "scatter" in name
                                        or "slice" in name or "while" not in name):
            if name.startswith("while") or name == "jit_scan":
                continue
            agg[name] += dur
            cnt[name] += 1
            total += dur
            ln = args.get("long_name") or args.get("tf_op") or ""
            if ln:
                detail[name] = str(ln)[:260]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
    print(f"aggregated device op time: {total:.1f} ms")
    for k, v in top:
        per_step = v / steps * 1e3
        print(f"  {v:9.2f} ms ({cnt[k]:5d}x, {per_step:6.1f} us/step)  {k}")
        if k in detail:
            print(f"             {detail[k]}")


if __name__ == "__main__":
    main()
