"""Headline benchmark: BAIR-style 64x64 16-frame autoregressive rollout,
frames/sec/chip, end-to-end (tokenize context -> KV-cached generation ->
detokenize), on one real TPU chip.

Measures BOTH headline protocol shapes:
- ctx=2 (the OXE pretrain regime, the round-1/2 headline), and
- ctx=1 / seg=16 — the BASELINE.md BAIR eval protocol
  (reference scripts/evaluation/bair-64-act-cond.sh:8-12): prelude 257
  tokens, 15 generated frames — a different prefill/decode mix.
then, budget permitting, two labeled extras (never the headline):
- mbrl — the MBPO imagination regime (gen_batch 32, horizon 10;
  reference mbrl/video_predictor.py:267-339), and
- 2i — the ctx=2 shape with the OPT-IN int8 MXU detokenizer render
  (ops/qconv.py; ~+3.6%, pixel error bounded by
  tools/detok_int8_parity.py — reported alongside the exact render so
  both numbers are in the artifact).

Output contract: one JSON line per completed protocol, flushed
IMMEDIATELY, each line self-contained and cumulative — the LAST line on
stdout is always the most complete result. A driver that kills this
process on a timeout still captures every protocol that finished:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N, ...}
  {"metric": ..., "value": N, ..., "ctx1_value": N, ...}

The whole run fits a wall-clock budget (BENCH_TIME_BUDGET_S, default
500 s): protocols that do not fit the remaining budget are skipped (noted
in the JSON) rather than overrunning, and retry/backoff never extends
past the deadline. Round 3 failed precisely here — the old harness
printed nothing until every protocol finished and its retry budget
(3600 s) dwarfed the driver window, so a timeout yielded an empty tail.

Baseline for vs_baseline: the reference publishes no throughput numbers
(BASELINE.md), so we use a documented engineering estimate of the reference
stack's rollout rate on one A100-40GB: HF generate (host loop, KV cache,
138M LLaMA) at eval batch 100 sustains roughly 4-5k tokens/s end-to-end
including per-frame re-dispatch and detokenize; at 17 tokens/frame that is
~250 frames/s. The north-star target is >=5x this (BASELINE.json). This
denominator is an ESTIMATE, not a measurement — flagged in README.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

START = time.time()  # budget clock starts at import

import jax
import jax.numpy as jnp

# persistent compilation cache: repeat bench runs skip the big first compile
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BENCH_CACHE_DIR", "/tmp/ivg_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# honor JAX_PLATFORMS=cpu for smoke runs: the axon tunnel plugin overrides
# the env var unless the config is set from Python (utils/platform.py)
from ivideogpt_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

REF_A100_FPS_ESTIMATE = 250.0  # documented estimate, see module docstring

# pauses the harness takes between attempts; module constants so the
# harness tests can zero them
OOM_SLEEP_S = 30     # let the tunnel server free HBM before a re-attempt
RETRY_SLEEP_S = 60   # backoff after a transient tunnel outage
SETTLE_S = 30        # between protocols: let the previous child's HBM free


def run_protocol(ctx: int, B: int, iters: int):
    """One protocol shape end to end; returns (fps, dts_per_block, compile_s)."""
    from ivideogpt_tpu.configs import ActionModelConfig, LLAMA_BASE, TOKENIZER_64
    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
    from ivideogpt_tpu import generation, tokens

    T = 16
    F = T - ctx

    tok_cfg = TOKENIZER_64.replace(context_length=ctx)
    tokenizer = CompressiveVQModel(tok_cfg, dtype=jnp.bfloat16)
    head = ActionModelConfig(action_dim=4, context_length=ctx,
                             segment_length=T)
    lm = HeadModelWithAction(LLAMA_BASE, head, dtype=jnp.bfloat16)

    # Inputs generated ON DEVICE under jit: the previous host-side
    # (B, T, 64, 64, 3) fp32 array was an ~800MB host->device transfer over
    # the tunnel of which the rollout only ever reads the ctx frames —
    # measured as the bulk of a 323 s pre-compile startup that nearly ate
    # the driver's whole window.
    @jax.jit
    def _make_inputs(key):
        k1, k2 = jax.random.split(key)
        return (jax.random.uniform(k1, (B, ctx, 64, 64, 3), jnp.float32),
                jax.random.normal(k2, (B, T, 4), jnp.float32))

    px_ctx, action = _make_inputs(jax.random.key(42))

    # Params: init + precision cast fused under ONE jit program each. Eager
    # flax init dispatches every op individually over the tunnel (hundreds
    # of round trips); under jit the traced-but-unused forward is dead-code
    # eliminated, the fp32 master tree (~553MB for the LM) never
    # materializes in HBM — real headroom at B=256, which sits near the
    # 16GB edge — and the persistent compile cache makes repeats free.
    # Casts are bit-identical for the bf16 models (which cast per use);
    # 1-D params and the fp32 VQ codebooks stay fp32 (single shared
    # predicate, generation.cast_*_params).
    def _tok_init(k):
        return generation.cast_conv_params(tokenizer.init(
            k, jnp.zeros((ctx, 64, 64, 3), jnp.float32),
            jnp.zeros((F, 64, 64, 3), jnp.float32), segment_len=F))

    tok_params = jax.jit(_tok_init)(jax.random.key(0))
    L = tokens.seq_len(ctx, T)

    def _lm_init(k):
        return generation.cast_matmul_params(lm.init(
            k, jnp.zeros((1, L), jnp.int32), None,
            jnp.zeros((1, T, 4), jnp.float32)))

    lm_params = jax.jit(_lm_init)(jax.random.key(1))

    # context-only tokenize: the prelude depends only on the ctx frames, so
    # encoding the future GT frames is pure waste in a rollout (the
    # reference zero-pads futures and tokenizes the whole clip,
    # mbrl/video_predictor.py:280-283)
    prelude_fn = jax.jit(lambda p, x: tokens.make_prelude(
        tokenizer.apply(p, x, method=tokenizer.encode_context),
        tok_cfg.num_vq_embeddings, tok_cfg.num_dyn_embeddings))

    # int8 MXU convs for the detokenizer (ops/qconv.py): ~1.5x the decoder's
    # conv time on the hot shapes (tools/bench_int8_conv.py). Changes output
    # PIXELS (not token ids) within the bound measured by
    # tools/detok_int8_parity.py. Modes: "0" (DEFAULT: bf16 render, the
    # exact-parity protocol — the headline measures the same full-precision
    # decode the A100 denominator models; int8 stays opt-in until
    # trained-weight FVD parity can be shown against published
    # checkpoints), "static" (activation scales calibrated once on the
    # first rollout's tokens with margin headroom, quantize fuses into the
    # producer epilogue; ~+3.6% end-to-end), "1" (dynamic per-tensor
    # absmax). The mode used is recorded in the result JSON.
    int8_detok = os.environ.get("BENCH_INT8_DETOK", "0")
    if int8_detok not in ("0", "1", "static"):
        raise ValueError(
            f"BENCH_INT8_DETOK={int8_detok!r}: expected '0', '1' or 'static'")

    def _detok_bf16(p, i):
        return tokenizer.apply(p, i, ctx, method=tokenizer.detokenize)

    if int8_detok == "0":
        detokenize_one = jax.jit(_detok_bf16)
    elif int8_detok == "static":
        from ivideogpt_tpu.ops.qconv import calibrate_convs, int8_convs
        _static = {"fn": None}

        def _calib(p, i):
            with calibrate_convs() as rec:
                _detok_bf16(p, i)
                return rec.scales()

        def detokenize_one(p, i):
            if _static["fn"] is None:
                # calibrate on the first chunk actually rendered: same
                # shape as every later chunk, and generated-token pixel
                # statistics match the steady-state distribution. Later
                # rollouts sample under different keys, so activations can
                # exceed the first chunk's absmax — margin=1.1 gives the
                # saturation headroom tools/detok_int8_parity.py's held-out
                # bound assumes.
                scales = {k: float(v) for k, v in
                          jax.device_get(jax.jit(_calib)(p, i)).items()}

                def f(p, i):
                    with int8_convs(act_scales=scales, margin=1.1):
                        return _detok_bf16(p, i)
                _static["fn"] = jax.jit(f)
            return _static["fn"](p, i)
    else:
        from ivideogpt_tpu.ops.qconv import int8_convs

        def _detok_dyn(p, i):
            with int8_convs():  # trace-time interception: works under jit
                return _detok_bf16(p, i)

        detokenize_one = jax.jit(_detok_dyn)

    # detokenize is conv-FLOPs-bound, so chunking it over batch is free in
    # time but caps the activation peak ([B*F, 64, 64, 256] temps are what
    # OOM above B=256 — and at ctx=1, whose 15-frame detok runs ~0.5GB
    # hotter than ctx=2's, they tip B=256 over when the shared tunnel has
    # leftover allocations; default 128 keeps both protocols at B=256)
    chunk = int(os.environ.get("BENCH_DETOK_CHUNK", "128"))

    kv = os.environ.get("BENCH_KV", "int8")  # int8 (default) | bf16 | mixed
    cache_dtype = {"int8": jnp.int8, "mixed": "mixed"}.get(kv, jnp.bfloat16)
    # approx_max_k sampling is ~10% faster end to end but deviates from the
    # reference's exact top-k protocol; opt-in only
    approx = os.environ.get("BENCH_APPROX_TOPK", "0") == "1"
    # read_len bucketing: quantize the per-frame attended-prefix schedule
    # to N distinct values so XLA compiles N inner-scan bodies instead of
    # F (bit-identical output; see generation.generate docstring). Default
    # 4 = the round-4 sweep's Pareto point: cold compile 307s -> 142s at
    # -0.17% fps, which keeps the driver's bench window comfortable.
    rl_buckets = int(os.environ.get("BENCH_RL_BUCKETS", "4"))

    def detokenize(p, ids):
        if B <= chunk:
            return detokenize_one(p, ids)
        parts = [detokenize_one(p, ids[i:i + chunk])
                 for i in range(0, B, chunk)]
        return jnp.concatenate(parts, axis=0)

    def rollout(key):
        prelude = prelude_fn(tok_params, px_ctx)
        res = generation.generate(
            lm, lm_params, prelude, key, segment_length=T,
            context_length=ctx, action=action, cache_dtype=cache_dtype,
            approx_top_k=approx, read_len_buckets=rl_buckets)
        return detokenize(tok_params, res.tokens)

    def sync(x):
        # fetch a scalar: forces completion of the whole dependency chain.
        # (block_until_ready alone does not synchronize on tunneled TPU
        # attachments, which acknowledge before execution completes.)
        return float(jnp.mean(x))

    # compile
    print(f"# ctx={ctx} B={B}: params ready t+{time.time()-START:.0f}s; "
          f"compiling", file=sys.stderr, flush=True)
    t0 = time.time()
    frames = rollout(jax.random.key(0))
    sync(frames)
    compile_s = time.time() - t0
    print(f"# ctx={ctx}: compile {compile_s:.0f}s", file=sys.stderr,
          flush=True)

    # steady state: enqueue iterations in BLOCKS, sync once per block on a
    # scalar that depends on every rollout in it (device executes in stream
    # order; a per-iter sync would bill one tunnel round-trip per
    # iteration), and report the FASTEST block as the headline while the
    # JSON also carries the median and the full spread. The shared
    # tunnel's contention noise is one-sided — another tenant's work only
    # ever ADDS time — so min-of-blocks estimates the uncontended rate
    # while a single 8-iter mean inherits any transient slowdown for the
    # whole window (observed 2026-08-18: a ctx=1 child read 3.40 s/rollout
    # while the same program measured 2.49 s phase-by-phase minutes later).
    block = max(1, min(2, iters))
    dts = []
    for b0 in range(0, iters, block):
        n = min(block, iters - b0)
        t0 = time.time()
        acc = jnp.zeros((), jnp.float32)
        for i in range(b0, b0 + n):
            frames = rollout(jax.random.key(i + 1))
            acc = acc + jnp.mean(frames)
        float(acc)
        dts.append((time.time() - t0) / n)
        print(f"# ctx={ctx}: block {len(dts)} {dts[-1]:.3f}s/rollout",
              file=sys.stderr, flush=True)
    dt = min(dts)
    if max(dts) > 1.15 * dt:
        print(f"# contention: block s/rollout spread "
              f"{[round(x, 3) for x in dts]} (ctx={ctx}); headline is min, "
              f"median in JSON", file=sys.stderr)

    return B * F / dt, dts, compile_s


def run_one(ctx: int, B: int, iters: int) -> dict:
    """One protocol with OOM step-down. The shared tunnel occasionally has
    less free HBM than a dedicated chip (leftover server-side buffers from
    other sessions), and B=256 sits near the 16GB edge by design; rather
    than fail, retry once at full B and then step the batch down,
    reporting the batch actually used."""
    last = None
    for attempt_B in (B, B, B * 7 // 8, B * 3 // 4):
        try:
            fps, dts, comp = run_protocol(ctx, attempt_B, iters)
            return {"ctx": ctx, "fps": fps, "dt": min(dts),
                    "dt_median": statistics.median(dts),
                    "blocks": [round(x, 4) for x in dts], "comp": comp,
                    "batch": attempt_B, "device": str(jax.devices()[0]),
                    "int8_detok": os.environ.get("BENCH_INT8_DETOK", "0")}
        except Exception as e:  # jaxlib RESOURCE_EXHAUSTED has no
            if "RESOURCE_EXHAUSTED" not in str(e):  # stable type here
                raise
            print(f"# OOM at B={attempt_B} (ctx={ctx}); retrying",
                  file=sys.stderr, flush=True)
            last = e
            time.sleep(OOM_SLEEP_S)
    raise RuntimeError(f"all batch sizes OOMed for ctx={ctx}") from last


def run_mbrl(iters: int) -> dict:
    """The MBPO imagination regime (gen_batch 32, horizon 10, frame-stack
    3): the VideoPredictor rollout that mbrl_train.py's generate phase
    dispatches (reference mbrl/video_predictor.py:267-339 runs this as a
    host loop of HF generates). Reported as imagined frames/s/chip —
    lands the tools/bench_mbrl_rollout.py measurement in the
    driver-captured artifact."""
    from ivideogpt_tpu.configs import (ActionModelConfig, LLAMA_BASE,
                                       TOKENIZER_64)
    from ivideogpt_tpu.mbrl.video_predictor import VideoPredictor

    B, horizon, frame_stack, ctx = 32, 10, 3, 2
    head = ActionModelConfig(action_dim=4, context_length=ctx,
                             segment_length=12, reward_prediction=True)
    vp = VideoPredictor(TOKENIZER_64, LLAMA_BASE, head)

    def policy_fn(agent_state, obs, stddev, rng):
        # random policy standing in for DrQ-v2 (same shapes/cost profile;
        # the policy runs INSIDE the rollout scan either way)
        return jax.random.uniform(rng, (obs.shape[0], 4), minval=-1.0)

    import numpy as np
    obs = np.random.default_rng(0).uniform(
        0, 255, (B, 64, 64, 3 * frame_stack)).astype(np.float32)

    t0 = time.time()
    vp.rollout(obs, policy_fn, None, horizon, frame_stack=frame_stack,
               rng=jax.random.key(0))
    compile_s = time.time() - t0
    print(f"# mbrl: compile+first {compile_s:.0f}s", file=sys.stderr,
          flush=True)

    # steady state measured PIPELINED, exactly as mbpo.generate()
    # dispatches it (round i+1 in flight while round i's result transfers;
    # the ~200 ms D2H hides under execution on tunneled attachments). The
    # clock starts with one rollout already in flight — same methodology
    # as tools/bench_mbrl_rollout.py — so the pipeline-fill cost is
    # excluded from the per-rollout steady state.
    chain = 3
    dts = []
    pending = vp.rollout_async(obs, policy_fn, None, horizon,
                               frame_stack=frame_stack,
                               rng=jax.random.key(99))
    for b in range(max(2, iters // 2)):
        t0 = time.time()
        for i in range(chain):
            nxt = vp.rollout_async(obs, policy_fn, None, horizon,
                                   frame_stack=frame_stack,
                                   rng=jax.random.key(100 + b * chain + i))
            pending.fetch()
            pending = nxt
        dts.append((time.time() - t0) / chain)
        print(f"# mbrl: block {len(dts)} {dts[-1]:.3f}s/rollout (pipelined)",
              file=sys.stderr, flush=True)
    pending.fetch()
    dt = min(dts)
    return {"protocol": "mbrl", "fps": B * horizon / dt, "dt": dt,
            "dt_median": statistics.median(dts),
            "blocks": [round(x, 4) for x in dts], "comp": compile_s,
            "batch": B, "horizon": horizon,
            "device": str(jax.devices()[0])}


def _child_argv():
    # separate hook so harness tests can substitute a fake child
    return [sys.executable, os.path.abspath(__file__)]


def run_one_subprocess(ctx: int, deadline: float, iters: int) -> dict:
    """Run one protocol in a FRESH process, never outliving `deadline`.

    Fresh process per protocol: repeated OOM-retries degrade the tunnel
    client within a process (later, smaller attempts keep OOMing); a clean
    process matches the conditions under which the numbers reproduce, and
    the persistent compile cache makes its startup cheap.

    The shared tunnel also has transient OUTAGES (backend init returns
    UNAVAILABLE, or hangs): retry with backoff, but every attempt is
    capped at the time left to `deadline` — a hung child costs at most
    the remaining budget, never more (round 3's harness had a 3600 s
    retry budget and overran the driver window)."""
    import subprocess
    env = dict(os.environ)
    env["BENCH_PROTOCOLS"] = str(ctx)
    env["BENCH_CHILD"] = "1"
    env["BENCH_ITERS"] = str(iters)
    attempt = 0
    while True:
        attempt += 1
        cap = deadline - time.time()
        if cap < 30:
            raise RuntimeError(
                f"bench child (ctx={ctx}) out of budget before attempt "
                f"{attempt}")
        try:
            r = subprocess.run(_child_argv(), capture_output=True,
                               text=True, env=env, timeout=cap)
        except subprocess.TimeoutExpired as e:
            err = e.stderr or ""
            if isinstance(err, bytes):
                err = err.decode("utf-8", "replace")
            sys.stderr.write(err)
            raise RuntimeError(
                f"bench child (ctx={ctx}) hung past the budget "
                f"(attempts={attempt})") from e
        sys.stderr.write(r.stderr)
        for line in reversed(r.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
        transient = any(s in (r.stderr + r.stdout) for s in
                        ("UNAVAILABLE", "Unable to initialize backend",
                         "DEADLINE_EXCEEDED", "Socket closed",
                         "failed to connect"))
        if not transient or time.time() + RETRY_SLEEP_S + 60 > deadline:
            raise RuntimeError(
                f"bench child (ctx={ctx}) produced no result; "
                f"rc={r.returncode} attempts={attempt}\n"
                f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
        print(f"# tunnel unavailable (ctx={ctx}, attempt {attempt}); "
              f"retrying in {RETRY_SLEEP_S}s", file=sys.stderr, flush=True)
        time.sleep(RETRY_SLEEP_S)


def _tok_name(tok) -> str:
    """Display prefix for a protocol token in notes/extras keys."""
    if tok == "mbrl":
        return "mbrl"
    if tok == "2i":
        return "int8_detok"
    return f"ctx{tok}"


def build_result(results: dict, B: int, notes) -> dict:
    """Pure: assemble the cumulative headline JSON from per-protocol rows.

    Headline = ctx=2 (the pretrain regime) when present; a standalone
    BENCH_PROTOCOLS=1 run headlines the protocol it actually measured.
    Extra protocols land as labeled fields: mbrl_* (the MBPO imagination
    regime) and int8_detok_* (the opt-in int8 MXU render of the ctx=2
    shape — the headline itself stays the exact bf16 render)."""
    int_keys = [k for k in results if isinstance(k, int)]
    head_ctx = 2 if 2 in results else (
        int_keys[0] if int_keys else next(iter(results)))
    r2 = results[head_ctx]
    if head_ctx == "mbrl":
        # standalone BENCH_PROTOCOLS=mbrl run: headline the regime measured
        return {"metric": "mbpo_imagined_frames_per_sec_per_chip",
                "value": round(r2["fps"], 2), "unit": "frames/sec",
                "vs_baseline": None, "gen_batch": r2["batch"],
                "horizon": r2["horizon"],
                "s_per_rollout": round(r2["dt"], 4),
                "compile_s": round(r2["comp"], 1),
                "notes": list(notes) if notes else [],
                "device": r2.get("device", "")}
    extras = {}
    if r2["batch"] != B:
        extras["batch_stepped_down"] = True
    for tok, r in results.items():
        if tok == head_ctx:
            continue
        if tok == "mbrl":
            extras["mbrl_imagined_frames_per_s_per_chip"] = round(
                r["fps"], 1)
            extras["mbrl_s_per_rollout"] = round(r["dt"], 4)
            extras["mbrl_gen_batch"] = r["batch"]
            extras["mbrl_horizon"] = r["horizon"]
            extras["mbrl_compile_s"] = round(r["comp"], 1)
            continue
        if tok == "2i":
            extras["int8_detok_value"] = round(r["fps"], 2)
            extras["int8_detok_vs_baseline"] = round(
                r["fps"] / REF_A100_FPS_ESTIMATE, 3)
            extras["int8_detok_compile_s"] = round(r["comp"], 1)
            continue
        extras[f"ctx{tok}_value"] = round(r["fps"], 2)
        extras[f"ctx{tok}_vs_baseline"] = round(
            r["fps"] / REF_A100_FPS_ESTIMATE, 3)
        extras[f"ctx{tok}_steady_state_s_per_rollout"] = round(r["dt"], 4)
        extras[f"ctx{tok}_steady_state_s_per_rollout_median"] = round(
            r["dt_median"], 4)
        extras[f"ctx{tok}_compile_s"] = round(r["comp"], 1)
        extras[f"ctx{tok}_batch"] = r["batch"]
    if notes:
        extras["notes"] = list(notes)
    return {
        "metric": "bair64_rollout_frames_per_sec_per_chip",
        "value": round(r2["fps"], 2),
        "unit": "frames/sec",
        "vs_baseline": round(r2["fps"] / REF_A100_FPS_ESTIMATE, 3),
        "batch": r2["batch"],
        "segment_length": 16,
        "context_length": head_ctx,
        "steady_state_s_per_rollout": round(r2["dt"], 4),
        "steady_state_s_per_rollout_median": round(r2["dt_median"], 4),
        "block_s_per_rollout": r2["blocks"],
        "compile_s": round(r2["comp"], 1),
        # "0" = exact bf16 render (full-precision decode, same as the A100
        # denominator models); "static"/"1" = opt-in int8 MXU render
        "int8_detok": r2.get("int8_detok", "0"),
        **extras,
        "device": r2.get("device", ""),
    }


def _run_token(tok, B: int, iters: int) -> dict:
    """Dispatch one protocol token: 2/1 = rollout shapes, mbrl = MBPO
    imagination regime, 2i = ctx-2 rollout with the opt-in int8 static
    detokenizer render (labeled separately; never the headline)."""
    if tok == "mbrl":
        return run_mbrl(iters)
    if tok == "2i":
        os.environ["BENCH_INT8_DETOK"] = "static"
        return run_one(2, B, iters)
    return run_one(tok, B, iters)


def _parse_protocols(spec: str):
    out = []
    for t in spec.split(","):
        t = t.strip()
        out.append(t if t in ("mbrl", "2i") else int(t))
    return out


def main():
    B = int(os.environ.get("BENCH_BATCH", "256"))
    # 10 iters = 5 min-of-blocks samples: the ctx=2 headline sits within
    # ~0.5% of the 5x line, so the min needs enough blocks to shed the
    # first-block warm-in reliably (~6 s extra per protocol; the budget
    # guard still halves iters when the window is tight)
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    # headline protocols first (ctx=2 pretrain regime, then the ctx=1 BAIR
    # eval shape), then budget-permitting extras: the MBPO imagination
    # regime and the labeled int8-render row. BENCH_PROTOCOLS overrides.
    protocols = _parse_protocols(
        os.environ.get("BENCH_PROTOCOLS", "2,1,mbrl,2i"))

    if os.environ.get("BENCH_CHILD") == "1":
        # child mode: one protocol, raw JSON result on stdout
        print(json.dumps(_run_token(protocols[0], B, iters)), flush=True)
        return

    budget = float(os.environ.get("BENCH_TIME_BUDGET_S", "500"))
    deadline = START + budget

    results, notes = {}, []
    for i, ctx in enumerate(protocols):
        remaining = deadline - time.time()
        if results and remaining < 90:
            # not enough budget to even start another protocol — keep what
            # we have rather than risk the emitted lines to a hard kill
            notes.append(f"{_tok_name(ctx)}_skipped_budget")
            continue
        if i > 0:
            time.sleep(min(SETTLE_S, max(0.0, remaining - 120)))
        # shrink the measurement when budget is tight: compile dominates,
        # but fewer steady iters still saves ~2.5 s each at B=256. The
        # EXTRA protocols (mbrl, 2i) always run at half iters — the
        # headline is what needs min-of-blocks precision, and the saved
        # ~15 s is what lets the last extra fit the window
        it = iters if remaining > 240 else max(2, iters // 2)
        if not isinstance(ctx, int):
            it = max(4, iters // 2)
        try:
            if len(protocols) > 1:
                results[ctx] = run_one_subprocess(ctx, deadline, it)
            else:
                results[ctx] = _run_token(ctx, B, it)
        except Exception as e:
            # a failed protocol must not take down the ones that can still
            # run (or the lines already emitted) — note it and move on
            notes.append(f"{_tok_name(ctx)}_failed:{type(e).__name__}")
            print(f"# {_tok_name(ctx)} failed: {e}", file=sys.stderr,
                  flush=True)
            continue
        # cumulative, self-contained, flushed: a later timeout costs only
        # the protocols that have not run yet
        print(json.dumps(build_result(results, B, notes)), flush=True)
    if not results:
        raise RuntimeError(f"no protocol produced a result: {notes}")
    if notes:
        # final line repeats the full result with every note attached
        print(json.dumps(build_result(results, B, notes)), flush=True)


if __name__ == "__main__":
    main()
