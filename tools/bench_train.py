"""Training-step benchmark at the REFERENCE PRETRAIN REGIMES (real TPU).

The headline bench (bench.py) measures inference rollout; the reference's
primary workload is 4xA100 *pretraining* (reference
scripts/pretrain/oxe-64-act-free.sh:1-31). This tool measures the repo's
jitted train steps at exactly those regimes and accounts for them in
model-FLOPs MFU terms, so the training side of the perf claim is a
number, not an assumption.

Protocols (BENCH_TRAIN_PROTOCOLS, default "tok64,gpt_base"):
  tok64       tokenizer GAN pretrain: 64px, B=16, seg=8, ctx=2, bf16
              compute, G and D steps at the steady-state (GAN-active)
              regime (reference scripts/pretrain/oxe-64-act-free.sh:7-15)
  gpt_base    LLaMA-base (138M) CE pretrain: B=16, L=751 (seg 16 ctx 2),
              action-free (reference scripts/pretrain/oxe-64-act-free.sh:21-31)
  gpt_medium  medium (436M) at B=8 with remat + attn dropout 0.1
              (reference oxe-64-act-free-medium.sh; 40GB A100 fits B=16,
              the 16GB v5e fits B=8 — per-sample numbers still compare)
  tok256      256px tokenizer at B=2 (reference oxe-256-act-free.sh:10-18;
              micro-batch 2 x accum 4 there — we measure the micro-step)

Per protocol: steady-state ms/step, samples/s/chip (LM also tokens/s), and
MFU = model FLOPs / time / peak. Model FLOPs come from XLA's static cost
analysis of the COMPILED step (fwd+bwd+optimizer, everything the step
executes), cross-checked against the 6ND estimate for the LM. Peak via
BENCH_PEAK_TFLOPS, defaulting by device kind (v5e bf16 = 197 TFLOP/s).

Batches are synthesized ON DEVICE under jit (same discipline as bench.py):
this measures the train step itself; host input-pipeline overlap is
exercised separately by the data tests and the real trainers' prefetch.

Output: one JSON line per protocol (flushed immediately) + a summary table
on stderr. Results are recorded in COMPONENTS.md ("Training throughput").

Run: python tools/bench_train.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BENCH_CACHE_DIR", "/tmp/ivg_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ivideogpt_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

# bf16 peak matmul FLOP/s per chip, by device kind (scaling-book numbers)
PEAK_BY_KIND = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
}


def peak_flops() -> float:
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    kind = jax.devices()[0].device_kind
    if kind in PEAK_BY_KIND:
        return PEAK_BY_KIND[kind]
    print(f"# unknown device kind {kind!r}: assuming v5e peak 197 TFLOP/s "
          "(override with BENCH_PEAK_TFLOPS)", file=sys.stderr)
    return 197e12


def xla_flops(compiled) -> float:
    """Total static FLOPs of a compiled executable, per XLA cost analysis."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def measure(run_block, iters: int, blocks: int):
    """min/median s-per-step over `blocks` blocks of `iters` chained steps.

    Same discipline as bench.py: iterations are enqueued per block and
    synced ONCE on a scalar that depends on the last step (state chains
    through every step, so fetching the final loss forces the whole
    block); min-of-blocks estimates the uncontended rate on the shared
    tunnel whose noise is one-sided.
    """
    dts = []
    for b in range(blocks):
        t0 = time.time()
        run_block(iters, b)
        dts.append((time.time() - t0) / iters)
        print(f"#   block {b + 1}/{blocks}: {dts[-1] * 1e3:.1f} ms/step",
              file=sys.stderr, flush=True)
    return min(dts), sorted(dts)[len(dts) // 2]


def emit(row: dict):
    print(json.dumps(row), flush=True)


def bench_gpt(name: str, *, medium: bool, B: int, iters: int, blocks: int,
              remat_policy: str = "none", attn_dropout: float = 0.1):
    from ivideogpt_tpu.configs import (ActionModelConfig, LLAMA_BASE,
                                       LLAMA_MEDIUM)
    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    from ivideogpt_tpu.train.gpt_trainer import make_train_step
    from ivideogpt_tpu.train.optim import TrainState, make_optimizer
    from ivideogpt_tpu import tokens

    ctx, T = 2, 16
    L = tokens.seq_len(ctx, T)  # 751 (reference token budget, BASELINE.md)
    if medium:
        # the medium recipe adds attention dropout 0.1 and needs remat on
        # a 16GB chip (reference scripts/pretrain/oxe-64-act-free-medium.sh)
        lm_cfg = LLAMA_MEDIUM.replace(remat=True,
                                      attention_dropout=attn_dropout,
                                      remat_policy=remat_policy)
    else:
        lm_cfg = LLAMA_BASE
    head = ActionModelConfig(action_dim=4, context_length=ctx,
                             segment_length=T)
    model = HeadModelWithAction(lm_cfg, head, dtype=jnp.bfloat16)

    @jax.jit
    def make_batch(key):
        ids = jax.random.randint(key, (B, L), 0, 16384, jnp.int32)
        return {"input_ids": ids, "labels": ids}

    batch = make_batch(jax.random.key(7))
    params = jax.jit(model.init)(jax.random.key(0), batch["input_ids"][:1],
                                 batch["labels"][:1], None)
    n_params = sum(x.size for x in jax.tree.leaves(params))

    # reference LM recipe: AdamW lr 1e-4 cosine, wd 0.01, clip 1.0
    # (scripts/pretrain/oxe-64-act-free.sh:21-31)
    tx, _ = make_optimizer(params, learning_rate=1e-4, lr_scheduler="cosine",
                           warmup_steps=100, total_steps=10_000,
                           weight_decay=0.01)
    state = TrainState.create(params, tx)
    step_fn = make_train_step(model, action_conditioned=False)

    t0 = time.time()
    compiled = step_fn.lower(state, batch, jax.random.key(1)).compile()
    flops = xla_flops(compiled)
    state, metrics = compiled(state, batch, jax.random.key(1))
    loss0 = float(metrics["loss"])
    compile_s = time.time() - t0
    print(f"# {name}: {n_params / 1e6:.1f}M params, compile+first "
          f"{compile_s:.0f}s, loss={loss0:.3f}", file=sys.stderr, flush=True)

    holder = {"state": state}

    def run_block(n, b):
        st = holder["state"]
        for i in range(n):
            st, m = compiled(st, batch, jax.random.key(100 + b * n + i))
        float(m["loss"])
        holder["state"] = st

    dt, dt_med = measure(run_block, iters, blocks)
    # 6ND cross-check: N = all params, D = B*L trained tokens; attention
    # adds 12*layers*L^2*d_model per sample (fwd 4BL^2d/layer, train 3x fwd)
    six_nd = 6.0 * n_params * B * L
    attn = 12.0 * lm_cfg.num_hidden_layers * L * L * lm_cfg.hidden_size * B
    peak = peak_flops()
    emit({"protocol": name, "ms_per_step": round(dt * 1e3, 1),
          "ms_per_step_median": round(dt_med * 1e3, 1),
          "samples_per_s_per_chip": round(B / dt, 2),
          "tokens_per_s_per_chip": round(B * L / dt),
          "batch": B, "seq_len": L, "params_m": round(n_params / 1e6, 1),
          "flops_per_step_xla": flops,
          "flops_per_step_6nd": six_nd + attn,
          "mfu_xla": round(flops / dt / peak, 4),
          "mfu_6nd": round((six_nd + attn) / dt / peak, 4),
          "peak_tflops": peak / 1e12, "compile_s": round(compile_s, 1),
          "remat": medium, "remat_policy": remat_policy if medium else None,
          "device": str(jax.devices()[0])})


def bench_tokenizer(name: str, *, res: int, B: int, iters: int, blocks: int):
    from ivideogpt_tpu.configs import (DiscriminatorConfig,
                                       TokenizerTrainConfig, TOKENIZER_64,
                                       TOKENIZER_256)
    from ivideogpt_tpu.models.discriminator import Discriminator
    from ivideogpt_tpu.models.lpips import LPIPS
    from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
    from ivideogpt_tpu.train.optim import TrainState, make_optimizer
    from ivideogpt_tpu.train.tokenizer_trainer import (
        make_discriminator_step, make_generator_step)

    ctx, T = 2, 8  # reference tokenizer pretrain: seg 8, ctx 2
    F = T - ctx
    tok_cfg = (TOKENIZER_256 if res == 256 else TOKENIZER_64).replace(
        context_length=ctx)
    if res == 256:
        tok_cfg = tok_cfg.replace(remat=True)
    train_cfg = TokenizerTrainConfig(batch_size=B, segment_length=T,
                                     context_length=ctx)
    model = CompressiveVQModel(tok_cfg, dtype=jnp.bfloat16)
    disc = Discriminator(DiscriminatorConfig(), dtype=jnp.bfloat16)
    lpips = LPIPS(dtype=jnp.bfloat16)

    @jax.jit
    def make_pixels(key):
        return jax.random.uniform(key, (B, T, res, res, 3), jnp.float32)

    pixels = make_pixels(jax.random.key(7))

    def _init_tok(k):
        return model.init(k, jnp.zeros((ctx, res, res, 3), jnp.float32),
                          jnp.zeros((F, res, res, 3), jnp.float32),
                          segment_len=F)

    params = jax.jit(_init_tok)(jax.random.key(0))
    disc_vars = jax.jit(disc.init)(jax.random.key(1),
                                   jnp.zeros((2, res, res, 3), jnp.float32))
    disc_params = {"params": disc_vars["params"]}
    disc_stats = {k: v for k, v in disc_vars.items() if k != "params"}
    lpips_params = jax.jit(lpips.init)(jax.random.key(2),
                                       jnp.zeros((1, res, res, 3)),
                                       jnp.zeros((1, res, res, 3)))
    n_params = sum(x.size for x in jax.tree.leaves(params))

    # reference tokenizer recipe: AdamW lr 5e-4, wd 1e-4, clip 1.0
    # (scripts/pretrain/oxe-64-act-free.sh:7-15)
    tx, _ = make_optimizer(params, learning_rate=5e-4,
                           lr_scheduler="constant", warmup_steps=100,
                           total_steps=10_000, weight_decay=1e-4)
    disc_tx, _ = make_optimizer(disc_params["params"], learning_rate=5e-4,
                                lr_scheduler="constant", warmup_steps=100,
                                total_steps=10_000, weight_decay=1e-4)
    state = TrainState.create(params, tx)
    disc_state = TrainState.create(disc_params["params"], disc_tx)

    gen_step = make_generator_step(model, disc, lpips, lpips_params,
                                   train_cfg, use_gan=True)
    disc_step = make_discriminator_step(model, disc, train_cfg)

    # --- generator step (GAN-active steady state) ---
    disc_all = {"params": disc_state.params, **disc_stats}
    t0 = time.time()
    g_compiled = gen_step.lower(state, disc_all, pixels,
                                jax.random.key(3)).compile()
    g_flops = xla_flops(g_compiled)
    state, gm = g_compiled(state, disc_all, pixels, jax.random.key(3))
    g_loss0 = float(gm["gen_loss"])
    g_compile_s = time.time() - t0
    print(f"# {name}: {n_params / 1e6:.1f}M params, G compile+first "
          f"{g_compile_s:.0f}s, gen_loss={g_loss0:.3f}",
          file=sys.stderr, flush=True)

    holder = {"state": state}

    def run_g(n, b):
        st = holder["state"]
        for i in range(n):
            st, m = g_compiled(st, disc_all, pixels,
                               jax.random.key(100 + b * n + i))
        float(m["gen_loss"])
        holder["state"] = st

    g_dt, g_med = measure(run_g, iters, blocks)

    # --- discriminator step ---
    t0 = time.time()
    d_compiled = disc_step.lower(disc_state, disc_stats, holder["state"].params,
                                 pixels, jax.random.key(4)).compile()
    d_flops = xla_flops(d_compiled)
    disc_state, disc_stats, dm = d_compiled(
        disc_state, disc_stats, holder["state"].params, pixels,
        jax.random.key(4))
    d_compile_s = time.time() - t0
    print(f"# {name}: D compile+first {d_compile_s:.0f}s, "
          f"discr_loss={float(dm['discr_loss']):.3f}",
          file=sys.stderr, flush=True)

    dh = {"ds": disc_state, "st": disc_stats}

    def run_d(n, b):
        ds, st = dh["ds"], dh["st"]
        for i in range(n):
            ds, st, m = d_compiled(ds, st, holder["state"].params, pixels,
                                   jax.random.key(200 + b * n + i))
        float(m["discr_loss"])
        dh["ds"], dh["st"] = ds, st

    d_dt, d_med = measure(run_d, iters, blocks)

    # the trainer alternates G/D per optimization window (reference
    # train_tokenizer.py:588): a G+D pair consumes TWO batches, so
    # steady-state ingest = 2B samples per (tG + tD)
    pair_dt = g_dt + d_dt
    peak = peak_flops()
    emit({"protocol": name,
          "gen_ms_per_step": round(g_dt * 1e3, 1),
          "gen_ms_per_step_median": round(g_med * 1e3, 1),
          "disc_ms_per_step": round(d_dt * 1e3, 1),
          "disc_ms_per_step_median": round(d_med * 1e3, 1),
          "samples_per_s_per_chip": round(2 * B / pair_dt, 2),
          "frames_per_s_per_chip": round(2 * B * T / pair_dt, 1),
          "batch": B, "segment_length": T, "resolution": res,
          "params_m": round(n_params / 1e6, 1),
          "gen_flops_per_step_xla": g_flops,
          "disc_flops_per_step_xla": d_flops,
          "gen_mfu_xla": round(g_flops / g_dt / peak, 4),
          "disc_mfu_xla": round(d_flops / d_dt / peak, 4),
          "pair_mfu_xla": round((g_flops + d_flops) / pair_dt / peak, 4),
          "peak_tflops": peak / 1e12,
          "compile_s": round(g_compile_s + d_compile_s, 1),
          "device": str(jax.devices()[0])})


def main():
    protocols = os.environ.get("BENCH_TRAIN_PROTOCOLS",
                               "tok64,gpt_base").split(",")
    iters = int(os.environ.get("BENCH_TRAIN_ITERS", "4"))
    blocks = int(os.environ.get("BENCH_TRAIN_BLOCKS", "3"))
    for p in protocols:
        p = p.strip()
        t0 = time.time()
        if p == "tok64":
            bench_tokenizer("tok64_gan_pretrain", res=64, B=16, iters=iters,
                            blocks=blocks)
        elif p == "tok256":
            bench_tokenizer("tok256_gan_pretrain", res=256, B=2, iters=iters,
                            blocks=blocks)
        elif p == "gpt_base":
            bench_gpt("gpt_base_pretrain", medium=False, B=16, iters=iters,
                      blocks=blocks)
        elif p == "gpt_medium":
            bench_gpt("gpt_medium_pretrain", medium=True, B=8, iters=iters,
                      blocks=blocks)
        elif p == "gpt_medium_dots":
            # remat with the dots-saveable policy: keep GEMM outputs,
            # recompute only elementwise — the candidate fix for the
            # full-remat row's MFU
            bench_gpt("gpt_medium_pretrain_dots", medium=True, B=8,
                      iters=iters, blocks=blocks, remat_policy="dots")
        elif p == "gpt_medium_dots16":
            bench_gpt("gpt_medium_pretrain_dots_b16", medium=True, B=16,
                      iters=iters, blocks=blocks, remat_policy="dots")
        elif p == "gpt_medium_nodrop":
            # diagnostic only (recipe uses attn dropout 0.1): isolates the
            # [B,H,S,S] dropout-mask HBM cost from the score traffic
            bench_gpt("gpt_medium_diag_nodrop", medium=True, B=8,
                      iters=iters, blocks=blocks, remat_policy="dots",
                      attn_dropout=0.0)
        else:
            raise ValueError(f"unknown protocol {p!r}")
        print(f"# {p}: total {time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
