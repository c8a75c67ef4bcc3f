"""Real-trainer convergence study on the TPU (round-5, VERDICT item 2).

The overfit oracles (tests/test_learning_signal.py) prove gradients point
the right way at ~150 steps; this study proves the REAL trainers TRAIN:
a few thousand steps of `train_tokenizer.py` (GAN crossing disc_start,
adaptive disc weight, EMA) and `train_gpt.py` (action-conditioned CE
curve) on a deterministic synthetic dataset, on the real chip, ending in
an action-conditioned generation oracle vs a copy-last-frame baseline.
The reference's analogue is its in-loop validation over real training
(reference train_tokenizer.py:908-1007); no equivalent study ships with
the reference, so the committed curves in benchruns/convergence_r5/ are
this repo's own evidence.

Dataset: tools/make_sample_fixture.py's deterministic sprite scene
(textured background, one action-driven sprite + one ballistic
distractor) — fully learnable dynamics with a genuine action dependency.

Phases (each skipped if its outputs already exist, so the study resumes):
  data   {out}/data/synth/*.npz episodes (image uint8 [T,64,64,3], action)
  tok    train_tokenizer.py subprocess: small-width config, GAN ACTIVE
         (disc_start mid-run), EMA, periodic validation
  gpt    train_gpt.py subprocess on the trained tokenizer: tiny llama,
         action-conditioned
  oracle generation PSNR vs ground truth on held-out episodes, against
         the copy-last-context-frame baseline; plus curve summaries
         parsed from both metrics.jsonl files

Run: python tools/convergence_study.py --out /tmp/convergence_r5
Then copy {out}/summary.json + the two metrics.jsonl into
benchruns/convergence_r5/ (committed; see COMPONENTS.md "Convergence").
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TOK_CONFIG = {
    # small-width 64px compressive tokenizer: big enough to reconstruct
    # the sprite scene crisply, small enough to train in minutes
    "block_out_channels": [32, 48, 64],
    "layers_per_block": 1,
    "latent_channels": 8,
    "num_vq_embeddings": 256,
    "num_dyn_embeddings": 256,
    "norm_num_groups": 16,
    "mid_block_add_attention": False,
    "context_length": 2,
    "resolution": 64,
    "max_att_resolution": 8,
    "patch_size": 4,
}

LLM_CONFIG = {
    "vocab_size": 514,  # 256 + 256 + 2 special
    "hidden_size": 256,
    "intermediate_size": 512,
    "num_hidden_layers": 4,
    "num_attention_heads": 4,
    "num_key_value_heads": 4,
    "max_position_embeddings": 2048,
    "rms_norm_eps": 1e-6,
}


def make_data(out: str, episodes: int = 256, T: int = 20):
    from tools.make_sample_fixture import make_trajectory
    d = os.path.join(out, "data", "synth")
    os.makedirs(d, exist_ok=True)
    have = len([f for f in os.listdir(d) if f.endswith(".npz")])
    if have >= episodes:
        print(f"# data: {have} episodes already present", flush=True)
        return
    for i in range(episodes):
        tr = make_trajectory(seed=1000 + i, T=T)
        np.savez_compressed(os.path.join(d, f"ep_{i:04d}.npz"), **tr)
    print(f"# data: wrote {episodes} episodes to {d}", flush=True)


def run_trainer(argv, log_name, watch_file=None, stall_s=420,
                compile_grace_s=1500, retries=4):
    """Run a trainer subprocess under a stall watchdog.

    The axon tunnel occasionally drops and WEDGES the in-flight RPC
    forever (observed twice: trainers frozen mid-step with the metrics
    file untouched for 15+ min while fresh processes connect fine). The
    watchdog polls ``watch_file``'s mtime: no write for ``stall_s``
    (``compile_grace_s`` before the first write, compile takes minutes)
    → kill the child and retry. Retries are cheap because the trainers
    checkpoint every 500 steps and resume latest."""
    import time
    for attempt in range(retries):
        print(f"# exec (attempt {attempt + 1}): {' '.join(argv)}",
              flush=True)
        proc = subprocess.Popen(argv, cwd=ROOT)
        proc_start = time.time()
        stalled = False
        while True:
            try:
                rc = proc.wait(timeout=30)
                break
            except subprocess.TimeoutExpired:
                pass
            if not watch_file:
                continue
            # progress = a write NEWER than this attempt's start (a stale
            # file from the killed previous attempt must not trip it)
            mtime = (os.path.getmtime(watch_file)
                     if os.path.exists(watch_file) else 0.0)
            if mtime > proc_start:
                quiet = time.time() - mtime
                if quiet > stall_s:
                    stalled = True
            else:
                quiet = time.time() - proc_start
                if quiet > compile_grace_s:
                    stalled = True
            if stalled:
                print(f"# {log_name}: no progress on {watch_file} for "
                      f"{int(quiet)}s — killing and retrying (tunnel "
                      "wedge)", flush=True)
                proc.kill()
                proc.wait()
                rc = None
                break
        if rc == 0:
            return
        if rc is not None and not stalled:
            raise SystemExit(f"{log_name} failed rc={rc}")
        time.sleep(30)  # let the tunnel settle before reconnecting
    raise SystemExit(f"{log_name}: stalled {retries} times, giving up")


def phase_tok(out: str, steps: int, batch: int, disc_start: int):
    tok_dir = os.path.join(out, "tok")
    if os.path.exists(os.path.join(tok_dir, "tokenizer", "model.safetensors")):
        print("# tok: already trained", flush=True)
        return tok_dir
    cfg_path = os.path.join(out, "tok_config.json")
    os.makedirs(out, exist_ok=True)
    with open(cfg_path, "w") as f:
        json.dump(TOK_CONFIG, f)
    run_trainer([
        sys.executable, os.path.join(ROOT, "train_tokenizer.py"),
        "--model_config", cfg_path,
        "--dataset_name", "synth",
        "--dataset_path", os.path.join(out, "data"),
        "--segment_length", "8", "--context_length", "2",
        "--train_batch_size", str(batch),
        "--learning_rate", "5e-4", "--lr_warmup_steps", "100",
        "--max_train_steps", str(steps),
        # GAN crossing mid-run: the study's point is disc_start behavior
        "--disc_start", str(disc_start), "--disc_depth", "3",
        # the export is the EMA params (reference behavior): the default
        # decay 0.9999 needs ~10k+ steps to converge — at a 2k-step study
        # it exports ~84% random-init (first run's oracle read 8 dB recon
        # PSNR from exactly this). 0.995 converges in ~600 steps.
        "--use_ema", "--ema_decay", "0.995", "--vae_loss", "l2",
        "--validation_steps", "250",
        # tunnel outages wedge in-flight RPCs permanently (observed: a
        # 20-min axon stall at step 1650 with no recovery): checkpoint
        # often + resume-latest make a killed retry cheap
        "--checkpointing_steps", "500",
        "--resume_from_checkpoint", "latest",
        "--mixed_precision", "bf16",
        "--dataloader_num_workers", "4",
        "--output_dir", tok_dir,
    ], "train_tokenizer",
        watch_file=os.path.join(tok_dir, "metrics.jsonl"))
    return tok_dir


def phase_gpt(out: str, tok_dir: str, steps: int, batch: int):
    gpt_dir = os.path.join(out, "gpt")
    if os.path.exists(os.path.join(gpt_dir, "transformer",
                                   "model.safetensors")):
        print("# gpt: already trained", flush=True)
        return gpt_dir
    cfg_path = os.path.join(out, "llm_config.json")
    with open(cfg_path, "w") as f:
        json.dump(LLM_CONFIG, f)
    run_trainer([
        sys.executable, os.path.join(ROOT, "train_gpt.py"),
        "--pretrained_model_name_or_path", tok_dir,
        "--llm_config_json", cfg_path,
        "--action_conditioned", "--action_dim", "4",
        "--dataset_name", "synth",
        "--dataset_path", os.path.join(out, "data"),
        "--segment_length", "8", "--context_length", "2",
        "--per_device_train_batch_size", str(batch),
        "--learning_rate", "3e-4", "--num_warmup_steps", "100",
        "--lr_scheduler_type", "cosine",
        "--max_train_steps", str(steps),
        "--attention_dropout", "0.0",
        "--mixed_precision", "bf16",
        "--dataloader_num_workers", "4",
        "--checkpointing_steps", "500",
        "--resume_from_checkpoint", "latest",
        "--output_dir", gpt_dir,
    ], "train_gpt",
        watch_file=os.path.join(gpt_dir, "metrics.jsonl"))
    return gpt_dir


def phase_oracle(out: str, tok_dir: str, gpt_dir: str, n_eval: int = 8):
    """Action-conditioned rollout vs GT on HELD-OUT episodes (seeds the
    trainers never saw), against the copy-last-context-frame baseline."""
    import jax
    import jax.numpy as jnp
    from tools.make_sample_fixture import make_trajectory
    from ivideogpt_tpu.configs import (ActionModelConfig, CompressiveVQConfig,
                                       TransformerConfig)
    from ivideogpt_tpu.models import CompressiveVQModel, HeadModelWithAction
    from ivideogpt_tpu.utils import checkpoint as ckpt_lib
    from ivideogpt_tpu import generation, tokens

    ctx, T = 2, 8
    tok_cfg = CompressiveVQConfig(**{**TOK_CONFIG, "block_out_channels":
                                     tuple(TOK_CONFIG["block_out_channels"])})
    tokenizer = CompressiveVQModel(tok_cfg, use_pallas=False)
    tok_params = ckpt_lib.load_tokenizer_safetensors(
        os.path.join(tok_dir, "tokenizer"))
    lm_cfg = TransformerConfig(**LLM_CONFIG)
    head_cfg = ActionModelConfig(
        action_dim=4, context_length=ctx, segment_length=T,
        tokens_per_context=tok_cfg.ctx_tokens_per_frame,
        tokens_per_dyna=tok_cfg.dyn_tokens_per_frame)
    model = HeadModelWithAction(lm_cfg, head_cfg)
    lm_params = ckpt_lib.load_action_model_safetensors(
        os.path.join(gpt_dir, "transformer"))

    # held-out scenes: seeds outside the training range
    eps = [make_trajectory(seed=9000 + i, T=T) for i in range(n_eval)]
    px = jnp.asarray(np.stack([e["image"] for e in eps]),
                     jnp.float32) / 255.0
    act = jnp.asarray(np.stack([e["action"] for e in eps]), jnp.float32)

    ids, _ = jax.jit(lambda p, x: tokenizer.apply(
        p, x, ctx, method=tokenizer.tokenize))(tok_params, px)
    P1 = tokens.prelude_len(ctx, tok_cfg.ctx_tokens_per_frame) + 1

    def rollout(top_k, actions):
        res = generation.generate(
            model, lm_params, ids[:, :P1], jax.random.key(0),
            segment_length=T, context_length=ctx, action=actions,
            tokens_per_dyna=tok_cfg.dyn_tokens_per_frame, top_k=top_k)
        gen = jax.jit(lambda p, i: tokenizer.apply(
            p, i, ctx, method=tokenizer.detokenize))(tok_params, res.tokens)
        gen = np.clip(np.asarray(gen), 0, 1)
        return gen[:, ctx:] if gen.shape[1] == T else gen[:, -(T - ctx):]

    gt = np.asarray(px)[:, ctx:]
    static = np.repeat(np.asarray(px)[:, ctx - 1:ctx], T - ctx, axis=1)

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return -10.0 * np.log10(max(mse, 1e-10))

    # tokenizer-only recon ceiling: detokenize the GT token ids
    recon = jax.jit(lambda p, i: tokenizer.apply(
        p, i, ctx, method=tokenizer.detokenize))(tok_params, ids)
    recon = np.clip(np.asarray(recon), 0, 1)

    # ACTION-FOLLOWING contrast: the same rollout under the wrong actions
    # (episodes' action sequences rolled by one) must predict the true
    # future WORSE than the rollout under the true actions — direct
    # evidence the generation is conditioned on the action stream, which
    # neither absolute PSNR row can show
    wrong_act = jnp.roll(act, 1, axis=0)

    # DYNAMIC-REGION PSNR: global PSNR is dominated by the static
    # background (whose per-episode noise the copy-last-frame baseline
    # reproduces EXACTLY — no generative model can beat it globally below
    # the tokenizer's recon ceiling). Restrict to pixels that actually
    # change (|gt - last context frame| > 0.1 in any channel): there the
    # baseline is wrong by construction, and a world model that moves the
    # sprites correctly must win.
    dyn_mask = (np.abs(gt - static).max(axis=-1, keepdims=True) > 0.1)
    dyn_mask = np.broadcast_to(dyn_mask, gt.shape)

    def psnr_masked(a, b):
        mse = float(np.mean((a - b)[dyn_mask] ** 2))
        return -10.0 * np.log10(max(mse, 1e-10))

    gen_greedy = rollout(1, act)
    return {
        "dyn_region_frac": float(dyn_mask.mean()),
        "dyn_region_gen_argmax_psnr": psnr_masked(gen_greedy, gt),
        "dyn_region_static_psnr": psnr_masked(static, gt),
        # sampled (the eval protocol's regime) AND argmax: the scene is
        # deterministic given actions, so greedy is the fair "best
        # prediction" while top-k sampling pays a stochasticity tax
        "gen_vs_gt_psnr": psnr(rollout(20, act), gt),
        "gen_argmax_vs_gt_psnr": psnr(gen_greedy, gt),
        "gen_wrong_actions_psnr": psnr(rollout(1, wrong_act), gt),
        "static_baseline_psnr": psnr(static, gt),
        "tokenizer_recon_psnr": psnr(recon[:, ctx:] if recon.shape[1] == T
                                     else recon[:, -(T - ctx):], gt),
        "n_eval_episodes": n_eval,
    }


def summarize_jsonl(path: str, keys):
    rows = []
    if not os.path.exists(path):
        return None
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    out = {}
    for k in keys:
        pts = [(r.get("step"), r[k]) for r in rows if k in r]
        if not pts:
            continue
        out[k] = {"first": pts[0], "last": pts[-1],
                  "min": min(pts, key=lambda p: p[1]),
                  "max": max(pts, key=lambda p: p[1]),
                  "n": len(pts)}
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/convergence_r5")
    ap.add_argument("--tok_steps", type=int, default=2000)
    ap.add_argument("--gpt_steps", type=int, default=2000)
    ap.add_argument("--disc_start", type=int, default=800)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--episodes", type=int, default=256)
    args = ap.parse_args()

    make_data(args.out, episodes=args.episodes)
    tok_dir = phase_tok(args.out, args.tok_steps, args.batch,
                        args.disc_start)
    gpt_dir = phase_gpt(args.out, tok_dir, args.gpt_steps, args.batch)
    oracle = phase_oracle(args.out, tok_dir, gpt_dir)

    summary = {
        "tok_steps": args.tok_steps, "gpt_steps": args.gpt_steps,
        "disc_start": args.disc_start, "batch": args.batch,
        "tok_curves": summarize_jsonl(
            os.path.join(tok_dir, "metrics.jsonl"),
            ["recon_loss", "gen_loss", "discr_loss", "adaptive_weight",
             "eval_recon_loss", "eval_perceptual_loss"]),
        "gpt_curves": summarize_jsonl(
            os.path.join(gpt_dir, "metrics.jsonl"),
            ["loss", "eval_loss", "perplexity"]),
        "oracle": oracle,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
