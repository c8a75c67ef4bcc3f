"""Token-transformer training/eval driver.

TPU-native equivalent of reference train_gpt.py:521-866: frozen-tokenizer
pixel tokenization, LLaMA next-token training with optional action
conditioning, cosine/warmup schedules, grouped weight decay, checkpoints,
and an eval mode with KV-cached generation + FVD / frame metrics
(best-of-t protocol).

Usage (mirrors scripts/pretrain/oxe-64-act-free.sh stage 2):
  python train_gpt.py --dataset_name select --dataset_path /data/oxe \
      --pretrained_model_name_or_path outputs/tokenizer \
      --segment_length 16 --context_length 2
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    # models
    p.add_argument("--pretrained_model_name_or_path", type=str, required=True,
                   help="dir with tokenizer/ (and transformer/ for eval/resume)")
    p.add_argument("--pretrained_transformer_path", type=str, default=None,
                   help="separate transformer warm-start dir (points at the "
                   "transformer folder itself). Decouples tokenizer and LM "
                   "sources for finetuning: the reference loads a finetuned "
                   "tokenizer from one dir and the pretrained OXE LM from "
                   "another (reference scripts/finetune/"
                   "bair-64-act-cond.sh:14-17)")
    p.add_argument("--llm_config", type=str, default="base",
                   choices=["base", "medium"],
                   help="LLaMA size (reference configs/llama/*.json)")
    p.add_argument("--llm_config_json", "--config_name",
                   dest="llm_config_json", type=str, default=None,
                   help="path to a TransformerConfig json (overrides "
                   "--llm_config; micro configs for CI). --config_name is "
                   "the reference spelling (reference train_gpt.py:200): "
                   "configs/llama/config.json and config_medium.json ship "
                   "in this repo's configs/ with the same geometry")
    p.add_argument("--vqgan_type", type=str, default="ctx_vqgan",
                   choices=["ctx_vqgan"],
                   help="reference-script compatibility (reference "
                   "train_gpt.py:221): only the compressive tokenizer "
                   "exists here — plain 'vqgan' was never used by any "
                   "published recipe")
    p.add_argument("--load_internal_llm", action="store_true")
    p.add_argument("--action_conditioned", action="store_true")
    p.add_argument("--action_dim", type=int, default=4)
    p.add_argument("--action_recon", type=float, default=None)
    p.add_argument("--attention_dropout", type=float, default=0.1)
    p.add_argument("--gradient_checkpointing", action="store_true",
                   help="remat each LM layer in backward (fits the 436M "
                        "medium model's training step on one chip)")
    # LoRA finetuning (reference train_gpt.py:621-633 peft option)
    p.add_argument("--lora", action="store_true")
    p.add_argument("--lora_r", type=int, default=8)
    p.add_argument("--lora_alpha", type=float, default=16.0)
    # data
    p.add_argument("--dataset_name", type=str, default="debug")
    p.add_argument("--dataset_path", type=str, default="/data")
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--segment_length", type=int, default=16)
    p.add_argument("--context_length", type=int, default=2)
    p.add_argument("--video_stepsize", type=int, default=1)
    p.add_argument("--segment_horizon", type=int, default=None)
    p.add_argument("--random_selection", action="store_true")
    p.add_argument("--goal_conditioned", action="store_true")
    p.add_argument("--no_aug", action="store_true")
    p.add_argument("--dataloader_num_workers", type=int, default=8)
    # optimization
    p.add_argument("--per_device_train_batch_size", "--batch_size",
                   dest="batch_size", type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--lr_scheduler_type", type=str, default="cosine")
    p.add_argument("--num_warmup_steps", type=int, default=5000)
    p.add_argument("--max_train_steps", type=int, default=1_000_000)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--embed_no_wd", action="store_true", default=True)
    # reference-script compatibility shims (accelerate/HF launcher knobs
    # that have no TPU equivalent; accepted so the reference scripts/*.sh
    # run unmodified): bf16 is TPU-native (fp32 softmax/losses), tracking
    # is always-on JSONL+TB, training is step-based
    p.add_argument("--mixed_precision", type=str, default="no",
                   choices=["bf16", "no"],
                   help="'bf16' = bf16 LM compute over fp32 master params "
                        "(the reference's accelerate autocast; every "
                        "published recipe passes bf16 — so do the scripts/ "
                        "here). Default mirrors the reference argparse "
                        "default (fp32).")
    p.add_argument("--num_train_epochs", type=int, default=None,
                   help="compat shim: ignored — training length is "
                        "--max_train_steps (the datasets are infinite "
                        "samplers, as in the reference)")
    p.add_argument("--report_to", type=str, default=None,
                   help="compat shim: logging is always JSONL + TensorBoard")
    p.add_argument("--with_tracking", action="store_true",
                   help="compat shim: tracking is always on")
    p.add_argument("--trust_remote_code", action="store_true",
                   help="compat shim: no remote code here")
    p.add_argument("--per_device_eval_batch_size", type=int, default=None,
                   help="eval loader batch size (reference "
                   "train_gpt.py:205); defaults to --eval_max_batchsize")
    # eval
    p.add_argument("--eval_only", action="store_true")
    p.add_argument("--use_eval_dataset", action="store_true",
                   help="run in-training validation on the deterministic "
                   "eval split instead of the train-distribution mix "
                   "(reference --use_eval_dataset, used by every finetune "
                   "recipe, scripts/finetune/bair-64-act-cond.sh:21)")
    p.add_argument("--use_fvd", action="store_true")
    p.add_argument("--use_frame_metrics", action="store_true")
    p.add_argument("--eval_generate_times", type=int, default=1)
    p.add_argument("--eval_max_batchsize", type=int, default=64)
    p.add_argument("--top_k", type=int, default=100)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--i3d_weights", type=str, default=None)
    p.add_argument("--lpips_weights", type=str, default=None)
    p.add_argument("--max_eval_batches", type=int, default=100)
    # bookkeeping
    p.add_argument("--output_dir", type=str, default="outputs/gpt")
    p.add_argument("--checkpointing_steps", type=int, default=10000)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--validation_steps", type=int, default=5000)
    p.add_argument("--validation_generation", action="store_true",
                   default=True,
                   help="run full generation eval (metrics + GIF dumps) "
                        "every validation_steps (reference "
                        "train_gpt.py:322,842)")
    p.add_argument("--no_validation_generation", action="store_false",
                   dest="validation_generation")
    p.add_argument("--validation_eval_batches", type=int, default=2,
                   help="eval batches per in-training generation eval")
    p.add_argument("--log_steps", type=int, default=50)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    # distribution (replaces the reference's `accelerate launch` DDP,
    # scripts/pretrain/oxe-64-act-free.sh:1): one global ("data","model")
    # mesh over every process's devices; GSPMD inserts the collectives
    p.add_argument("--n_model", type=int, default=1,
                   help="tensor-parallel size (model mesh axis)")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port for jax.distributed multi-process init "
                        "(auto-detected on Cloud TPU; env "
                        "JAX_COORDINATOR_ADDRESS also works)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    # reference-script aliases (the published recipes run unmodified)
    p.add_argument("--exp_name", type=str, default=None,
                   help="run name: output goes to "
                   "output_dir/<timestamp>-<exp_name> (reference "
                   "train_gpt.py:563)")
    p.add_argument("--oxe_data_mixes_type", dest="dataset_name",
                   default=argparse.SUPPRESS,
                   help="reference spelling of --dataset_name")
    p.add_argument("--rand_select", dest="random_selection",
                   action="store_true", default=argparse.SUPPRESS,
                   help="reference spelling of --random_selection")
    p.add_argument("--llama_attn_drop", dest="attention_dropout", type=float,
                   default=argparse.SUPPRESS,
                   help="reference spelling of --attention_dropout")
    return p.parse_args()


def build_models(args):
    import jax
    import jax.numpy as jnp
    from ivideogpt_tpu import tokens as token_lib
    from ivideogpt_tpu.configs import (ActionModelConfig, LLAMA_BASE,
                                       LLAMA_MEDIUM, TOKENIZER_64,
                                       TOKENIZER_256)
    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
    from ivideogpt_tpu.utils import checkpoint as ckpt_lib

    tok_dir = os.path.join(args.pretrained_model_name_or_path, "tokenizer")
    cfg_path = os.path.join(tok_dir, "config.json")
    if os.path.exists(cfg_path):
        # e.g. BAIR eval at ctx=1 on a ctx=2-pretrained tokenizer: loads
        # with kv pos-embs re-sliced and the config aligned (errors
        # clearly if asked to GROW the context)
        tok_params, tok_cfg = ckpt_lib.load_tokenizer_for_context(
            tok_dir, args.context_length)
    else:
        tok_cfg = (TOKENIZER_256 if args.resolution == 256 else TOKENIZER_64)
        tok_cfg = tok_cfg.replace(context_length=args.context_length)
        tok_params = None  # random tokenizer (smoke runs)
    tokenizer = CompressiveVQModel(tok_cfg)
    if tok_params is None:
        H = args.resolution
        F = args.segment_length - args.context_length
        tok_params = jax.jit(tokenizer.init, static_argnames="segment_len")(
            jax.random.key(args.seed),
            jnp.zeros((args.context_length, H, H, 3), jnp.float32),
            jnp.zeros((F, H, H, 3), jnp.float32), segment_len=F)

    if args.llm_config_json:
        from ivideogpt_tpu.configs import TransformerConfig
        with open(args.llm_config_json) as f:
            lm_cfg = TransformerConfig.from_json(f.read())
    else:
        lm_cfg = (LLAMA_MEDIUM if args.llm_config == "medium" else LLAMA_BASE)
    # vocab = num_vq + num_dyn + 2 (reference train_gpt.py:593)
    lm_cfg = lm_cfg.replace(vocab_size=tok_cfg.vocab_size,
                            attention_dropout=args.attention_dropout,
                            remat=args.gradient_checkpointing)
    head_cfg = ActionModelConfig(
        action_dim=args.action_dim, context_length=args.context_length,
        segment_length=args.segment_length,
        tokens_per_context=tok_cfg.ctx_tokens_per_frame,
        tokens_per_dyna=tok_cfg.dyn_tokens_per_frame,
        action_recon=args.action_recon)
    # LM compute dtype mirrors the reference's accelerate autocast regime
    # (bf16 forward/backward over fp32 master params, reference
    # train_gpt.py:246,537); the tokenizer stays fp32 — the reference
    # tokenizes on the *unwrapped* module outside autocast
    # (train_gpt.py:777), and fp32 keeps the golden token ids exact.
    cdtype = (jnp.bfloat16 if getattr(args, "mixed_precision", "bf16")
              == "bf16" else jnp.float32)
    model = HeadModelWithAction(lm_cfg, head_cfg, dtype=cdtype)

    L = token_lib.seq_len(args.context_length, args.segment_length,
                          ctx_tokens=tok_cfg.ctx_tokens_per_frame,
                          dyn_tokens=tok_cfg.dyn_tokens_per_frame)
    ids = jnp.zeros((1, L), jnp.int32)
    act = jnp.zeros((1, args.segment_length, args.action_dim), jnp.float32)
    lm_params = jax.jit(model.init)(jax.random.key(args.seed + 1), ids, ids,
                                    act)
    # LM warm start: --pretrained_transformer_path decouples the LM source
    # from the tokenizer dir (reference finetune recipes load a finetuned
    # tokenizer from one dir and the pretrained OXE transformer from
    # another); otherwise fall back to {tokenizer dir}/transformer
    tf_dir = args.pretrained_transformer_path or os.path.join(
        args.pretrained_model_name_or_path, "transformer")
    if os.path.isdir(tf_dir) and any(
            f.endswith(".safetensors") for f in os.listdir(tf_dir)):
        if args.load_internal_llm:
            # llm subtree only; heads stay fresh (handles both bare-llama
            # files like the published act-free transformers and our full
            # HeadModelWithAction exports)
            llm_tree = ckpt_lib.load_llm_only_safetensors(tf_dir)
            lm_params = {"params": {**lm_params["params"],
                                    "llm": llm_tree["params"]}}
        else:
            lm_params = ckpt_lib.load_action_model_safetensors(tf_dir)
    elif args.pretrained_transformer_path:
        raise FileNotFoundError(
            f"--pretrained_transformer_path {tf_dir} has no safetensors")
    return tokenizer, tok_cfg, tok_params, model, lm_cfg, head_cfg, lm_params


def _dump_prediction_gifs(gif_dir, step, gt, gen):
    """GT-vs-prediction GIF strips (reference train_gpt.py:442-451)."""
    import imageio
    os.makedirs(gif_dir, exist_ok=True)
    gt = (np.clip(np.asarray(gt), 0, 1) * 255).astype(np.uint8)
    gen = (np.clip(np.asarray(gen), 0, 1) * 255).astype(np.uint8)
    for j in range(min(4, gt.shape[0])):
        strip = [np.concatenate([gt[j, i], gen[j, i]], axis=1)
                 for i in range(gt.shape[1])]
        imageio.mimsave(os.path.join(gif_dir, f"pred-{step}-{j}.gif"),
                        strip, fps=4, loop=0)


def evaluate(args, tokenizer, tok_cfg, tok_params, model, lm_params, loader,
             max_batches=None, gif_dir=None, step=0):
    """Generation eval: FVD + best-of-t frame metrics
    (reference train_gpt.py:322-505)."""
    import jax
    import jax.numpy as jnp
    from ivideogpt_tpu import generation, tokens as token_lib
    from ivideogpt_tpu.parallel import gather_across_processes
    from ivideogpt_tpu.utils.video_metric import (Evaluator, FeatureStats,
                                                  best_of_t_metrics,
                                                  frechet_distance)

    ctx, T = args.context_length, args.segment_length
    P1 = token_lib.prelude_len(ctx, tok_cfg.ctx_tokens_per_frame) + 1
    tokenize = jax.jit(lambda p, x: tokenizer.apply(
        p, x, ctx, method=tokenizer.tokenize))
    detokenize = jax.jit(lambda p, i: tokenizer.apply(
        p, i, ctx, method=tokenizer.detokenize))

    lpips_fn = None
    if args.use_frame_metrics:
        # best-of-t LPIPS frame metric (reference video_metric.py:59-89,
        # weights loaded per --lpips_weights as in train_tokenizer.py)
        from ivideogpt_tpu.models.lpips import LPIPS, load_torch_lpips
        lpips = LPIPS()
        lpips_params = lpips.init(jax.random.key(0),
                                  jnp.zeros((1, 64, 64, 3)),
                                  jnp.zeros((1, 64, 64, 3)))
        lpips_params, loaded = load_torch_lpips(lpips_params,
                                                args.lpips_weights)
        if not loaded:
            print("[warn] LPIPS running with random init (no weights file); "
                  "the lpips metric is relative, not comparable to published "
                  "numbers")
        lpips_fn = jax.jit(lambda a, b: lpips.apply(lpips_params, a, b))

    i3d_fn = None
    if args.use_fvd:
        from ivideogpt_tpu.models.i3d import I3D, load_torch_i3d
        i3d = I3D()
        i3d_params = i3d.init(jax.random.key(0),
                              jnp.zeros((1, T, 64, 64, 3)))
        i3d_params, ok = load_torch_i3d(i3d_params, args.i3d_weights)
        if not ok:
            print("[warn] I3D running with random init (no weights file); "
                  "FVD is relative, not absolute")
        i3d_fn = jax.jit(lambda v: i3d.apply(i3d_params, v))

    real_stats, gen_stats = FeatureStats(), FeatureStats()
    all_metrics = []
    losses = []
    eval_step_count = 0
    limit = args.max_eval_batches if max_batches is None else max_batches
    for batch in loader:
        if eval_step_count >= limit:
            break
        eval_step_count += 1
        if isinstance(batch, tuple):
            pixels, actions = batch
        else:
            pixels, actions = batch, None
        px = jnp.asarray(pixels)
        B = px.shape[0]

        ids, labels = tokenize(tok_params, px)
        out = model.apply(lm_params, ids, labels,
                          jnp.asarray(actions) if actions is not None else None)
        losses.append(float(out["loss"]))

        if not (args.use_fvd or args.use_frame_metrics or gif_dir is not None):
            continue

        prelude = ids[:, :P1]
        reps = args.eval_generate_times
        gens = []
        for r in range(reps):
            res = generation.generate(
                model, lm_params, prelude,
                jax.random.key(args.seed * 1000 + eval_step_count * reps + r),
                segment_length=T, context_length=ctx,
                action=(jnp.asarray(actions) if actions is not None else None),
                tokens_per_dyna=tok_cfg.dyn_tokens_per_frame,
                top_k=args.top_k, temperature=args.temperature)
            gens.append(jnp.clip(detokenize(tok_params, res.tokens), 0, 1))
        gen_videos = jnp.concatenate(gens, axis=0)  # [t*B, T, H, W, C]

        if gif_dir is not None and eval_step_count == 1 and \
                jax.process_index() == 0:
            _dump_prediction_gifs(gif_dir, step, px, gen_videos[:px.shape[0]])

        if args.use_frame_metrics:
            m = best_of_t_metrics(px, gen_videos, lpips_fn=lpips_fn)
            all_metrics.append({k: float(v) for k, v in m.items()})
        if i3d_fn is not None:
            # cross-process feature gather (reference train_gpt.py:352,467)
            real_stats.append(gather_across_processes(np.asarray(i3d_fn(px))))
            gen_stats.append(
                gather_across_processes(np.asarray(i3d_fn(gen_videos))))

    mean_loss = float(np.mean(gather_across_processes(
        np.asarray(losses, np.float64))))
    result = {"eval_loss": mean_loss, "perplexity": float(np.exp(mean_loss))}
    if all_metrics:
        for k in all_metrics[0]:
            result[k] = float(np.mean([m[k] for m in all_metrics]))
    if args.use_fvd and real_stats.num_items:
        result["fvd"] = frechet_distance(real_stats, gen_stats)
    return result


def main():
    args = parse_args()
    import jax
    from ivideogpt_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("IVG_JAX_CACHE", "/tmp/ivg_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ivideogpt_tpu.data import EvalDataLoader, \
        InfiniteDataLoader, resolve_eval_dataset_name
    from ivideogpt_tpu.data.dataset_mixes import resolve_mix
    from ivideogpt_tpu.parallel import (global_batch, is_main_process,
                                        make_global_mesh, maybe_initialize,
                                        params_to_host, shard_params)
    from ivideogpt_tpu.train.gpt_trainer import make_train_step
    from ivideogpt_tpu.train.optim import TrainState, make_optimizer
    from ivideogpt_tpu.utils import checkpoint as ckpt_lib

    # multi-process bootstrap MUST precede any other JAX call
    maybe_initialize(args.coordinator_address, args.num_processes,
                     args.process_id)

    if args.exp_name:
        # timestamped run dir (reference train_gpt.py:563); the stamp is
        # process-0's clock broadcast to all hosts and rendered in UTC —
        # checkpoint saves are cross-host collectives into this one path,
        # and localtime would re-diverge it on hosts with differing TZ
        from ivideogpt_tpu.parallel import agreed_timestamp
        args.output_dir = os.path.join(
            args.output_dir,
            time.strftime("%Y-%m-%d-%H-%M-%S",
                          time.gmtime(agreed_timestamp()))
            + f"-{args.exp_name}")
    os.makedirs(args.output_dir, exist_ok=True)
    # run provenance: full flags + source revision (the reference snapshots
    # the whole source tree with rsync, train_tokenizer.py:336-341)
    from ivideogpt_tpu.utils.provenance import write_provenance
    write_provenance(args.output_dir, args)  # cmd.json + src_diff.patch

    (tokenizer, tok_cfg, tok_params, model, lm_cfg, head_cfg,
     lm_params) = build_models(args)

    if args.eval_only:
        loader = EvalDataLoader(resolve_eval_dataset_name(args.dataset_name),
                                args.segment_length,
                                args.resolution,
                                batch_size=(args.per_device_eval_batch_size
                                            or args.eval_max_batchsize),
                                load_action=args.action_conditioned)
        result = evaluate(args, tokenizer, tok_cfg, tok_params, model,
                          lm_params, loader)
        print(json.dumps(result))
        return

    lora_params = None
    if args.lora:
        from ivideogpt_tpu.train import lora as lora_lib
        lora_params = lora_lib.init_lora(lm_params, jax.random.key(args.seed),
                                         rank=args.lora_r)
        tx, _ = make_optimizer(
            lora_params, learning_rate=args.learning_rate,
            lr_scheduler=args.lr_scheduler_type,
            warmup_steps=args.num_warmup_steps,
            total_steps=args.max_train_steps, weight_decay=args.weight_decay,
            embed_no_wd=False, max_grad_norm=args.max_grad_norm,
        gradient_accumulation_steps=args.gradient_accumulation_steps)
        lora_opt_state = tx.init(lora_params)
        lora_step = lora_lib.make_lora_train_step(
            model, tx, action_conditioned=args.action_conditioned,
            alpha=args.lora_alpha, rank=args.lora_r)
    else:
        tx, _ = make_optimizer(
            lm_params, learning_rate=args.learning_rate,
            lr_scheduler=args.lr_scheduler_type,
            warmup_steps=args.num_warmup_steps,
            total_steps=args.max_train_steps, weight_decay=args.weight_decay,
            embed_no_wd=args.embed_no_wd, max_grad_norm=args.max_grad_norm,
        gradient_accumulation_steps=args.gradient_accumulation_steps)
    state = TrainState.create(lm_params, tx)

    global_step = 0
    if args.resume_from_checkpoint:
        path = (ckpt_lib.latest_checkpoint(args.output_dir)
                if args.resume_from_checkpoint == "latest"
                else args.resume_from_checkpoint)
        if path:
            state = ckpt_lib.restore_train_state(path, state)
            global_step = int(state.step)
            print(f"resumed from {path} at step {global_step}")

    mesh = make_global_mesh(n_model=args.n_model)
    n_data = mesh.shape["data"]
    # batch_size is per data-parallel device (reference
    # --per_device_train_batch_size); each process loads its share
    global_bs = args.batch_size * n_data
    assert global_bs % jax.process_count() == 0, (global_bs,
                                                  jax.process_count())
    local_bs = global_bs // jax.process_count()

    mix = resolve_mix(args.dataset_name, args.dataset_path)
    loader = InfiniteDataLoader(
        args.dataset_path, mix, batch_size=local_bs,
        num_workers=args.dataloader_num_workers, stepsize=args.video_stepsize,
        segment_length=args.segment_length,
        context_length=args.context_length,
        segment_horizon=args.segment_horizon,
        random_selection=args.random_selection,
        goal_conditioned=args.goal_conditioned,
        random_resized_crop_scale=(0.8, 1.0),
        random_resized_crop_ratio=(0.9, 1.1),
        no_aug=args.no_aug, image_size=args.resolution,
        load_action=args.action_conditioned,
        seed=args.seed + jax.process_index() * 9973)

    from ivideogpt_tpu.utils.loggers import TrainLogger
    from ivideogpt_tpu.train.gpt_trainer import make_eval_step
    logger = TrainLogger(args.output_dir) if is_main_process() else None
    # place params per TP rules (replicated when n_model == 1); opt state
    # replicated alongside
    from ivideogpt_tpu.parallel import replicated
    if not args.lora:
        state = state.replace(
            params=shard_params(state.params, mesh),
            opt_state=jax.device_put(state.opt_state, replicated(mesh)),
            step=jax.device_put(state.step, replicated(mesh)))
    ctx = args.context_length
    tokenize = jax.jit(lambda p, x: tokenizer.apply(
        p, x, ctx, method=tokenizer.tokenize))
    step_fn = make_train_step(model,
                              action_conditioned=args.action_conditioned)
    eval_step = make_eval_step(model,
                               action_conditioned=args.action_conditioned)
    if args.use_eval_dataset:
        # deterministic eval split (reference --use_eval_dataset: the
        # finetune recipes validate on EvalDataset, not the train mix).
        # drop_last: these batches feed the sharded global_batch, so a
        # ragged tail would break data-axis divisibility (and recompile
        # eval_step every epoch boundary)
        val_loader = EvalDataLoader(
            resolve_eval_dataset_name(args.dataset_name),
            args.segment_length, args.resolution,
            batch_size=local_bs, load_action=args.action_conditioned,
            drop_last=True)
        if len(val_loader) == 0:
            raise ValueError(
                f"eval split smaller than the local batch ({local_bs}); "
                "lower --per_device_eval_batch_size for --use_eval_dataset")

        def _cycle(loader):
            while True:
                yield from loader
        val_iter = _cycle(val_loader)
    else:
        val_loader = InfiniteDataLoader(
            args.dataset_path, mix, batch_size=local_bs, num_workers=1,
            stepsize=args.video_stepsize, segment_length=args.segment_length,
            context_length=args.context_length, train=False, no_aug=True,
            image_size=args.resolution, load_action=args.action_conditioned,
            seed=args.seed + 99)
        val_iter = val_loader

    def run_validation(step):
        """Held-out loss/perplexity every validation_steps
        (reference train_gpt.py:842-843)."""
        agg = {}
        for _ in range(4):
            vb = next(val_iter)
            vp, va = vb if args.action_conditioned else (vb, None)
            vids, vlabels = tokenize(tok_params, jnp.asarray(vp))
            b = {"input_ids": vids, "labels": vlabels}
            if va is not None:
                b["action"] = jnp.asarray(va)
            m = eval_step(state.params, global_batch(b, mesh))
            for k, v in m.items():
                agg[f"eval_{k}"] = agg.get(f"eval_{k}", 0.0) + float(v) / 4
        if args.validation_generation:
            # full generation eval + prediction GIFs every validation_steps
            # (reference train_gpt.py:322,442-451,842). evaluate() computes
            # process-locally (each process evals its own loader stream and
            # features are gathered, like --eval_only), so in multi-process
            # runs it must not see globally-sharded params mixed with local
            # batches: hand it a host-replicated copy. params_to_host is a
            # collective — all processes reach this point together.
            eval_params = (state.params if jax.process_count() == 1
                           else params_to_host(state.params))
            gen_metrics = evaluate(
                args, tokenizer, tok_cfg, tok_params, model, eval_params,
                val_loader, max_batches=args.validation_eval_batches,
                gif_dir=os.path.join(args.output_dir, "samples"), step=step)
            agg.update({f"gen_{k}": v for k, v in gen_metrics.items()})
        if logger:
            logger.log(agg, step)

    print(f"training on mesh {mesh.shape}; LM params "
          f"{sum(x.size for x in jax.tree.leaves(state.params))/1e6:.1f}M")

    t_end = time.time()
    for i, batch in enumerate(loader):
        if global_step >= args.max_train_steps:
            break
        if args.action_conditioned:
            pixels, actions = batch
        else:
            pixels, actions = batch, None
        px = jnp.asarray(pixels)
        ids, labels = tokenize(tok_params, px)  # frozen tokenizer, no grads
        train_batch = {"input_ids": ids, "labels": labels}
        if actions is not None:
            train_batch["action"] = jnp.asarray(actions)
        train_batch = global_batch(train_batch, mesh)

        step_rng = jax.random.fold_in(jax.random.key(args.seed), i)
        if args.lora:
            lora_params, lora_opt_state, metrics = lora_step(
                state.params, lora_params, lora_opt_state, train_batch,
                step_rng)
        else:
            state, metrics = step_fn(state, train_batch, step_rng)
        global_step += 1

        if global_step % args.log_steps == 0:
            dt = time.time() - t_end
            t_end = time.time()
            metrics = dict(metrics)
            metrics["samples_per_sec"] = (
                args.log_steps * global_bs / max(dt, 1e-9))
            if logger:
                logger.log(metrics, global_step)

        if global_step % args.validation_steps == 0:
            run_validation(global_step)

        if global_step % args.checkpointing_steps == 0:
            # guard: only checkpoint on sane loss (reference train_gpt.py:827).
            # Loss is psum'd, so every process takes the same branch; Orbax
            # save + the host gather are collectives and run on ALL processes
            # (only pruning/safetensors-writing are process-0-only).
            if float(metrics["loss"]) < 4.0 or global_step <= args.checkpointing_steps:
                ckpt_lib.save_train_state(args.output_dir, global_step, state,
                                          keep=args.checkpoints_total_limit)
                host_params = params_to_host(state.params)
                if is_main_process():
                    from ivideogpt_tpu.utils.checkpoint import \
                        flax_to_torch_action_model, _write_safetensors
                    _write_safetensors(
                        os.path.join(args.output_dir, "transformer",
                                     "model.safetensors"),
                        flax_to_torch_action_model(host_params))
                    with open(os.path.join(args.output_dir, "transformer",
                                           "config.json"), "w") as f:
                        f.write(lm_cfg.to_json())

    loader.close()
    print("done")


if __name__ == "__main__":
    main()
