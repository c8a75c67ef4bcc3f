"""Tokenizer (compressive VQGAN) training driver.

TPU-native equivalent of reference train_tokenizer.py:290-1008: alternating
generator/discriminator optimization with recon + perceptual + commit + GAN
losses (adaptive disc weight), EMA option, periodic validation with image
grids, checkpoint/resume.

DDP/accelerate is replaced by GSPMD data parallelism over a ("data",) mesh;
every host samples independently by RNG (the reference's regime,
train_tokenizer.py:525).

Usage (mirrors scripts/pretrain/oxe-64-act-free.sh stage 1):
  python train_tokenizer.py --dataset_name select --dataset_path /data/oxe \
      --resolution 64 --segment_length 8 --context_length 2 --batch_size 16
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
    # model
    p.add_argument("--model_config", type=str, default=None,
                   help="json config; default: built-in 64px/256px tokenizer")
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--context_length", type=int, default=2)
    p.add_argument("--segment_length", type=int, default=8)
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None)
    # data
    p.add_argument("--dataset_name", type=str, default="debug")
    p.add_argument("--dataset_path", type=str, default="/data")
    p.add_argument("--video_stepsize", type=int, default=1)
    p.add_argument("--segment_horizon", type=int, default=None)
    p.add_argument("--random_selection", action="store_true")
    p.add_argument("--random_shuffle", action="store_true")
    p.add_argument("--goal_conditioned", action="store_true")
    p.add_argument("--no_aug", action="store_true")
    p.add_argument("--dataloader_num_workers", type=int, default=8)
    # optimization
    p.add_argument("--train_batch_size", "--batch_size", dest="batch_size",
                   type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=5e-4)
    p.add_argument("--disc_learning_rate", "--discr_learning_rate",
                   dest="disc_learning_rate", type=float, default=5e-4)
    p.add_argument("--lr_scheduler", type=str, default="constant")
    p.add_argument("--discr_lr_scheduler", type=str, default=None,
                   help="discriminator schedule kind (reference "
                   "train_tokenizer.py:181, default constant_with_warmup); "
                   "defaults to --lr_scheduler")
    p.add_argument("--lr_warmup_steps", type=int, default=1000)
    p.add_argument("--scale_lr", action="store_true",
                   help="scale lr by batch * processes * grad-accum "
                   "(reference train_tokenizer.py:403-406)")
    p.add_argument("--max_train_steps", type=int, default=1_000_000)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--gradient_checkpointing", action="store_true",
                   help="remat conv blocks in backward (the 256px "
                   "tokenizer's memory lever; reference "
                   "train_tokenizer.py:167)")
    p.add_argument("--mixed_precision", type=str, default="no",
                   choices=["bf16", "no"],
                   help="bf16 compute over fp32 master params (the "
                   "reference's accelerate autocast regime; every "
                   "published recipe passes bf16). Losses, VQ distances "
                   "and norm stats stay fp32 either way.")
    p.add_argument("--recon_weight", type=float, default=1.0)
    p.add_argument("--perc_weight", type=float, default=1.0)
    p.add_argument("--disc_weight", type=float, default=0.1)
    p.add_argument("--disc_start", type=int, default=0)
    p.add_argument("--disc_depth", type=int, default=4)
    p.add_argument("--no_balanced_loss", dest="balanced_loss",
                   action="store_false")
    p.add_argument("--vae_loss", type=str, default="l1", choices=["l1", "l2"])
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--weight_decay", "--adam_weight_decay",
                   dest="weight_decay", type=float, default=1e-4)
    # bookkeeping
    p.add_argument("--output_dir", type=str, default="outputs/tokenizer")
    p.add_argument("--exp_name", type=str, default=None,
                   help="run name: output goes to "
                   "output_dir/<timestamp>-<exp_name> (reference "
                   "train_tokenizer.py:296)")
    p.add_argument("--checkpointing_steps", type=int, default=10000)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--validation_steps", type=int, default=2500)
    p.add_argument("--log_steps", type=int, default=50)
    p.add_argument("--log_grad_norm_steps", type=int, default=500,
                   help="per-submodule grad-norm dump cadence (reference "
                   "train_tokenizer.py:125,747)")
    p.add_argument("--log_image_steps", type=int, default=100,
                   help="train-batch recon grid cadence (reference "
                   "train_tokenizer.py:134,869)")
    p.add_argument("--resume_from_checkpoint", type=str, default=None,
                   help="'latest' or a checkpoint dir")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--lpips_weights", type=str, default=None,
                   help="torchvision vgg16 .pth for real LPIPS")
    # distribution (replaces accelerate launch DDP, reference
    # scripts/pretrain/oxe-64-act-free.sh:1)
    p.add_argument("--n_model", type=int, default=1,
                   help="tensor-parallel size (model mesh axis)")
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    # reference-script aliases + compat shims: the published recipes run
    # unmodified (CUDA-/HF-launcher-only knobs are accepted and ignored)
    p.add_argument("--model_type", type=str, default="ctx_vqgan",
                   choices=["ctx_vqgan"],
                   help="compat: only the compressive tokenizer exists")
    p.add_argument("--oxe_data_mixes_type", dest="dataset_name",
                   default=argparse.SUPPRESS,
                   help="reference spelling of --dataset_name")
    p.add_argument("--rand_select", dest="random_selection",
                   action="store_true", default=argparse.SUPPRESS,
                   help="reference spelling of --random_selection")
    p.add_argument("--sthsth_root_path", type=str, default=None,
                   help="SSv2 frame-folder root for the select_sthsth mix")
    p.add_argument("--model_config_name_or_path", dest="model_config",
                   default=argparse.SUPPRESS,
                   help="reference spelling of --model_config")
    for flag, kw in [
            ("--num_train_epochs", dict(type=int)),
            ("--report_to", dict(type=str)),
            ("--tracker_project_name", dict(type=str)),
            ("--logging_dir", dict(type=str)),
            ("--cache_dir", dict(type=str)),
            ("--local_rank", dict(type=int)),
            ("--discriminator_config_name_or_path", dict(type=str)),
            ("--allow_tf32", dict(action="store_true")),
            ("--use_8bit_adam", dict(action="store_true")),
            ("--enable_xformers_memory_efficient_attention",
             dict(action="store_true"))]:
        p.add_argument(flag, default=None,
                       help="compat shim (no TPU equivalent; ignored)", **kw)
    return p.parse_args()


def _dump_recon_grid(args, batch, dec, path):
    """GT row over recon row for the first sample's future frames
    (reference train_tokenizer.py:869-905 image grids)."""
    import imageio
    F_ = args.segment_length - args.context_length
    gt = np.asarray(batch[0, args.context_length:], dtype=np.float32)
    rc = np.clip(np.asarray(dec[:F_], dtype=np.float32), 0, 1)
    grid = np.concatenate([
        np.concatenate(list(gt), axis=1),
        np.concatenate(list(rc), axis=1)], axis=0)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    imageio.imwrite(path, (grid * 255).astype(np.uint8))


def main():
    args = parse_args()
    import jax
    from ivideogpt_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("IVG_JAX_CACHE", "/tmp/ivg_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ivideogpt_tpu.configs import (CompressiveVQConfig,
                                       DiscriminatorConfig,
                                       TokenizerTrainConfig, TOKENIZER_64,
                                       TOKENIZER_256)
    from ivideogpt_tpu.data import InfiniteDataLoader
    from ivideogpt_tpu.data.dataset_mixes import resolve_mix
    from ivideogpt_tpu.models.discriminator import Discriminator
    from ivideogpt_tpu.models.lpips import LPIPS, load_torch_lpips
    from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
    from ivideogpt_tpu.parallel import (global_batch, is_main_process,
                                        make_global_mesh, maybe_initialize,
                                        params_to_host, shard_params)
    from ivideogpt_tpu.train.optim import (TrainState, ema_update,
                                           make_optimizer)

    # multi-process bootstrap MUST precede any other JAX call
    maybe_initialize(args.coordinator_address, args.num_processes,
                     args.process_id)
    from ivideogpt_tpu.train.tokenizer_trainer import (
        make_discriminator_step, make_eval_step, make_generator_step)
    from ivideogpt_tpu.utils import checkpoint as ckpt_lib

    if args.exp_name:
        # timestamped run dir (reference train_tokenizer.py:296); stamp
        # broadcast from process 0 and rendered in UTC so all hosts build
        # the same ckpt path regardless of per-host TZ settings
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
    from ivideogpt_tpu.utils.loggers import TrainLogger
    logger = None  # created after the (optional) multi-process bootstrap

    # ---- config -----------------------------------------------------------
    if args.model_config:
        with open(args.model_config) as f:
            tok_cfg = CompressiveVQConfig.from_json(f.read())
    else:
        tok_cfg = (TOKENIZER_256 if args.resolution == 256 else TOKENIZER_64)
        tok_cfg = tok_cfg.replace(context_length=args.context_length)
    if args.gradient_checkpointing:
        tok_cfg = tok_cfg.replace(remat=True)
    if args.scale_lr:
        # reference train_tokenizer.py:403-406 (num_processes there is the
        # DDP world size; here the data-parallel extent of the mesh)
        n_data_for_lr = (jax.device_count() // max(args.n_model, 1))
        args.learning_rate *= (args.batch_size * n_data_for_lr
                               * args.gradient_accumulation_steps)
        args.disc_learning_rate *= (args.batch_size * n_data_for_lr
                                    * args.gradient_accumulation_steps)
    train_cfg = TokenizerTrainConfig(
        batch_size=args.batch_size, segment_length=args.segment_length,
        context_length=args.context_length,
        learning_rate=args.learning_rate, lr_scheduler=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps,
        max_train_steps=args.max_train_steps,
        max_grad_norm=args.max_grad_norm, recon_weight=args.recon_weight,
        perc_weight=args.perc_weight, disc_weight=args.disc_weight,
        disc_start=args.disc_start, balanced_loss=args.balanced_loss,
        vae_loss=args.vae_loss, weight_decay=args.weight_decay)

    # ---- models -----------------------------------------------------------
    # bf16 compute over fp32 master params mirrors the reference's
    # accelerate autocast (every published recipe passes --mixed_precision
    # bf16); loss reductions, VQ distances and BN stats stay fp32 inside
    # the models/trainer either way
    cdtype = jnp.bfloat16 if args.mixed_precision == "bf16" else jnp.float32
    model = CompressiveVQModel(tok_cfg, dtype=cdtype)
    disc = Discriminator(DiscriminatorConfig(depth=args.disc_depth),
                         dtype=cdtype)
    lpips = LPIPS(dtype=cdtype)

    rng = jax.random.key(args.seed)
    H = args.resolution
    F = args.segment_length - args.context_length
    dummy_ctx = jnp.zeros((args.context_length, H, H, 3), jnp.float32)
    dummy_fut = jnp.zeros((F, H, H, 3), jnp.float32)
    if args.pretrained_model_name_or_path:
        # finetuning at a smaller context than the checkpoint (e.g. the
        # BAIR recipe finetunes the ctx=2 OXE tokenizer at ctx=1): load
        # with the cross-attention kv pos-embs re-sliced (reference
        # video_predictor.py:52-56, scripts/finetune/bair-64-act-cond.sh);
        # errors clearly if asked to GROW the context
        params, _ = ckpt_lib.load_tokenizer_for_context(
            args.pretrained_model_name_or_path, args.context_length)
    else:
        params = jax.jit(model.init, static_argnames="segment_len")(
            rng, dummy_ctx, dummy_fut, segment_len=F)
    disc_vars = disc.init(jax.random.key(args.seed + 1),
                          jnp.zeros((2, H, H, 3), jnp.float32))
    disc_params = {"params": disc_vars["params"]}
    disc_stats = {k: v for k, v in disc_vars.items() if k != "params"}
    lpips_params = lpips.init(jax.random.key(args.seed + 2),
                              jnp.zeros((1, H, H, 3)), jnp.zeros((1, H, H, 3)))
    lpips_params, loaded = load_torch_lpips(lpips_params, args.lpips_weights)
    if not loaded:
        print("[warn] LPIPS running with random-init VGG (no weights file); "
              "perceptual loss is a proxy")

    adam_kw = dict(b1=args.adam_beta1, b2=args.adam_beta2,
                   eps=args.adam_epsilon)
    tx, sched = make_optimizer(
        params, learning_rate=train_cfg.learning_rate,
        lr_scheduler=train_cfg.lr_scheduler,
        warmup_steps=train_cfg.lr_warmup_steps,
        total_steps=train_cfg.max_train_steps,
        weight_decay=train_cfg.weight_decay,
        max_grad_norm=train_cfg.max_grad_norm,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        **adam_kw)
    disc_tx, _ = make_optimizer(
        disc_params["params"], learning_rate=args.disc_learning_rate,
        lr_scheduler=args.discr_lr_scheduler or train_cfg.lr_scheduler,
        warmup_steps=train_cfg.lr_warmup_steps,
        total_steps=train_cfg.max_train_steps,
        weight_decay=train_cfg.weight_decay,
        max_grad_norm=train_cfg.max_grad_norm,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        **adam_kw)
    state = TrainState.create(params, tx)
    disc_state = TrainState.create(disc_params["params"], disc_tx)
    ema_params = jax.tree_util.tree_map(jnp.copy, params) if args.use_ema \
        else None

    def full_state_tree(step_count, data_iter):
        """EVERYTHING the run needs to continue: generator + discriminator
        TrainStates, BN stats, EMA params, and loop counters (the
        reference's accelerator.save_state scope, train_tokenizer.py:106-112).
        """
        tree = {"gen_params": state.params, "gen_opt": state.opt_state,
                "disc_params": disc_state.params,
                "disc_opt": disc_state.opt_state,
                "disc_stats": disc_stats,
                "step": np.asarray(step_count),
                "data_iter": np.asarray(data_iter)}
        if args.use_ema:
            tree["ema_params"] = ema_params
        return tree

    global_step = 0
    resume_data_iter = 0
    if args.resume_from_checkpoint:
        path = (ckpt_lib.latest_checkpoint(args.output_dir)
                if args.resume_from_checkpoint == "latest"
                else args.resume_from_checkpoint)
        if path:
            restored = ckpt_lib.restore_pytree_checkpoint(
                path, full_state_tree(0, 0))
            state = state.replace(params=restored["gen_params"],
                                  opt_state=restored["gen_opt"],
                                  step=jnp.asarray(int(restored["step"]),
                                                   jnp.int32))
            disc_state = disc_state.replace(params=restored["disc_params"],
                                            opt_state=restored["disc_opt"])
            disc_stats = restored["disc_stats"]
            if args.use_ema:
                ema_params = restored["ema_params"]
            global_step = int(restored["step"])
            resume_data_iter = int(restored["data_iter"])
            print(f"resumed from {path} at step {global_step}")

    # ---- mesh + data --------------------------------------------------
    mesh = make_global_mesh(n_model=args.n_model)
    n_data = mesh.shape["data"]
    global_bs = args.batch_size * n_data  # batch_size is per DP device
    assert global_bs % jax.process_count() == 0
    local_bs = global_bs // jax.process_count()

    mix = resolve_mix(args.dataset_name, args.dataset_path)
    loader = InfiniteDataLoader(
        args.dataset_path, mix, batch_size=local_bs,
        num_workers=args.dataloader_num_workers, stepsize=args.video_stepsize,
        segment_length=args.segment_length,
        context_length=args.context_length,
        segment_horizon=args.segment_horizon,
        random_selection=args.random_selection,
        random_shuffle=args.random_shuffle,
        goal_conditioned=args.goal_conditioned,
        random_resized_crop_scale=(0.8, 1.0),
        random_resized_crop_ratio=(0.9, 1.1),
        no_aug=args.no_aug, image_size=args.resolution,
        sthsth_root_path=args.sthsth_root_path,
        seed=args.seed + jax.process_index() * 9973)

    # ---- steps ------------------------------------------------------------
    state = state.replace(params=shard_params(state.params, mesh))
    logger = TrainLogger(args.output_dir) if is_main_process() else None
    gen_step_nogan = make_generator_step(model, disc, lpips, lpips_params,
                                         train_cfg, use_gan=False)
    gen_step_gan = make_generator_step(model, disc, lpips, lpips_params,
                                       train_cfg, use_gan=True)
    disc_step = make_discriminator_step(model, disc, train_cfg)
    eval_step = make_eval_step(model, lpips, lpips_params, train_cfg)

    eval_loader = InfiniteDataLoader(
        args.dataset_path, mix, batch_size=local_bs, num_workers=1,
        stepsize=args.video_stepsize, segment_length=args.segment_length,
        context_length=args.context_length, train=False,
        no_aug=True, image_size=args.resolution,
        sthsth_root_path=args.sthsth_root_path, seed=args.seed + 99)

    def run_validation(step):
        """Recon metrics over eval batches + an image grid
        (reference train_tokenizer.py:869-1007)."""
        agg = {}
        n_eval = 4
        dec = ref_dec = batch = None
        for _ in range(n_eval):
            batch = jnp.asarray(next(eval_loader))
            m, dec, ref_dec = eval_step(state.params,
                                        global_batch(batch, mesh))
            for k, v in m.items():
                agg[k] = agg.get(k, 0.0) + float(v) / n_eval
        agg["step"] = step
        print(json.dumps({k: round(v, 5) if isinstance(v, float) else v
                          for k, v in agg.items()}))
        # GT-over-recon image grid for the last batch's first sample
        try:
            _dump_recon_grid(args, batch, dec,
                             os.path.join(args.output_dir, "recon",
                                          f"step{step}.png"))
        except Exception as e:  # visuals must never kill training
            print(f"[warn] recon grid failed: {e}")

    print(f"training on mesh {mesh.shape}; "
          f"params {sum(x.size for x in jax.tree.leaves(params))/1e6:.1f}M")

    # ---- loop (G/D alternate per accumulation window,
    #            reference train_tokenizer.py:588) --------------------------
    log = {}
    t_end = time.time()
    data_it = iter(loader)
    if resume_data_iter:
        # replay the deterministic sample stream to the resume point so the
        # resumed trajectory continues exactly (same loader seed). Batch
        # ORDER is only deterministic with one worker — with >1 workers the
        # prefetch queue interleaves by thread scheduling, so the replayed
        # stream would not match the pre-crash one.
        if args.dataloader_num_workers > 1:
            print("[warn] exact-resume replay with dataloader_num_workers="
                  f"{args.dataloader_num_workers}: batch order is not "
                  "deterministic across workers; the resumed trajectory "
                  "continues from equivalent-distribution batches, not the "
                  "exact pre-crash stream (use 1 worker for exactness)")
        for _ in range(resume_data_iter):
            next(data_it)
    for i, batch in enumerate(data_it, start=resume_data_iter):
        if global_step >= args.max_train_steps:
            break
        pixels = global_batch(jnp.asarray(batch), mesh)
        generator_step = ((i // args.gradient_accumulation_steps) % 2) == 0
        step_rng = jax.random.fold_in(jax.random.key(args.seed), i)

        if generator_step:
            fn = gen_step_gan if global_step >= args.disc_start else gen_step_nogan
            disc_all = {"params": disc_state.params, **disc_stats}
            state, metrics = fn(state, disc_all, pixels, step_rng)
            if args.use_ema:
                ema_params = ema_update(ema_params, state.params,
                                        args.ema_decay)
        else:
            if global_step >= args.disc_start:
                disc_state, disc_stats, metrics = disc_step(
                    disc_state, disc_stats, state.params, pixels, step_rng)
            else:
                metrics = {}
        # every optimizer step (G or D) advances the counter, matching the
        # reference's sync_gradients accounting (train_tokenizer.py:804-806)
        global_step += 1

        # per-submodule grad norms only at the log_grad_norm_steps cadence
        # (reference train_tokenizer.py:747-748)
        # G and D alternate, so "every N steps" must catch whichever
        # parity the generator lands on
        keep_gnorms = (args.log_grad_norm_steps
                       and global_step % args.log_grad_norm_steps in (0, 1))
        log.update({k: float(v) for k, v in metrics.items()
                    if keep_gnorms or not k.startswith("grad_norm/")})

        if generator_step and args.log_image_steps \
                and (global_step - 1) % args.log_image_steps == 0:
            # train-batch recon grid (reference train_tokenizer.py:869;
            # deterministic re-forward of the current batch)
            try:
                _, dec_img, _ = eval_step(state.params, pixels)
                _dump_recon_grid(args, pixels, dec_img,
                                 os.path.join(args.output_dir, "train_recon",
                                              f"step{global_step}.png"))
            except Exception as e:  # visuals must never kill training
                print(f"[warn] train recon grid failed: {e}")

        if not generator_step and global_step % args.log_steps == 0:
            dt = time.time() - t_end
            t_end = time.time()
            log["samples/sec"] = args.log_steps * global_bs * 2 / max(dt, 1e-9)
            if logger:
                logger.log(log, global_step)
            # grad norms appear only in the emission right after their
            # cadence step — `log` persists across emissions, so without
            # this pop every later line would re-emit stale values
            for k in [k for k in log if k.startswith("grad_norm/")]:
                del log[k]

        if not generator_step and global_step % args.validation_steps == 0 \
                and global_step > 0:
            run_validation(global_step)

        if not generator_step and global_step % args.checkpointing_steps == 0 \
                and global_step > 0:
            # Orbax save + host gather are collectives: every process calls
            # them (Orbax barriers internally; primary host writes metadata).
            # Only pruning and the safetensors export are process-0-only.
            ckpt_lib.save_pytree_checkpoint(
                args.output_dir, global_step, full_state_tree(global_step, i + 1),
                keep=args.checkpoints_total_limit)
            export = params_to_host(
                ema_params if args.use_ema else state.params)
            if is_main_process():
                ckpt_lib.export_tokenizer_safetensors(
                    export, os.path.join(args.output_dir, "tokenizer",
                                         "model.safetensors"))
                with open(os.path.join(args.output_dir, "tokenizer",
                                       "config.json"), "w") as f:
                    f.write(tok_cfg.to_json())

    loader.close()
    print("done")


if __name__ == "__main__":
    main()
