"""Worker for the 2-process jax.distributed test (spawned as a subprocess).

Each process owns 2 virtual CPU devices; together they form one global
4-device ("data", "model") mesh. Trains 3 steps on a deterministic batch
and prints the loss trajectory as one JSON line.

Modes (--mode):
  gpt (default)  tiny action model, CE train steps (reference
                 train_gpt.py:766-804's hot loop under DDP)
  tokenizer      tiny compressive VQGAN, ALTERNATING G/D steps with the GAN
                 active: two optimizers, spectral-norm power-iteration
                 state, LPIPS, and the adaptive-weight targeted VJPs — the
                 fiddliest step in the codebase under GSPMD (reference
                 train_tokenizer.py:526-528's DDP wrap being replaced)

Single-process reference mode: --num_processes 1 runs the identical
computation on a 4-device single-process mesh; the multi-process losses must
match it (this is what DDP-style data parallelism guarantees — reference
train_gpt.py:672-679 via accelerate; here GSPMD collectives over the mesh).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", type=str, required=True)
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--n_model", type=int, default=1)
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="save an orbax checkpoint after step 2 (on ALL "
                        "processes — fences the multihost save-barrier "
                        "deadlock), restore it, and finish from the restore")
    p.add_argument("--mode", type=str, default="gpt",
                   choices=("gpt", "tokenizer"))
    args = p.parse_args()

    n_local = 4 // args.num_processes
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_local}").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ivideogpt_tpu.parallel import (global_batch, make_global_mesh,
                                        maybe_initialize, shard_params)
    from ivideogpt_tpu.configs import ActionModelConfig, TransformerConfig
    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    from ivideogpt_tpu.train.gpt_trainer import make_train_step
    from ivideogpt_tpu.train.optim import TrainState, make_optimizer
    from ivideogpt_tpu import tokens

    if args.num_processes > 1:
        assert maybe_initialize(args.coordinator, args.num_processes,
                                args.process_id)
        assert jax.process_count() == args.num_processes
    mesh = make_global_mesh(n_model=args.n_model)
    assert len(mesh.devices.flat) == 4

    if args.mode == "tokenizer":
        return run_tokenizer(args, mesh)

    ctx, T = 2, 4
    lm_cfg = TransformerConfig(
        vocab_size=64 + 64 + 2, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128)
    head = ActionModelConfig(action_dim=4, context_length=ctx,
                             segment_length=T, tokens_per_context=16,
                             tokens_per_dyna=4)
    model = HeadModelWithAction(lm_cfg, head)

    GB = 8  # global batch
    L = tokens.seq_len(ctx, T, ctx_tokens=16, dyn_tokens=4)
    rng = np.random.default_rng(0)
    input_ids = rng.integers(0, 128, (GB, L)).astype(np.int32)
    action = rng.normal(size=(GB, T, 4)).astype(np.float32)

    params = model.init(jax.random.key(0),
                        jnp.asarray(input_ids), jnp.asarray(input_ids),
                        jnp.asarray(action))
    tx, _ = make_optimizer(params, learning_rate=1e-3, warmup_steps=1,
                           total_steps=10, weight_decay=0.01)
    state = TrainState.create(params, tx)
    state = state.replace(
        params=shard_params(state.params, mesh),
        opt_state=jax.device_put(state.opt_state, NamedSharding(mesh, P())),
        step=jax.device_put(state.step, NamedSharding(mesh, P())))

    # each process feeds only ITS slice of the deterministic global batch
    lo = args.process_id * (GB // args.num_processes)
    hi = lo + GB // args.num_processes
    step_fn = make_train_step(model, action_conditioned=True)

    from ivideogpt_tpu.utils import checkpoint as ckpt_lib

    losses = []
    for i in range(3):
        batch = global_batch(
            {"input_ids": input_ids[lo:hi], "labels": input_ids[lo:hi],
             "action": action[lo:hi]}, mesh)
        state, metrics = step_fn(state, batch, jax.random.key(1 + i))
        losses.append(float(metrics["loss"]))
        if args.ckpt_dir and i == 1:
            # the save is a collective: EVERY process calls it with the
            # globally-sharded state (orbax writes from the primary host).
            # A rank-0-only call deadlocks in the sync barrier — the bug
            # class this flag exists to fence.
            ckpt_lib.save_train_state(args.ckpt_dir, i + 1, state)
    if args.ckpt_dir:
        path = ckpt_lib.latest_checkpoint(args.ckpt_dir)
        restored = ckpt_lib.restore_train_state(path, state)
        assert int(restored.step) == 2, int(restored.step)
        # finish step 3 from the restore: must reproduce losses[2]
        batch = global_batch(
            {"input_ids": input_ids[lo:hi], "labels": input_ids[lo:hi],
             "action": action[lo:hi]}, mesh)
        _, metrics = step_fn(restored, batch, jax.random.key(3))
        losses.append(float(metrics["loss"]))
    if jax.process_index() == 0:
        print(json.dumps({"losses": losses}))


def run_tokenizer(args, mesh):
    """3 alternating G/D steps (GAN active) of a tiny compressive VQGAN,
    data-parallel over the global mesh. Prints [gen, disc, gen] losses."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ivideogpt_tpu.parallel import global_batch
    from ivideogpt_tpu.configs import (CompressiveVQConfig,
                                       DiscriminatorConfig,
                                       TokenizerTrainConfig)
    from ivideogpt_tpu.models.discriminator import Discriminator
    from ivideogpt_tpu.models.lpips import LPIPS
    from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
    from ivideogpt_tpu.train.optim import TrainState, make_optimizer
    from ivideogpt_tpu.train.tokenizer_trainer import (
        make_discriminator_step, make_generator_step)

    ctx, T = 2, 4
    F = T - ctx
    res = 32
    tok_cfg = CompressiveVQConfig(
        block_out_channels=(16, 32, 32), layers_per_block=1,
        latent_channels=8, num_vq_embeddings=64, num_dyn_embeddings=64,
        norm_num_groups=8, mid_block_add_attention=False, context_length=ctx,
        resolution=res, max_att_resolution=8, patch_size=4)
    train_cfg = TokenizerTrainConfig(segment_length=T, context_length=ctx,
                                     disc_start=0)
    model = CompressiveVQModel(tok_cfg, use_pallas=False)
    disc = Discriminator(DiscriminatorConfig(depth=3, hidden_channels=64))
    lpips = LPIPS()

    GB = 8
    rng = np.random.default_rng(0)
    pixels = rng.uniform(0, 1, (GB, T, res, res, 3)).astype(np.float32)

    params = model.init(jax.random.key(0),
                        jnp.zeros((ctx, res, res, 3), jnp.float32),
                        jnp.zeros((F, res, res, 3), jnp.float32),
                        segment_len=F)
    disc_vars = disc.init(jax.random.key(1),
                          jnp.zeros((2, res, res, 3), jnp.float32))
    disc_stats = {k: v for k, v in disc_vars.items() if k != "params"}
    lpips_params = lpips.init(jax.random.key(2),
                              jnp.zeros((1, res, res, 3)),
                              jnp.zeros((1, res, res, 3)))

    tx, _ = make_optimizer(params, learning_rate=1e-3, warmup_steps=1,
                           total_steps=10, weight_decay=1e-4)
    disc_tx, _ = make_optimizer(disc_vars["params"], learning_rate=1e-3,
                                warmup_steps=1, total_steps=10,
                                weight_decay=1e-4)
    state = TrainState.create(params, tx)
    disc_state = TrainState.create(disc_vars["params"], disc_tx)

    # replicate everything (pure DP, the reference's regime); pixels shard
    # on "data" and GSPMD inserts the gradient all-reduces
    rep = NamedSharding(mesh, P())
    put = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, t)
    state = state.replace(params=put(state.params),
                          opt_state=put(state.opt_state),
                          step=jax.device_put(state.step, rep))
    disc_state = disc_state.replace(params=put(disc_state.params),
                                    opt_state=put(disc_state.opt_state),
                                    step=jax.device_put(disc_state.step, rep))
    disc_stats = put(disc_stats)
    lpips_params = put(lpips_params)

    gen_step = make_generator_step(model, disc, lpips, lpips_params,
                                   train_cfg, use_gan=True)
    disc_step = make_discriminator_step(model, disc, train_cfg)

    lo = args.process_id * (GB // args.num_processes)
    hi = lo + GB // args.num_processes

    losses = []
    for i in range(3):
        px = global_batch(pixels[lo:hi], mesh)
        step_rng = jax.random.fold_in(jax.random.key(42), i)
        if i % 2 == 0:  # generator window (reference train_tokenizer.py:588)
            disc_all = {"params": disc_state.params, **disc_stats}
            state, metrics = gen_step(state, disc_all, px, step_rng)
            losses.append(float(metrics["gen_loss"]))
        else:
            disc_state, disc_stats, metrics = disc_step(
                disc_state, disc_stats, state.params, px, step_rng)
            losses.append(float(metrics["discr_loss"]))
    if jax.process_index() == 0:
        print(json.dumps({"losses": losses}))


if __name__ == "__main__":
    main()
