"""Multi-chip sharded inference — the serving path.

The reference's multi-GPU inference is HF Accelerate data parallelism:
each GPU holds a full model replica and generates its local slice of the
eval batch (reference train_gpt.py:672-679 driving `accelerator`, used by
the evaluation scripts).  The TPU-native generalization is one
``("data", "model")`` mesh for the whole rollout pipeline:

- the rollout batch splits across ``data`` (pure DP — the Accelerate
  regime, bitwise-identical per sample);
- the LM projections may additionally split across ``model``
  (tensor parallelism the reference never had): QKV/gate/up shard on the
  output feature dim, o/down on the input dim, so GSPMD inserts one
  psum per attention/MLP block and the KV cache shards on the head axis
  for free via propagation.

``generation.generate`` is already a single jitted program (prefill +
per-frame token scans); no rewrite is needed for multi-chip — placing its
operands with explicit shardings is the whole serving story.  GSPMD
propagates the placement through the KV cache, the bit-search top-k
(count psums over the vocab shards) and the sampled-token stream.

Throughput note: TP pays one psum per block per decoded token over ICI;
for the 138M flagship the decode is HBM-bound on cache reads, so TP's
win is cache-bytes-per-chip (B and H both split), enabling batches a
single chip cannot hold — the standard serving trade.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ivideogpt_tpu import generation
from ivideogpt_tpu.parallel import mesh as mesh_lib


def _check_batch(B: int, mesh: Mesh) -> None:
    n_data = mesh.shape["data"]
    if B % n_data != 0:
        raise ValueError(
            f"rollout batch {B} not divisible by the data axis {n_data}; "
            f"pad the batch or reshape the mesh")


def place_inference_params(params, mesh: Mesh):
    """Place LM params for serving: TP rules on the big projections.

    Same placement rules as training (`mesh.param_spec`); exposed under a
    serving name so callers don't reach into the trainer's module.
    """
    return mesh_lib.shard_params(params, mesh)


def sharded_generate(model, params, prelude_tokens, rng, *, mesh: Mesh,
                     action: Optional[jax.Array] = None,
                     **generate_kwargs) -> generation.GenerateResult:
    """`generation.generate` over a ("data", "model") mesh.

    prelude_tokens/action shard on "data"; params are placed per the TP
    rules if not already committed to `mesh`. The returned token stream
    (and rewards) come back sharded on "data".
    """
    _check_batch(prelude_tokens.shape[0], mesh)
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    prelude_tokens = jax.device_put(prelude_tokens, data)
    if action is not None:
        action = jax.device_put(action, data)
    rng = jax.device_put(rng, repl)
    # always (re-)place: device_put on an array already carrying the target
    # sharding is a no-op, and guessing "already placed" from one leaf's
    # mesh silently skips the TP specs for replicated/batch-sharded trees
    params = place_inference_params(params, mesh)
    return generation.generate(model, params, prelude_tokens, rng,
                               action=action, **generate_kwargs)


@functools.lru_cache(maxsize=16)
def _tokenizer_fns(tokenizer, context_length: int):
    """Jitted tokenizer prelude/detokenize, cached per (module, ctx).

    flax Modules hash by construction args, so repeated `sharded_rollout`
    calls on the same tokenizer reuse the compiled conv programs instead
    of tracing fresh lambdas (and recompiling) every rollout.
    """
    from ivideogpt_tpu import tokens as tokens_lib

    cfg = tokenizer.config
    prelude = jax.jit(lambda p, x: tokens_lib.make_prelude(
        tokenizer.apply(p, x, method=tokenizer.encode_context),
        cfg.num_vq_embeddings, cfg.num_dyn_embeddings))
    detok = jax.jit(lambda p, i: tokenizer.apply(
        p, i, context_length, method=tokenizer.detokenize))
    return prelude, detok


def sharded_rollout(tokenizer, tok_params, model, lm_params, pixels, rng,
                    *, mesh: Mesh, segment_length: int, context_length: int,
                    action: Optional[jax.Array] = None,
                    **generate_kwargs):
    """Full serving pipeline on a mesh: tokenize ctx -> generate -> detokenize.

    The multi-chip version of the `inference/predict.py` flow (reference
    inference/predict.py:101-131): context pixels [B, ctx, H, W, 3] in,
    predicted frames [B, T, H, W, 3] out, batch split across "data"
    end-to-end (the tokenizer runs DP; its params replicate — conv nets
    don't TP-shard under these rules and are a rounding error of the
    rollout cost).

    Returns (frames, GenerateResult).
    """
    _check_batch(pixels.shape[0], mesh)
    data = NamedSharding(mesh, P("data"))
    pixels = jax.device_put(pixels, data)
    tok_params = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tok_params)

    # the dynamics codes live at latent_resolution/patch_size, NOT at
    # max_att_resolution (which only gates where encoder attention turns
    # on — the two coincide at 64px but diverge for TOKENIZER_256)
    dyn = tokenizer.config.dyn_tokens_per_frame

    prelude_fn, detok_fn = _tokenizer_fns(tokenizer, context_length)
    prelude = prelude_fn(tok_params, pixels)
    res = sharded_generate(
        model, lm_params, prelude, rng, mesh=mesh, action=action,
        segment_length=segment_length, context_length=context_length,
        tokens_per_dyna=dyn, **generate_kwargs)
    frames = detok_fn(tok_params, res.tokens)
    return frames, res
