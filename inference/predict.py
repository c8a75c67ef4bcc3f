"""Video-prediction inference CLI.

TPU-native equivalent of reference inference/predict.py:26-126: load a
pretrained tokenizer + transformer (safetensors, HF hub layout with
``tokenizer``/``transformer`` subfolders), tokenize context frames, sample
K futures with the fully-jitted KV-cached generator, detokenize, write
GT-vs-prediction GIFs.

Usage:
  python inference/predict.py \
      --pretrained_model_name_or_path /path/to/ivideogpt-oxe-64-act-free \
      --input_path samples/fractal_sample.npz --dataset_name fractal20220817_data
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_name_or_path", type=str, required=True)
    p.add_argument("--input_path", type=str, required=True)
    p.add_argument("--dataset_name", type=str, required=True)
    p.add_argument("--output_path", type=str, default="outputs")
    p.add_argument("--context_length", type=int, default=2)
    p.add_argument("--segment_length", type=int, default=16)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--goal_conditioned", action="store_true")
    p.add_argument("--action_conditioned", action="store_true")
    p.add_argument("--action_dim", type=int, default=4)
    p.add_argument("--repeat_times", type=int, default=5)
    p.add_argument("--top_k", type=int, default=100)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def load_models(args):
    """Build models from the HF hub checkpoint layout
    (reference inference/predict.py:94-113)."""
    import jax.numpy as jnp
    from ivideogpt_tpu.configs import (ActionModelConfig, CompressiveVQConfig,
                                       TransformerConfig)
    from ivideogpt_tpu.models import CompressiveVQModel, HeadModelWithAction
    from ivideogpt_tpu.utils import checkpoint as ckpt

    root = args.pretrained_model_name_or_path
    with open(os.path.join(root, "tokenizer", "config.json")) as f:
        tok_json = json.load(f)
    tok_cfg = CompressiveVQConfig(
        block_out_channels=tuple(tok_json["block_out_channels"]),
        layers_per_block=tok_json.get("layers_per_block", 2),
        latent_channels=tok_json["latent_channels"],
        num_vq_embeddings=tok_json["num_vq_embeddings"],
        num_dyn_embeddings=tok_json.get("num_dyn_embeddings",
                                        tok_json["num_vq_embeddings"]),
        norm_num_groups=tok_json.get("norm_num_groups", 32),
        mid_block_add_attention=tok_json.get("mid_block_add_attention", True),
        context_length=tok_json.get("context_length", 1),
        resolution=tok_json.get("resolution", 64),
        max_att_resolution=tok_json.get("max_att_resolution", 16),
    )
    assert args.context_length == tok_cfg.context_length, \
        "context_length must match the pretrained tokenizer"
    tokenizer = CompressiveVQModel(tok_cfg)
    tok_params = ckpt.load_tokenizer_safetensors(os.path.join(root, "tokenizer"))

    with open(os.path.join(root, "transformer", "config.json")) as f:
        lm_json = json.load(f)
    lm_cfg = TransformerConfig(
        vocab_size=lm_json["vocab_size"],
        hidden_size=lm_json["hidden_size"],
        intermediate_size=lm_json["intermediate_size"],
        num_hidden_layers=lm_json["num_hidden_layers"],
        num_attention_heads=lm_json["num_attention_heads"],
        num_key_value_heads=lm_json.get("num_key_value_heads",
                                        lm_json["num_attention_heads"]),
        max_position_embeddings=lm_json.get("max_position_embeddings", 1024),
        rms_norm_eps=lm_json.get("rms_norm_eps", 1e-6),
    )
    assert lm_cfg.vocab_size == tok_cfg.vocab_size, \
        "transformer vocab must equal tokenizer vocab"
    head_cfg = ActionModelConfig(
        action_dim=args.action_dim, context_length=args.context_length,
        segment_length=args.segment_length,
        tokens_per_context=tok_cfg.ctx_tokens_per_frame,
        tokens_per_dyna=tok_cfg.dyn_tokens_per_frame)
    model = HeadModelWithAction(lm_cfg, head_cfg)
    sd_path = os.path.join(root, "transformer")
    if args.action_conditioned:
        # action-model checkpoints carry llm.* plus the head linears
        params = ckpt.load_action_model_safetensors(sd_path)
    else:
        # action-free prediction: accept BOTH a bare-llama file (the
        # published act-free transformers) and a full HeadModelWithAction
        # export (our train_gpt.py output) — only the llm subtree is used
        lm_tree = ckpt.load_llm_only_safetensors(sd_path)
        params = {"params": {"llm": lm_tree["params"]}}
    return tokenizer, tok_params, model, params, tok_cfg


def predict(args, tokenizer, tok_params, model, lm_params, pixels, actions):
    import jax
    import jax.numpy as jnp
    from ivideogpt_tpu import generation, tokens

    ctx, T = args.context_length, args.segment_length
    cfg = tokenizer.config
    px = jnp.asarray(pixels)[None]  # [1, T, H, W, C]

    indices, _ = jax.jit(lambda p, x: tokenizer.apply(
        p, x, ctx, method=tokenizer.tokenize))(tok_params, px)
    P1 = tokens.prelude_len(ctx, cfg.ctx_tokens_per_frame) + 1
    prelude = jnp.tile(indices[:, :P1], (args.repeat_times, 1))
    act = (jnp.tile(jnp.asarray(actions)[None], (args.repeat_times, 1, 1))
           if actions is not None else None)

    res = generation.generate(
        model, lm_params, prelude, jax.random.key(args.seed),
        segment_length=T, context_length=ctx, action=act,
        tokens_per_dyna=cfg.dyn_tokens_per_frame,
        top_k=args.top_k, temperature=args.temperature)

    frames = jax.jit(lambda p, i: tokenizer.apply(
        p, i, ctx, method=tokenizer.detokenize))(tok_params, res.tokens)
    return np.clip(np.asarray(frames), 0.0, 1.0)


def main():
    args = parse_args()
    import jax
    from ivideogpt_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("IVG_JAX_CACHE", "/tmp/ivg_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from inference.utils import NPZParser

    tokenizer, tok_params, model, lm_params, _ = load_models(args)
    parser = NPZParser(args.segment_length, args.resolution)
    pixels, actions = parser.parse(args.input_path, args.dataset_name,
                                   load_action=args.action_conditioned)
    if args.goal_conditioned:
        pixels = np.concatenate([pixels[-1:], pixels[:-1]], axis=0)

    recon = predict(args, tokenizer, tok_params, model, lm_params,
                    pixels, actions)

    import imageio
    os.makedirs(args.output_path, exist_ok=True)
    gt = (pixels * 255).astype(np.uint8)
    for j in range(args.repeat_times):
        pred = (recon[j] * 255).astype(np.uint8)
        strip = [np.concatenate([gt[i], pred[i]], axis=1)
                 for i in range(len(gt))]
        imageio.mimsave(f"{args.output_path}/pred-samples-{j}.gif", strip,
                        fps=4, loop=0)
    print(f"wrote {args.repeat_times} GIFs to {args.output_path}")


if __name__ == "__main__":
    main()
