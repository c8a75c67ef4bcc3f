"""Synthesize a bit-exact FAKE of the published HF hub checkpoint layout.

The published iVideoGPT checkpoints (reference README.md:27-60) are hub
dirs with two subfolders consumed by reference inference/predict.py:94-113:

  {model}/tokenizer/config.json                     diffusers ConfigMixin
  {model}/tokenizer/diffusion_pytorch_model.safetensors
  {model}/transformer/config.json                   HF LlamaConfig
  {model}/transformer/model.safetensors             act-free: bare
        LlamaForCausalLM state_dict (saved by save_pretrained);
        act-cond: HeadModelWithAction state_dict (llm.* + head linears,
        torch-saved via safetensors.save_file)

Those weights cannot be downloaded in this environment, so this tool
synthesizes the LAYOUT exactly — genuine ``transformers.save_pretrained``
output for the transformer side (real config.json schema, real file name,
real key names), and the diffusers ConfigMixin schema for the tokenizer
(every ``@register_to_config`` key of reference
ivideogpt/vq_model/compressive_vq_model.py:36-62 plus the ``_class_name``/
``_diffusers_version`` header diffusers writes) — at a configurable model
size, with random weights. CI then runs ``inference/predict.py`` and the
VP2 predictor against the fake hub UNMODIFIED (tests/test_fake_hub.py),
so "our loaders consume the published layout" is an executed check, not a
schema assumption. At deploy, the only untested delta vs the real hub is
the weight VALUES.

Usage:
  python tools/make_fake_hub.py --out /tmp/fake_hub [--size base|tiny]
         [--action_conditioned]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def diffusers_tokenizer_config(tok_cfg) -> dict:
    """The exact diffusers ConfigMixin json schema of the published
    tokenizer (reference compressive_vq_model.py:36-62 register_to_config
    signature; diffusers writes every ctor kwarg plus the header keys)."""
    n_down = len(tok_cfg.block_out_channels)
    return {
        "_class_name": "CompressiveVQModel",
        "_diffusers_version": "0.30.1",
        "in_channels": 3,
        "out_channels": 3,
        "down_block_types": ["DownEncoderBlock2D"] * n_down,
        "up_block_types": ["UpDecoderBlock2D"] * n_down,
        "block_out_channels": list(tok_cfg.block_out_channels),
        "layers_per_block": tok_cfg.layers_per_block,
        "act_fn": "silu",
        "latent_channels": tok_cfg.latent_channels,
        "sample_size": 32,
        "num_vq_embeddings": tok_cfg.num_vq_embeddings,
        "norm_num_groups": tok_cfg.norm_num_groups,
        "vq_embed_dim": None,
        "scaling_factor": 0.18215,
        "norm_type": "group",
        "mid_block_add_attention": tok_cfg.mid_block_add_attention,
        "lookup_from_codebook": False,
        "force_upcast": False,
        "num_dyn_embeddings": tok_cfg.num_dyn_embeddings,
        "context_length": tok_cfg.context_length,
        "max_att_resolution": tok_cfg.max_att_resolution,
        "resolution": tok_cfg.resolution,
        "patch_size": tok_cfg.patch_size,
    }


def make_fake_hub(out_dir: str, size: str = "tiny",
                  action_conditioned: bool = False, action_dim: int = 4,
                  seed: int = 0) -> str:
    import jax
    import jax.numpy as jnp
    import transformers

    from ivideogpt_tpu.configs import (ActionModelConfig, CompressiveVQConfig,
                                       LLAMA_BASE, TOKENIZER_64,
                                       TransformerConfig)
    from ivideogpt_tpu.models import CompressiveVQModel, HeadModelWithAction
    from ivideogpt_tpu.utils import checkpoint as ckpt

    if size == "base":
        tok_cfg = TOKENIZER_64.replace(context_length=2)
        lm_cfg = LLAMA_BASE
    elif size == "tiny":
        # 64px geometry (so the real sample fixtures feed it) at toy width
        tok_cfg = CompressiveVQConfig(
            block_out_channels=(16, 32, 32), layers_per_block=1,
            latent_channels=8, num_vq_embeddings=64, num_dyn_embeddings=64,
            norm_num_groups=8, mid_block_add_attention=False,
            context_length=2, resolution=64, max_att_resolution=8,
            patch_size=4)
        lm_cfg = TransformerConfig(
            vocab_size=tok_cfg.vocab_size, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            max_position_embeddings=1024, rms_norm_eps=1e-6)
    else:
        raise ValueError(f"unknown size {size!r}")

    # --- tokenizer subfolder: diffusers layout ---
    tok_dir = os.path.join(out_dir, "tokenizer")
    os.makedirs(tok_dir, exist_ok=True)
    with open(os.path.join(tok_dir, "config.json"), "w") as f:
        json.dump(diffusers_tokenizer_config(tok_cfg), f, indent=2)
    model = CompressiveVQModel(tok_cfg, use_pallas=False)
    res = tok_cfg.resolution
    tok_params = jax.jit(
        lambda k: model.init(
            k, jnp.zeros((tok_cfg.context_length, res, res, 3), jnp.float32),
            jnp.zeros((2, res, res, 3), jnp.float32), segment_len=2)
    )(jax.random.key(seed))
    ckpt.export_tokenizer_safetensors(
        tok_params, os.path.join(tok_dir,
                                 "diffusion_pytorch_model.safetensors"))

    # --- transformer subfolder ---
    tf_dir = os.path.join(out_dir, "transformer")
    hf_cfg = transformers.LlamaConfig(
        vocab_size=lm_cfg.vocab_size, hidden_size=lm_cfg.hidden_size,
        intermediate_size=lm_cfg.intermediate_size,
        num_hidden_layers=lm_cfg.num_hidden_layers,
        num_attention_heads=lm_cfg.num_attention_heads,
        num_key_value_heads=lm_cfg.num_key_value_heads,
        max_position_embeddings=lm_cfg.max_position_embeddings,
        rms_norm_eps=lm_cfg.rms_norm_eps, tie_word_embeddings=False)
    import torch
    torch.manual_seed(seed)
    hf = transformers.LlamaForCausalLM(hf_cfg)
    if action_conditioned:
        # act-cond checkpoints are a HeadModelWithAction state_dict saved
        # with safetensors (reference inference/predict.py:99-109): the
        # llm subtree keys come from the REAL torch module; head linears
        # follow reference transformer/action_model.py attribute names
        os.makedirs(tf_dir, exist_ok=True)
        hf_cfg.save_pretrained(tf_dir)  # genuine config.json
        rng = np.random.default_rng(seed)
        h = lm_cfg.hidden_size
        sd = {f"llm.{k}": v.numpy() for k, v in hf.state_dict().items()
              if "rotary_emb" not in k}
        sd["action_linear.weight"] = rng.normal(
            0, 0.02, (h, action_dim)).astype(np.float32)
        sd["action_linear.bias"] = np.zeros((h,), np.float32)
        ckpt._write_safetensors(os.path.join(tf_dir, "model.safetensors"),
                                sd)
    else:
        # act-free checkpoints are genuine save_pretrained output
        hf.save_pretrained(tf_dir, safe_serialization=True)
    return out_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--size", default="tiny", choices=("tiny", "base"))
    p.add_argument("--action_conditioned", action="store_true")
    p.add_argument("--action_dim", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    make_fake_hub(args.out, size=args.size,
                  action_conditioned=args.action_conditioned,
                  action_dim=args.action_dim, seed=args.seed)
    for root, _, files in os.walk(args.out):
        for f in sorted(files):
            path = os.path.join(root, f)
            print(f"{os.path.getsize(path):>12}  {path}")


if __name__ == "__main__":
    main()
