"""Single dataclass config tree for the whole framework.

Replaces the reference's three coexisting config systems (argparse flags,
diffusers/HF JSON configs, hydra yaml; see reference train_tokenizer.py:123-283,
configs/*.json, mbrl/cfgs/) with one typed tree + JSON (de)serialization.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)


class _JsonMixin:
    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str):
        d = json.loads(s)
        known = {f.name for f in dataclasses.fields(cls)}
        # lists -> tuples: configs must stay hashable (flax module attrs)
        clean = {k: (tuple(v) if isinstance(v, list) else v)
                 for k, v in d.items() if k in known}
        return cls(**clean)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class CompressiveVQConfig(_JsonMixin):
    """Conditional ("compressive") VQGAN tokenizer config.

    Field semantics mirror the reference CompressiveVQModel constructor
    (reference: ivideogpt/vq_model/compressive_vq_model.py:36-60) and the
    published JSON configs (reference: configs/ctx_vae64/config.json,
    configs/ctx_vae/config.json).
    """

    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512)
    layers_per_block: int = 2
    act_fn: str = "silu"
    latent_channels: int = 64
    num_vq_embeddings: int = 8192
    num_dyn_embeddings: int = 8192
    norm_num_groups: int = 32
    vq_embed_dim: Optional[int] = None
    # mid-block self-attention for the *unconditional* encoder/decoder
    # (the conditional branches always use mid attention, reference
    # compressive_vq_model.py:79,136)
    mid_block_add_attention: bool = False
    context_length: int = 2
    max_att_resolution: int = 16
    resolution: int = 64
    patch_size: int = 4
    dropout: float = 0.0
    cross_attn_heads: int = 4
    cross_attn_dropout: float = 0.1
    # rematerialize conv blocks in backward (memory for FLOPs); the 256px
    # tokenizer needs it at practical batch sizes
    remat: bool = False

    # --- derived quantities -------------------------------------------------
    @property
    def embed_dim(self) -> int:
        return self.vq_embed_dim if self.vq_embed_dim is not None else self.latent_channels

    @property
    def num_down(self) -> int:
        return len(self.block_out_channels) - 1  # final block has no downsample

    @property
    def latent_resolution(self) -> int:
        return self.resolution // (2 ** self.num_down)

    @property
    def ctx_tokens_per_frame(self) -> int:
        r = self.latent_resolution
        return r * r  # 16x16 = 256 at 64px

    @property
    def dyn_resolution(self) -> int:
        return self.latent_resolution // self.patch_size

    @property
    def dyn_tokens_per_frame(self) -> int:
        r = self.dyn_resolution
        return r * r  # 4x4 = 16 at 64px

    @property
    def scf_token(self) -> int:
        """Start-of-context-frame separator id (reference compressive_vq_model.py:206)."""
        return self.num_vq_embeddings + self.num_dyn_embeddings

    @property
    def sdf_token(self) -> int:
        """Start-of-dynamics-frame separator id (reference compressive_vq_model.py:211)."""
        return self.num_vq_embeddings + self.num_dyn_embeddings + 1

    @property
    def vocab_size(self) -> int:
        return self.num_vq_embeddings + self.num_dyn_embeddings + 2


@dataclass(frozen=True)
class TransformerConfig(_JsonMixin):
    """LLaMA-architecture causal LM config.

    Mirrors HF LlamaConfig fields used by the reference
    (reference: configs/llama/config.json, configs/llama/config_medium.json;
    vocab size overwritten at runtime to 16386, train_gpt.py:593).
    """

    vocab_size: int = 16386
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    num_key_value_heads: int = 12
    max_position_embeddings: int = 1024
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    attention_dropout: float = 0.0
    initializer_range: float = 0.02
    tie_word_embeddings: bool = False
    # rematerialize each layer in the training backward pass (gradient
    # checkpointing; the knob for the 436M medium model on one chip)
    remat: bool = False
    # what the remat'd layer may KEEP instead of recomputing: "none"
    # recomputes everything (max memory savings, ~1.33x FLOPs); "dots"
    # keeps matmul outputs and recomputes only cheap elementwise/norm ops
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) — nearly
    # full-backward speed at a fraction of full activation memory
    remat_policy: str = "none"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclass(frozen=True)
class ActionModelConfig(_JsonMixin):
    """HeadModelWithAction wrapper config (reference transformer/action_model.py:8-45)."""

    action_dim: int = 4
    context_length: int = 2
    segment_length: int = 16
    tokens_per_context: int = 256
    tokens_per_dyna: int = 16
    reward_prediction: bool = False
    action_recon: Optional[float] = None  # aux loss weight, None disables

    @property
    def prelude_tokens_num(self) -> int:
        return (self.tokens_per_context + 1) * self.context_length - 1


@dataclass(frozen=True)
class DiscriminatorConfig(_JsonMixin):
    """PatchGAN-style discriminator (reference vq_model/discriminator.py:12-33)."""

    in_channels: int = 3
    hidden_channels: int = 512
    depth: int = 6


@dataclass(frozen=True)
class TokenizerTrainConfig(_JsonMixin):
    """Tokenizer (VQGAN) trainer knobs (reference train_tokenizer.py:123-283,
    scripts/pretrain/oxe-64-act-free.sh:7-15)."""

    batch_size: int = 16
    segment_length: int = 8
    context_length: int = 2
    video_stepsize: int = 1
    learning_rate: float = 5e-4
    disc_learning_rate: float = 5e-4
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 1000
    max_train_steps: int = 1_000_000
    gradient_accumulation_steps: int = 1
    max_grad_norm: float = 1.0
    recon_weight: float = 1.0
    perc_weight: float = 1.0
    disc_weight: float = 0.1
    disc_start: int = 0
    balanced_loss: bool = True
    vae_loss: str = "l1"
    use_ema: bool = False
    ema_decay: float = 0.9999
    weight_decay: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    checkpointing_steps: int = 10_000
    validation_steps: int = 2_500
    log_steps: int = 50
    seed: Optional[int] = 42
    mixed_precision: str = "bf16"


@dataclass(frozen=True)
class GPTTrainConfig(_JsonMixin):
    """Token-LM trainer knobs (reference train_gpt.py:198-318,
    scripts/pretrain/oxe-64-act-free.sh:21-31)."""

    batch_size: int = 16
    segment_length: int = 16
    context_length: int = 2
    learning_rate: float = 1e-4
    lr_scheduler: str = "cosine"
    lr_warmup_steps: int = 5000
    max_train_steps: int = 1_000_000
    gradient_accumulation_steps: int = 1
    max_grad_norm: float = 1.0
    weight_decay: float = 0.01
    embed_no_wd: bool = True
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    action_conditioned: bool = False
    action_dim: int = 4
    action_recon: Optional[float] = None
    checkpointing_steps: int = 10_000
    validation_steps: int = 5_000
    log_steps: int = 50
    eval_generate_times: int = 1
    eval_max_batchsize: int = 64
    top_k: int = 100
    temperature: float = 1.0
    seed: Optional[int] = 42
    mixed_precision: str = "bf16"


# ---------------------------------------------------------------------------
# Canonical published configurations
# ---------------------------------------------------------------------------

# 64x64 tokenizer, 114M params (reference configs/ctx_vae64/config.json)
TOKENIZER_64 = CompressiveVQConfig(
    block_out_channels=(128, 256, 512),
    latent_channels=64,
    num_vq_embeddings=8192,
    num_dyn_embeddings=8192,
    mid_block_add_attention=False,
    context_length=2,
    resolution=64,
    max_att_resolution=16,
)

# 256x256 tokenizer, 310M params (reference configs/ctx_vae/config.json)
TOKENIZER_256 = CompressiveVQConfig(
    block_out_channels=(128, 256, 256, 512, 768),
    latent_channels=64,
    num_vq_embeddings=8192,
    num_dyn_embeddings=8192,
    mid_block_add_attention=False,
    context_length=2,
    resolution=256,
    max_att_resolution=32,
    remat=True,
)

# 138M LLaMA (reference configs/llama/config.json)
LLAMA_BASE = TransformerConfig(
    vocab_size=16386,
    hidden_size=768,
    intermediate_size=3072,
    num_hidden_layers=12,
    num_attention_heads=12,
    num_key_value_heads=12,
)

# 436M LLaMA (reference configs/llama/config_medium.json)
LLAMA_MEDIUM = TransformerConfig(
    vocab_size=16386,
    hidden_size=1024,
    intermediate_size=4096,
    num_hidden_layers=24,
    num_attention_heads=16,
    num_key_value_heads=16,
)
