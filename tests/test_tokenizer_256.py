"""256x256 tokenizer path: shapes, token geometry, tokenize/detokenize round
trip (reference configs/ctx_vae/config.json + scripts/pretrain/
oxe-256-act-free.sh). The full-size TPU smoke lives in tools/smoke_256.py;
this CPU test pins the geometry with a width-reduced clone of TOKENIZER_256
(same depth/attention placement, narrower channels)."""

import jax
import jax.numpy as jnp
import pytest

from ivideogpt_tpu.configs import TOKENIZER_256


def test_256_config_geometry():
    c = TOKENIZER_256
    assert c.block_out_channels == (128, 256, 256, 512, 768)
    assert c.max_att_resolution == 32
    assert c.resolution == 256
    # 4 downsamples: 256 -> 16; 16x16 ctx tokens, 4x4 dyn grid
    assert c.latent_resolution == 16
    assert c.ctx_tokens_per_frame == 256
    assert c.dyn_tokens_per_frame == 16
    assert c.vocab_size == 8192 + 8192 + 2


@pytest.mark.slow
def test_256_forward_roundtrip_narrow():
    from ivideogpt_tpu.models import CompressiveVQModel
    cfg = TOKENIZER_256.replace(
        block_out_channels=(8, 8, 8, 16, 16), latent_channels=8,
        num_vq_embeddings=64, num_dyn_embeddings=64, norm_num_groups=4,
        layers_per_block=1, cross_attn_heads=2)
    assert cfg.latent_resolution == 16  # depth preserved
    tok = CompressiveVQModel(cfg, use_pallas=False)
    B, ctx, F = 1, 2, 1
    px = jax.random.uniform(jax.random.key(0), (B, ctx + F, 256, 256, 3))
    params = tok.init(jax.random.key(1),
                      px[:, :ctx].reshape(-1, 256, 256, 3),
                      px[:, ctx:].reshape(-1, 256, 256, 3), segment_len=F)
    # training forward
    dec, ref_dec, commit, dyn_commit = tok.apply(
        params, px[:, :ctx].reshape(-1, 256, 256, 3),
        px[:, ctx:].reshape(-1, 256, 256, 3), segment_len=F)
    assert dec.shape == (B * F, 256, 256, 3)
    assert ref_dec.shape == (B * ctx, 256, 256, 3)
    assert jnp.isfinite(commit) and jnp.isfinite(dyn_commit)
    # tokenize / detokenize round trip
    ids, labels = tok.apply(params, px, ctx, method=tok.tokenize)
    L = (256 + 1) * ctx - 1 + (16 + 1) * F
    assert ids.shape == (B, L)
    frames = tok.apply(params, ids, ctx, method=tok.detokenize)
    assert frames.shape == (B, ctx + F, 256, 256, 3)
    assert bool(jnp.isfinite(frames).all())


@pytest.mark.slow
def test_256_generation_stream_roundtrip_narrow():
    """256px token geometry through the REAL generation.generate +
    detokenize path (narrow-channel clone on CPU; the full-size TPU run is
    tools/smoke_256.py). Matches the ivideogpt-oxe-256-act-free stream:
    256 ctx + 16 dyn tokens/frame, cross-attention to 32x32."""
    from ivideogpt_tpu import generation, tokens
    from ivideogpt_tpu.configs import ActionModelConfig, TransformerConfig
    from ivideogpt_tpu.models import CompressiveVQModel, HeadModelWithAction

    cfg = TOKENIZER_256.replace(
        block_out_channels=(8, 8, 8, 16, 16), latent_channels=8,
        num_vq_embeddings=64, num_dyn_embeddings=64, norm_num_groups=4,
        layers_per_block=1, cross_attn_heads=2)
    tok = CompressiveVQModel(cfg, use_pallas=False)
    B, ctx, T = 1, 2, 4
    F = T - ctx
    px = jax.random.uniform(jax.random.key(0), (B, T, 256, 256, 3))
    params = tok.init(jax.random.key(1),
                      px[:, :ctx].reshape(-1, 256, 256, 3),
                      px[:, ctx:].reshape(-1, 256, 256, 3), segment_len=F)
    ids, _ = tok.apply(params, px, ctx, method=tok.tokenize)

    lm_cfg = TransformerConfig(
        vocab_size=cfg.vocab_size, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=1024)
    lm = HeadModelWithAction(
        lm_cfg, ActionModelConfig(
            action_dim=4, context_length=ctx, segment_length=T,
            tokens_per_context=cfg.ctx_tokens_per_frame,
            tokens_per_dyna=cfg.dyn_tokens_per_frame))
    L = tokens.seq_len(ctx, T, ctx_tokens=cfg.ctx_tokens_per_frame,
                       dyn_tokens=cfg.dyn_tokens_per_frame)
    assert L == ids.shape[1] == (256 + 1) * ctx - 1 + 17 * F
    lm_params = lm.init(jax.random.key(2), jnp.zeros((1, L), jnp.int32),
                        None, None)
    P1 = tokens.prelude_len(ctx, cfg.ctx_tokens_per_frame) + 1
    res = generation.generate(
        lm, lm_params, ids[:, :P1], jax.random.key(3), segment_length=T,
        context_length=ctx, tokens_per_dyna=cfg.dyn_tokens_per_frame,
        top_k=10)
    assert res.tokens.shape == (B, L)
    # generated dyn ids live in the dyn range; separators intact
    frames = tok.apply(params, res.tokens, ctx, method=tok.detokenize)
    assert frames.shape == (B, T, 256, 256, 3)
    assert bool(jnp.isfinite(frames).all())
