"""VP2 planner-interface test (tiny models, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivideogpt_tpu.configs import ActionModelConfig, TransformerConfig
from ivideogpt_tpu.models.action_model import HeadModelWithAction
from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
from ivideogpt_tpu.vp.interface import IVideoGPTPredictor
from tests.test_tokenizer_model import TINY

TINY_LM = TransformerConfig(
    vocab_size=TINY.vocab_size, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    max_position_embeddings=1024)


@pytest.mark.slow

def _tiny_predictor_models():
    from ivideogpt_tpu import tokens
    ctx, seg = 2, 12
    tokenizer = CompressiveVQModel(TINY, use_pallas=False)
    px = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    tok_params = tokenizer.init(jax.random.key(0),
                                px[:, :2].reshape(-1, 32, 32, 3),
                                px[:, 2:].reshape(-1, 32, 32, 3),
                                segment_len=2)
    head = ActionModelConfig(
        action_dim=4, context_length=ctx, segment_length=seg,
        tokens_per_context=TINY.ctx_tokens_per_frame,
        tokens_per_dyna=TINY.dyn_tokens_per_frame)
    model = HeadModelWithAction(TINY_LM, head)
    L = tokens.seq_len(ctx, seg, ctx_tokens=TINY.ctx_tokens_per_frame,
                       dyn_tokens=TINY.dyn_tokens_per_frame)
    ids = jnp.zeros((1, L), jnp.int32)
    act = jnp.zeros((1, seg, 4), jnp.float32)
    lm_params = model.init(jax.random.key(1), ids, ids, act)
    return tokenizer, tok_params, model, lm_params


def test_vp2_predictor_contract():
    from ivideogpt_tpu import tokens
    ctx, seg = 2, 12
    tokenizer = CompressiveVQModel(TINY, use_pallas=False)
    px = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    tok_params = tokenizer.init(jax.random.key(0),
                                px[:, :2].reshape(-1, 32, 32, 3),
                                px[:, 2:].reshape(-1, 32, 32, 3),
                                segment_len=2)
    head = ActionModelConfig(
        action_dim=4, context_length=ctx, segment_length=seg,
        tokens_per_context=TINY.ctx_tokens_per_frame,
        tokens_per_dyna=TINY.dyn_tokens_per_frame)
    model = HeadModelWithAction(TINY_LM, head)
    L = tokens.seq_len(ctx, seg, ctx_tokens=TINY.ctx_tokens_per_frame,
                       dyn_tokens=TINY.dyn_tokens_per_frame)
    ids = jnp.zeros((1, L), jnp.int32)
    act = jnp.zeros((1, seg, 4), jnp.float32)
    lm_params = model.init(jax.random.key(1), ids, ids, act)

    predictor = IVideoGPTPredictor(tokenizer, tok_params, model, lm_params,
                                   top_k=10)
    rng = np.random.default_rng(0)
    batch = {"video": rng.uniform(0, 1, (3, 2, 32, 32, 3)).astype(np.float32),
             "actions": rng.uniform(-1, 1, (3, 10, 4)).astype(np.float32)}
    out = predictor(batch)
    assert set(out) == {"rgb"}
    # fixed contract: seg-1 = 11 frames back (reference interface :204-206)
    assert out["rgb"].shape == (3, 11, 32, 32, 3)
    assert out["rgb"].min() >= 0.0 and out["rgb"].max() <= 1.0

    # chunked path produces the same shapes
    predictor2 = IVideoGPTPredictor(tokenizer, tok_params, model, lm_params,
                                    top_k=10, max_batch=2)
    out2 = predictor2(batch)
    assert out2["rgb"].shape == (3, 11, 32, 32, 3)

    # uint8 wire format: same sampled tokens (the wire only affects the
    # returned pixels), render differs from the exact path by at most
    # half a uint8 step
    predictor_u8 = IVideoGPTPredictor(tokenizer, tok_params, model,
                                      lm_params, top_k=10, u8_transfer=True)
    out_u8 = predictor_u8(batch)
    assert out_u8["rgb"].shape == (3, 11, 32, 32, 3)
    assert np.abs(out_u8["rgb"] - out["rgb"]).max() <= 0.5 / 255.0 + 1e-6


@pytest.mark.slow
def test_vp2_predictor_from_checkpoints(tmp_path):
    """Config-driven construction: the VP2 harness instantiates the
    predictor from vp/ivideogpt.yaml kwargs + exported checkpoint dirs
    (reference vp/ivideogpt_interface.py:100-140)."""
    import os
    from ivideogpt_tpu import tokens
    from ivideogpt_tpu.utils import checkpoint as ckpt

    ctx, seg = 2, 12
    tokenizer = CompressiveVQModel(TINY, use_pallas=False)
    px = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    tok_params = tokenizer.init(jax.random.key(0),
                                px[:, :2].reshape(-1, 32, 32, 3),
                                px[:, 2:].reshape(-1, 32, 32, 3),
                                segment_len=2)
    head = ActionModelConfig(
        action_dim=4, context_length=ctx, segment_length=seg,
        tokens_per_context=TINY.ctx_tokens_per_frame,
        tokens_per_dyna=TINY.dyn_tokens_per_frame)
    model = HeadModelWithAction(TINY_LM, head)
    L = tokens.seq_len(ctx, seg, ctx_tokens=TINY.ctx_tokens_per_frame,
                       dyn_tokens=TINY.dyn_tokens_per_frame)
    lm_params = model.init(jax.random.key(1), jnp.zeros((1, L), jnp.int32),
                           None, jnp.zeros((1, seg, 4), jnp.float32))

    # export in the HF hub layout ({model}/tokenizer, {model}/transformer)
    tok_dir = tmp_path / "tokenizer"
    tf_dir = tmp_path / "transformer"
    os.makedirs(tok_dir); os.makedirs(tf_dir)
    ckpt.export_tokenizer_safetensors(tok_params,
                                      str(tok_dir / "model.safetensors"))
    (tok_dir / "config.json").write_text(TINY.to_json())
    ckpt._write_safetensors(str(tf_dir / "model.safetensors"),
                            ckpt.flax_to_torch_action_model(lm_params))
    (tf_dir / "config.json").write_text(TINY_LM.to_json())

    predictor = IVideoGPTPredictor(
        pretrained_vqgan_name_or_path=str(tok_dir),
        pretrained_transformer_path=str(tf_dir),
        action_dim=4, top_k=10, seed=None)
    rng = np.random.default_rng(0)
    batch = {"video": rng.uniform(0, 1, (2, 2, 32, 32, 3)).astype(np.float32),
             "actions": rng.uniform(-1, 1, (2, 10, 4)).astype(np.float32)}
    out = predictor(batch)
    assert out["rgb"].shape == (2, 11, 32, 32, 3)

    # round-trip fidelity: loaded weights produce identical predictions to
    # the in-memory predictor under the same seed
    direct = IVideoGPTPredictor(tokenizer, tok_params, model, lm_params,
                                top_k=10, seed=0)
    np.testing.assert_allclose(out["rgb"], direct(batch)["rgb"],
                               rtol=1e-4, atol=1e-4)

    # lora=True with no adapter file must FAIL LOUDLY (a planner silently
    # benchmarked on base weights is a wrong result with no symptom) —
    # unless the caller explicitly opts into the degradation
    with pytest.raises(FileNotFoundError, match="lora"):
        IVideoGPTPredictor(
            pretrained_vqgan_name_or_path=str(tok_dir),
            pretrained_transformer_path=str(tf_dir),
            action_dim=4, top_k=10, lora=True)
    IVideoGPTPredictor(  # explicit override constructs fine
        pretrained_vqgan_name_or_path=str(tok_dir),
        pretrained_transformer_path=str(tf_dir),
        action_dim=4, top_k=10, lora=True, allow_missing_lora=True)


def test_vp2_int8_detok_knob():
    """int8_detok=True renders through the int8 MXU convs: same shapes,
    pixels within the qconv parity envelope of the exact render."""
    tokenizer, tok_params, model, lm_params = _tiny_predictor_models()
    rng = np.random.default_rng(3)
    batch = {"video": rng.uniform(0, 1, (2, 2, 32, 32, 3)).astype(np.float32),
             "actions": rng.uniform(-1, 1, (2, 10, 4)).astype(np.float32)}
    exact = IVideoGPTPredictor(tokenizer, tok_params, model, lm_params,
                               top_k=10, seed=0)(batch)["rgb"]
    q = IVideoGPTPredictor(tokenizer, tok_params, model, lm_params,
                           top_k=10, seed=0, int8_detok=True)(batch)["rgb"]
    assert q.shape == exact.shape
    # same token ids (generation untouched) -> pixel-level-only deltas;
    # random-init convs quantize loosely, so bound generously
    assert np.abs(q - exact).mean() < 0.08, np.abs(q - exact).mean()
