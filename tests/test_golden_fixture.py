"""Golden-fixture tests over the committed inference/samples/ trajectories
(the data-oracle role of reference inference/samples/{bair,fractal}_sample.npz;
SURVEY.md §4 golden-test plan).

- the fixture bytes are pinned by sha256 (the oracle must never drift)
- tokenize -> generate -> detokenize on the fixture with pinned seeds
  reproduces the committed golden token ids exactly (CPU determinism)
- the predict.py CLI runs end to end against an exported checkpoint dir and
  writes GIFs (the README inference commands, reference predict.py:116-126)
"""

import hashlib
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SAMPLES = os.path.join(REPO, "inference", "samples")
GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

FIXTURE_SHA256 = {
    "synthetic_sample.npz":
        "cb3574de2eb46dfadcea37e720dab63afbaf7a54e274794cfd7859c4a3feae94",
    "synthetic_sample2.npz":
        "bf3f998e09428219d59d9b55fcdd95f81d4b2ba9b4aa126634104ba292c9b392",
}


def _tiny_models():
    from tests.test_tokenizer_model import TINY
    from ivideogpt_tpu.configs import ActionModelConfig, TransformerConfig
    from ivideogpt_tpu.models import CompressiveVQModel, HeadModelWithAction

    tok_cfg = TINY.replace(resolution=64, max_att_resolution=16)
    lm_cfg = TransformerConfig(
        vocab_size=tok_cfg.vocab_size, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=2048)
    head_cfg = ActionModelConfig(
        action_dim=4, context_length=2, segment_length=16,
        tokens_per_context=tok_cfg.ctx_tokens_per_frame,
        tokens_per_dyna=tok_cfg.dyn_tokens_per_frame)
    return tok_cfg, lm_cfg, head_cfg


def test_fixture_bytes_pinned():
    for name, expect in FIXTURE_SHA256.items():
        with open(os.path.join(SAMPLES, name), "rb") as f:
            got = hashlib.sha256(f.read()).hexdigest()
        assert got == expect, f"{name} drifted: {got}"


@pytest.mark.slow
def test_golden_token_ids():
    """Pinned-seed tokenize of the fixture == committed golden ids."""
    from ivideogpt_tpu.models import CompressiveVQModel
    sys.path.insert(0, REPO)
    from inference.utils import NPZParser

    tok_cfg, _, _ = _tiny_models()
    tokenizer = CompressiveVQModel(tok_cfg, use_pallas=False)
    px, _ = NPZParser(16, 64).parse(
        os.path.join(SAMPLES, "synthetic_sample.npz"), "synthetic")
    px = jnp.asarray(px)[None]
    params = tokenizer.init(jax.random.key(0),
                            px[0, :2], px[0, 2:], segment_len=14)
    ids, labels = tokenizer.apply(params, px, 2, method=tokenizer.tokenize)

    golden_path = os.path.join(GOLDEN, "synthetic_tokens.npz")
    golden = np.load(golden_path)
    np.testing.assert_array_equal(np.asarray(ids), golden["ids"])
    np.testing.assert_array_equal(np.asarray(labels), golden["labels"])

    # round trip: detokenize returns finite frames of the right shape
    frames = tokenizer.apply(params, ids, 2, method=tokenizer.detokenize)
    assert frames.shape == (1, 16, 64, 64, 3)
    assert bool(jnp.isfinite(frames).all())


@pytest.mark.slow
def test_predict_cli_end_to_end(tmp_path):
    """README inference command: predict.py loads an HF-layout checkpoint,
    parses the npz sample, generates, writes GIFs."""
    from ivideogpt_tpu.models import CompressiveVQModel, HeadModelWithAction
    from ivideogpt_tpu import tokens
    from ivideogpt_tpu.utils import checkpoint as ckpt

    tok_cfg, lm_cfg, head_cfg = _tiny_models()
    seg = 6  # short rollout keeps the CPU subprocess fast; same code path
    head_cfg = head_cfg.replace(segment_length=seg) \
        if hasattr(head_cfg, "replace") else head_cfg
    tokenizer = CompressiveVQModel(tok_cfg, use_pallas=False)
    px = jnp.zeros((1, 4, 64, 64, 3), jnp.float32)
    tok_params = tokenizer.init(jax.random.key(0), px[0, :2], px[0, 2:],
                                segment_len=2)
    model = HeadModelWithAction(lm_cfg, head_cfg)
    L = tokens.seq_len(2, seg, ctx_tokens=tok_cfg.ctx_tokens_per_frame,
                       dyn_tokens=tok_cfg.dyn_tokens_per_frame)
    lm_params = model.init(jax.random.key(1), jnp.zeros((1, L), jnp.int32),
                           None, jnp.zeros((1, seg, 4), jnp.float32))

    root = tmp_path / "ckpt"
    os.makedirs(root / "tokenizer")
    os.makedirs(root / "transformer")
    ckpt.export_tokenizer_safetensors(
        tok_params, str(root / "tokenizer" / "model.safetensors"))
    (root / "tokenizer" / "config.json").write_text(tok_cfg.to_json())
    ckpt._write_safetensors(str(root / "transformer" / "model.safetensors"),
                            ckpt.flax_to_torch_action_model(lm_params))
    (root / "transformer" / "config.json").write_text(lm_cfg.to_json())

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out_dir = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "inference", "predict.py"),
         "--pretrained_model_name_or_path", str(root),
         "--input_path", os.path.join(SAMPLES, "synthetic_sample.npz"),
         "--dataset_name", "synthetic", "--output_path", str(out_dir),
         "--segment_length", "6",
         "--action_conditioned", "--repeat_times", "2", "--top_k", "10"],
        capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, f"predict failed:\n{r.stdout}\n{r.stderr}"
    gifs = list(out_dir.glob("*.gif"))
    assert len(gifs) == 2, gifs
    assert all(g.stat().st_size > 0 for g in gifs)
