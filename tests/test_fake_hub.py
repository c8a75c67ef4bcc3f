"""Deploy rehearsal: consume a bit-exact fake of the published hub layout.

tools/make_fake_hub.py synthesizes the published checkpoint layout —
genuine ``transformers.save_pretrained`` files for the transformer,
diffusers ConfigMixin schema + ``diffusion_pytorch_model.safetensors`` for
the tokenizer (reference inference/predict.py:94-113's exact inputs) — and
these tests run our CLIs/loaders against it UNMODIFIED. This kills the
residual "our synthesized schema != the real hub file" risk for everything
except the weight values themselves (which cannot be downloaded here).

tools/parity_check.py (token-id parity vs torch) additionally needs
diffusers + the real weights: runs at deploy, not here.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SAMPLES = "/root/reference/inference/samples"
FRACTAL = os.path.join(REF_SAMPLES, "fractal_sample.npz")
BAIR = os.path.join(REF_SAMPLES, "bair_sample.npz")

needs_samples = pytest.mark.skipif(
    not os.path.isdir(REF_SAMPLES), reason="reference samples not available")


def _cpu_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _make_hub(out, **kw):
    from tools.make_fake_hub import make_fake_hub
    return make_fake_hub(str(out), size="tiny", **kw)


def test_fake_hub_layout_is_published_layout(tmp_path):
    """File names and config headers match what the hub serves: diffusers'
    diffusion_pytorch_model.safetensors + _class_name header, transformers'
    model.safetensors written by save_pretrained itself."""
    import json
    _make_hub(tmp_path / "hub")
    tok = tmp_path / "hub" / "tokenizer"
    tf = tmp_path / "hub" / "transformer"
    assert (tok / "diffusion_pytorch_model.safetensors").exists()
    cfg = json.loads((tok / "config.json").read_text())
    assert cfg["_class_name"] == "CompressiveVQModel"
    for k in ("down_block_types", "scaling_factor", "vq_embed_dim",
              "lookup_from_codebook", "num_dyn_embeddings", "patch_size"):
        assert k in cfg, f"diffusers schema key {k} missing"
    assert (tf / "model.safetensors").exists()
    lm_cfg = json.loads((tf / "config.json").read_text())
    assert lm_cfg["model_type"] == "llama"  # written by transformers itself
    assert lm_cfg["architectures"] == ["LlamaForCausalLM"]
    # the act-free file holds a BARE LlamaForCausalLM state_dict
    from safetensors.numpy import load_file
    keys = set(load_file(tf / "model.safetensors"))
    assert "model.embed_tokens.weight" in keys
    assert not any(k.startswith("llm.") for k in keys)


@pytest.mark.slow
@needs_samples
def test_predict_cli_consumes_fake_hub_act_free(tmp_path):
    """inference/predict.py, unmodified, against the published act-free
    layout (bare-llama transformer + diffusers tokenizer files)."""
    hub = _make_hub(tmp_path / "hub")
    out_dir = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "inference", "predict.py"),
         "--pretrained_model_name_or_path", hub,
         "--input_path", FRACTAL,
         "--dataset_name", "fractal20220817_data",
         "--output_path", str(out_dir),
         "--segment_length", "6",
         "--repeat_times", "1", "--top_k", "10"],
        capture_output=True, text=True, timeout=900, env=_cpu_env())
    assert r.returncode == 0, f"predict failed:\n{r.stdout}\n{r.stderr}"
    gifs = list(out_dir.glob("*.gif"))
    assert gifs and all(g.stat().st_size > 0 for g in gifs)


@pytest.mark.slow
@needs_samples
def test_predict_cli_consumes_fake_hub_act_cond(tmp_path):
    """The action-conditioned layout: HeadModelWithAction state_dict
    (llm.* from a REAL torch llama + head linears) on the real BAIR clip
    (reference inference/predict.py:99-109)."""
    hub = _make_hub(tmp_path / "hub", action_conditioned=True)
    out_dir = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "inference", "predict.py"),
         "--pretrained_model_name_or_path", hub,
         "--input_path", BAIR,
         "--dataset_name", "bair",
         "--action_conditioned", "--action_dim", "4",
         "--output_path", str(out_dir),
         "--segment_length", "6",
         "--repeat_times", "1", "--top_k", "10"],
        capture_output=True, text=True, timeout=900, env=_cpu_env())
    assert r.returncode == 0, f"predict failed:\n{r.stdout}\n{r.stderr}"
    gifs = list(out_dir.glob("*.gif"))
    assert gifs and all(g.stat().st_size > 0 for g in gifs)


@pytest.mark.slow
def test_vp2_predictor_consumes_fake_hub(tmp_path):
    """The VP2 predictor's config-driven path on the published layout
    (reference vp/ivideogpt_interface.py:100-140)."""
    from ivideogpt_tpu.vp.interface import IVideoGPTPredictor

    hub = _make_hub(tmp_path / "hub", action_conditioned=True)
    predictor = IVideoGPTPredictor(
        pretrained_vqgan_name_or_path=os.path.join(hub, "tokenizer"),
        pretrained_transformer_path=os.path.join(hub, "transformer"),
        action_dim=4, top_k=10, seed=0)
    rng = np.random.default_rng(0)
    batch = {"video": rng.uniform(0, 1, (2, 2, 64, 64, 3)).astype(np.float32),
             "actions": rng.uniform(-1, 1, (2, 10, 4)).astype(np.float32)}
    out = predictor(batch)
    assert out["rgb"].shape == (2, 11, 64, 64, 3)
    assert np.isfinite(out["rgb"]).all()
