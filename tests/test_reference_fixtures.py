"""Parse the REAL reference sample trajectories (read-only data at
/root/reference/inference/samples/): the only real robot clips available in
this environment, covering the fractal stepsize-3 path and the BAIR
aux1_image display key (reference inference/utils.py:42-107,
inference/predict.py:116-117). Skipped when the reference tree is absent.
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

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SAMPLES), reason="reference samples not available")

sys.path.insert(0, REPO)


def test_stepsize_and_display_tables_for_fixture_datasets():
    from ivideogpt_tpu.data.npz_dataset import (get_base_stepsize,
                                                get_display_key)
    # the fractal native stepsize is 3 and is the normalizer of the
    # inference stepsize table (reference inference/utils.py:29-30)
    assert get_base_stepsize("fractal20220817_data") == 3
    assert get_display_key("fractal20220817_data") == "image"
    # BAIR displays the aux1 camera (reference utils.py DISPLAY_KEY)
    assert get_base_stepsize("bair_robot_pushing") == 1
    assert get_display_key("bair_robot_pushing") == "aux1_image"


def test_parse_fractal_sample():
    """22-frame 256x320 fractal clip: stepsize 3/3=1, resized to 64."""
    from inference.utils import NPZParser
    px, act = NPZParser(16, 64).parse(FRACTAL, "fractal20220817_data")
    assert act is None
    assert px.shape == (16, 64, 64, 3)
    assert px.dtype == np.float32
    assert 0.0 <= px.min() and px.max() <= 1.0
    assert px.std() > 0.01  # real pixels, not constants
    # frames are distinct (a stepsize bug collapsing to one frame would not be)
    assert not np.allclose(px[0], px[8])


def test_parse_bair_sample_aux1_and_actions():
    """BAIR sample: int64-stored pixels, aux1_image key, 4-dim actions."""
    from inference.utils import NPZParser
    px, act = NPZParser(16, 64).parse(BAIR, "bair_robot_pushing",
                                      load_action=True)
    assert px.shape == (16, 64, 64, 3)
    assert act is not None and act.shape == (16, 4)
    assert act.dtype == np.float32
    # stepsize 1, 64px source: frame 0 must be exactly aux1_image[0]/255
    with np.load(BAIR) as z:
        raw = z["aux1_image"][0].astype(np.float32) / 255.0
    np.testing.assert_allclose(px[0], raw, atol=1e-6)


def test_parse_short_episode_shrinks_stepsize():
    """A 22-frame clip at a hypothetical large stepsize must shrink the
    stride instead of running off the end (reference utils.py:19-21)."""
    from inference.utils import NPZParser
    # kuka's table stepsize is 10 -> round(10/3)=3; 3*16=48 > 22 frames, so
    # the parser must fall back to 22//16=1
    with np.load(FRACTAL) as z:
        n = len(z["image"])
    px, _ = NPZParser(16, 64).parse(FRACTAL, "kuka")
    assert px.shape == (16, 64, 64, 3)
    assert n < 48  # precondition that exercises the shrink branch


@pytest.mark.slow
def test_predict_cli_on_real_fractal_sample(tmp_path):
    """predict.py end to end on the real fractal clip (random-init tiny
    checkpoint; exercises the real-data parse + generate + GIF path)."""
    import jax
    import jax.numpy as jnp
    from ivideogpt_tpu.models import CompressiveVQModel, HeadModelWithAction
    from ivideogpt_tpu import tokens
    from ivideogpt_tpu.utils import checkpoint as ckpt
    from tests.test_golden_fixture import _tiny_models

    tok_cfg, lm_cfg, head_cfg = _tiny_models()
    seg = 6
    head_cfg = head_cfg.replace(segment_length=seg)
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
         "--input_path", FRACTAL,
         "--dataset_name", "fractal20220817_data",
         "--output_path", str(out_dir),
         "--segment_length", str(seg),
         "--repeat_times", "1", "--top_k", "10"],
        capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, f"predict failed:\n{r.stdout}\n{r.stderr}"
    gifs = list(out_dir.glob("*.gif"))
    assert gifs and all(g.stat().st_size > 0 for g in gifs)