"""Finetune surface CI (reference scripts/finetune/bair-64-act-cond.sh):

1. Export a tiny ctx=2 pretrained checkpoint ({tokenizer, transformer}).
2. Finetune the tokenizer at ctx=1 via the CLI — the kv pos-emb re-slice
   path (reference set_context_length, video_predictor.py:52-56).
3. Finetune the LM via the CLI with --load_internal_llm and the
   transformer warm start coming from a DIFFERENT dir than the tokenizer
   (--pretrained_transformer_path, reference bair-64-act-cond.sh:14-17).
   lr=0 makes the warm start provable bit-exactly from the exported
   checkpoint.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivideogpt_tpu.configs import ActionModelConfig, TransformerConfig
from tests.test_tokenizer_model import TINY

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_LM = TransformerConfig(
    vocab_size=TINY.vocab_size, hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
    max_position_embeddings=512)


def _run_cli(script, argv):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, os.path.join(REPO, script)] + argv,
                       capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r


@pytest.fixture(scope="module")
def ft_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("finetune")
    data = root / "data" / "cmu_stretch"
    data.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(30):
        np.savez_compressed(
            data / f"episode_{i:04d}.npz",
            image=rng.integers(0, 255, (10, 32, 32, 3)).astype(np.uint8),
            action=rng.normal(size=(10, 4)).astype(np.float32))

    # ---- pretrained ctx=2 checkpoint --------------------------------------
    from ivideogpt_tpu.models.action_model import HeadModelWithAction
    from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
    from ivideogpt_tpu.utils import checkpoint as ckpt
    from ivideogpt_tpu import tokens as token_lib

    pre = root / "pretrained"
    (pre / "tokenizer").mkdir(parents=True)
    (pre / "transformer").mkdir()

    tok = CompressiveVQModel(TINY, use_pallas=False)
    tok_params = jax.jit(tok.init, static_argnames="segment_len")(
        jax.random.key(0), jnp.zeros((2, 32, 32, 3)),
        jnp.zeros((3, 32, 32, 3)), segment_len=3)
    ckpt.export_tokenizer_safetensors(
        tok_params, str(pre / "tokenizer" / "model.safetensors"))
    (pre / "tokenizer" / "config.json").write_text(TINY.to_json())

    head = ActionModelConfig(
        action_dim=4, context_length=1, segment_length=4,
        tokens_per_context=TINY.ctx_tokens_per_frame,
        tokens_per_dyna=TINY.dyn_tokens_per_frame)
    model = HeadModelWithAction(TINY_LM, head)
    L = token_lib.seq_len(1, 4, ctx_tokens=TINY.ctx_tokens_per_frame,
                          dyn_tokens=TINY.dyn_tokens_per_frame)
    ids = jnp.zeros((1, L), jnp.int32)
    act = jnp.zeros((1, 4, 4), jnp.float32)
    lm_params = jax.jit(model.init)(jax.random.key(1), ids, ids, act)
    # a bare-llama file, like the published act-free transformers the
    # finetune recipes warm-start from
    ckpt._write_safetensors(
        str(pre / "transformer" / "model.safetensors"),
        ckpt.flax_to_torch_llama({"params": lm_params["params"]["llm"]}))

    (root / "tok_ctx1.json").write_text(
        TINY.replace(context_length=1).to_json())
    (root / "lm_tiny.json").write_text(TINY_LM.to_json())
    return root


@pytest.mark.slow
def test_finetune_tokenizer_ctx1_from_ctx2(ft_root):
    out = ft_root / "tok_ft"
    r = _run_cli("train_tokenizer.py", [
        "--model_config", str(ft_root / "tok_ctx1.json"),
        "--resolution", "32", "--context_length", "1",
        "--segment_length", "3", "--batch_size", "2",
        "--dataset_name", "debug", "--dataset_path", str(ft_root / "data"),
        "--dataloader_num_workers", "1", "--no_aug",
        "--pretrained_model_name_or_path", str(ft_root / "pretrained" /
                                               "tokenizer"),
        "--max_train_steps", "4", "--checkpointing_steps", "2",
        "--validation_steps", "100000", "--log_steps", "1",
        "--disc_depth", "2", "--disc_start", "1000000",
        "--output_dir", str(out), "--seed", "3"])
    assert "re-slicing kv pos-embs" in (r.stdout + r.stderr)
    metrics = [json.loads(l) for l in
               (out / "metrics.jsonl").read_text().splitlines()]
    assert metrics, "no metrics logged"
    for m in metrics:
        for k, v in m.items():
            if isinstance(v, float):
                assert np.isfinite(v), (k, v)
    # stage-2 consumable layout
    assert (out / "tokenizer" / "model.safetensors").exists()
    cfg = json.loads((out / "tokenizer" / "config.json").read_text())
    assert cfg["context_length"] == 1


@pytest.mark.slow
def test_finetune_lm_from_separate_transformer_path(ft_root):
    # stage 1 output may not exist if tests are filtered; build a minimal
    # tokenizer dir for the LM stage directly
    tok_src = ft_root / "tok_for_lm"
    (tok_src / "tokenizer").mkdir(parents=True, exist_ok=True)
    import shutil
    from ivideogpt_tpu.utils import checkpoint as ckpt
    from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
    tok_cfg1 = TINY.replace(context_length=1)
    tok = CompressiveVQModel(tok_cfg1, use_pallas=False)
    tok_params = jax.jit(tok.init, static_argnames="segment_len")(
        jax.random.key(5), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((3, 32, 32, 3)), segment_len=3)
    ckpt.export_tokenizer_safetensors(
        tok_params, str(tok_src / "tokenizer" / "model.safetensors"))
    (tok_src / "tokenizer" / "config.json").write_text(tok_cfg1.to_json())

    out = ft_root / "lm_ft"
    _run_cli("train_gpt.py", [
        "--pretrained_model_name_or_path", str(tok_src),
        "--pretrained_transformer_path", str(ft_root / "pretrained" /
                                             "transformer"),
        "--load_internal_llm",
        "--llm_config_json", str(ft_root / "lm_tiny.json"),
        "--action_conditioned", "--action_dim", "4",
        "--dataset_name", "debug", "--dataset_path", str(ft_root / "data"),
        "--resolution", "32", "--segment_length", "4",
        "--context_length", "1", "--batch_size", "2",
        "--dataloader_num_workers", "1", "--no_aug",
        # bf16 autocast (the recipes' regime): master params stay fp32, so
        # the bit-exact warm-start assertions below still hold
        "--mixed_precision", "bf16",
        # lr=0: three steps leave the warm-started llm bit-identical, which
        # makes the decoupled-source load provable from the export
        "--learning_rate", "0.0", "--lr_scheduler_type", "constant",
        "--num_warmup_steps", "0",
        "--max_train_steps", "3", "--checkpointing_steps", "3",
        "--validation_steps", "100000", "--log_steps", "1",
        "--no_validation_generation",
        "--output_dir", str(out), "--seed", "3"])
    metrics = [json.loads(l) for l in
               (out / "metrics.jsonl").read_text().splitlines()]
    assert metrics and all(np.isfinite(m["loss"]) for m in metrics)

    from safetensors.numpy import load_file
    got = load_file(str(out / "transformer" / "model.safetensors"))
    want = load_file(str(ft_root / "pretrained" / "transformer" /
                         "model.safetensors"))
    # every llm.* tensor equals the separate-path warm start (lr was 0)
    llm_keys = [k for k in got if k.startswith("llm.")]
    assert llm_keys
    for k in llm_keys:
        np.testing.assert_array_equal(got[k], want[k[len("llm."):]], k)
    # the action head exists and started fresh (not in the bare-llama file)
    assert "action_linear.weight" in got

@pytest.mark.slow
def test_reference_flag_spellings_and_bf16_autocast(ft_root):
    """The reference recipes' exact flag spellings drive the tokenizer
    trainer (aliases + compat shims), --mixed_precision bf16 runs the
    G step (fp32 losses over bf16 compute), and the log_image_steps /
    log_grad_norm_steps cadences produce their artifacts."""
    out = ft_root / "tok_refflags"
    r = _run_cli("train_tokenizer.py", [
        "--model_config_name_or_path", str(ft_root / "tok_ctx1.json"),
        "--model_type", "ctx_vqgan",
        "--mixed_precision", "bf16",
        "--resolution", "32", "--context_length", "1",
        "--segment_length", "3", "--train_batch_size", "2",
        "--oxe_data_mixes_type", "debug",
        "--dataset_path", str(ft_root / "data"),
        "--dataloader_num_workers", "1", "--no_aug",
        "--discr_learning_rate", "1e-4",
        "--discr_lr_scheduler", "constant_with_warmup",
        "--adam_beta1", "0.9", "--adam_beta2", "0.99",
        "--adam_epsilon", "1e-8", "--adam_weight_decay", "0.0",
        "--max_train_steps", "4", "--checkpointing_steps", "100000",
        "--validation_steps", "100000", "--log_steps", "1",
        "--log_image_steps", "1", "--log_grad_norm_steps", "2",
        "--disc_depth", "2", "--disc_start", "0",
        "--num_train_epochs", "1", "--allow_tf32",
        "--report_to", "wandb", "--local_rank", "0",
        "--output_dir", str(out), "--seed", "3"])
    metrics = [json.loads(l) for l in
               (out / "metrics.jsonl").read_text().splitlines()]
    assert metrics, "no metrics logged"
    for m in metrics:
        for k, v in m.items():
            if isinstance(v, float):
                assert np.isfinite(v), (k, v)
    # per-submodule grad norms appear at the log_grad_norm_steps cadence
    assert any(k.startswith("grad_norm/") for m in metrics for k in m)
    # train-batch recon grid at the log_image_steps cadence
    grids = list((out / "train_recon").glob("*.png"))
    assert grids, "no train recon grid dumped"
