"""safetensors bridge tests: flax <-> torch-name roundtrips + name contracts.

diffusers is not installed in this environment, so golden-file parity against
the published checkpoints is validated by (a) exact roundtrip through the
torch naming convention and (b) spot-checks that exported names match the
diffusers/HF state_dict schema (reference compressive_vq_model.py module tree,
HF LlamaForCausalLM)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivideogpt_tpu.configs import ActionModelConfig, TransformerConfig
from ivideogpt_tpu.models.llama import LlamaForCausalLM
from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
from ivideogpt_tpu.utils import checkpoint as ckpt
from tests.test_tokenizer_model import TINY
from tests.test_llama import TINY_LM


def _tree_equal(a, b, path=""):
    assert isinstance(a, dict) == isinstance(b, dict), path
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=path)


@pytest.mark.slow
def test_tokenizer_bridge_roundtrip():
    model = CompressiveVQModel(TINY, use_pallas=False)
    px = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.key(0), px[:, :2].reshape(-1, 32, 32, 3),
                        px[:, 2:].reshape(-1, 32, 32, 3), segment_len=2)
    sd = ckpt.flax_to_torch_tokenizer(params)
    back = ckpt.torch_to_flax_tokenizer(sd)
    _tree_equal(params["params"], back["params"])


def test_tokenizer_torch_names_match_diffusers_schema():
    model = CompressiveVQModel(TINY, use_pallas=False)
    px = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.key(0), px[:, :2].reshape(-1, 32, 32, 3),
                        px[:, 2:].reshape(-1, 32, 32, 3), segment_len=2)
    sd = ckpt.flax_to_torch_tokenizer(params)
    names = set(sd)
    # schema of the published diffusers checkpoints
    # (reference compressive_vq_model.py:69-152, vae.py:86-137)
    expected = [
        "encoder.conv_in.weight",
        "encoder.conv_in.bias",
        "encoder.down_blocks.0.resnets.0.norm1.weight",
        "encoder.down_blocks.0.resnets.0.conv1.weight",
        "encoder.down_blocks.0.downsamplers.0.conv.weight",
        "encoder.down_blocks.1.resnets.0.conv_shortcut.weight",
        "encoder.mid_block.resnets.0.norm1.weight",
        "encoder.conv_norm_out.weight",
        "encoder.conv_out.weight",
        "decoder.up_blocks.0.resnets.0.conv1.weight",
        "decoder.up_blocks.0.upsamplers.0.conv.weight",
        "cond_encoder.cross_att_blocks.0.att.in_proj_weight",
        "cond_encoder.cross_att_blocks.0.att.out_proj.weight",
        "cond_encoder.cross_att_blocks.0.kv_pos_emb",
        "cond_encoder.cross_att_blocks.0.q_pos_emb",
        "cond_encoder.cross_att_blocks.0.kv_norm.weight",
        "cond_decoder.cross_att_blocks.0.att.in_proj_bias",
        "cond_decoder.mid_block.attentions.0.group_norm.weight",
        "cond_decoder.mid_block.attentions.0.to_q.weight",
        "cond_decoder.mid_block.attentions.0.to_out.0.weight",
        "quant_conv.weight",
        "post_quant_conv.weight",
        "quant_linear.weight",
        "post_quant_linear.weight",
        "quantize.embedding.weight",
        "dynamics_quantize.embedding.weight",
    ]
    for name in expected:
        assert name in names, f"missing {name}; have e.g. {sorted(names)[:5]}"
    # conv weights exported as OIHW
    assert sd["encoder.conv_in.weight"].shape == (16, 3, 3, 3)
    # linear weights as (out, in)
    assert sd["quant_linear.weight"].shape[0] == TINY.embed_dim


def test_llama_bridge_roundtrip():
    model = LlamaForCausalLM(TINY_LM)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8), jnp.int32))
    sd = ckpt.flax_to_torch_llama(params)
    back = ckpt.torch_to_flax_llama(sd)
    _tree_equal(params["params"], back["params"])

    # HF schema spot checks
    for name in ["model.embed_tokens.weight",
                 "model.layers.0.self_attn.q_proj.weight",
                 "model.layers.1.mlp.gate_proj.weight",
                 "model.layers.0.input_layernorm.weight",
                 "model.layers.0.post_attention_layernorm.weight",
                 "model.norm.weight", "lm_head.weight"]:
        assert name in sd, name
    assert sd["lm_head.weight"].shape == (TINY_LM.vocab_size,
                                          TINY_LM.hidden_size)


def test_llama_forward_after_roundtrip_identical():
    model = LlamaForCausalLM(TINY_LM)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 130, (2, 16)),
                      jnp.int32)
    params = model.init(jax.random.key(0), ids)
    back = ckpt.torch_to_flax_llama(ckpt.flax_to_torch_llama(params))
    a = model.apply(params, ids)["logits"]
    b = model.apply(back, ids)["logits"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_safetensors_write_read_noncontiguous(tmp_path):
    """Regression: safetensors serializes the RAW buffer, so a transposed
    (non-contiguous) kernel written without ascontiguousarray round-trips as
    garbage. _write_safetensors must force contiguity."""
    rng = np.random.default_rng(0)
    k = rng.normal(size=(17, 43)).astype(np.float32)
    p = str(tmp_path / "t.safetensors")
    ckpt._write_safetensors(p, {"a": k.T, "b": k[::2]})
    back = ckpt._read_safetensors(p)
    np.testing.assert_array_equal(back["a"], k.T)
    np.testing.assert_array_equal(back["b"], k[::2])


def test_llama_forward_after_disk_roundtrip_identical(tmp_path):
    """Full disk roundtrip (the path every exported checkpoint takes)."""
    model = LlamaForCausalLM(TINY_LM)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 130, (2, 16)),
                      jnp.int32)
    params = model.init(jax.random.key(0), ids)
    ckpt.export_llama_safetensors(params, str(tmp_path / "model.safetensors"))
    back = ckpt.load_llama_safetensors(str(tmp_path))
    a = model.apply(params, ids)["logits"]
    b = model.apply(back, ids)["logits"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lpips_torch_loader_mapping(tmp_path):
    """load_torch_lpips maps a torchvision-vgg16-shaped state_dict (and the
    LPIPS linear heads) into the param tree — verified with a synthetic
    torch file since no pretrained weights exist in this environment."""
    import torch
    from ivideogpt_tpu.models.lpips import LPIPS, load_torch_lpips, _VGG_SLICES

    lpips = LPIPS()
    a = jnp.zeros((1, 32, 32, 3))
    params = lpips.init(jax.random.key(0), a, a)

    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    gen = np.random.default_rng(0)
    sd = {}
    in_ch = 3
    k = 0
    for s, (ch, n_convs) in enumerate(_VGG_SLICES):
        for i in range(n_convs):
            sd[f"features.{conv_idx[k]}.weight"] = torch.from_numpy(
                gen.normal(size=(ch, in_ch, 3, 3)).astype(np.float32))
            sd[f"features.{conv_idx[k]}.bias"] = torch.from_numpy(
                gen.normal(size=(ch,)).astype(np.float32))
            in_ch = ch
            k += 1
    vgg_path = tmp_path / "vgg16.pth"
    torch.save(sd, str(vgg_path))
    lin = {f"lin{s}.model.1.weight": torch.from_numpy(
        np.abs(gen.normal(size=(1, ch, 1, 1))).astype(np.float32))
        for s, (ch, _) in enumerate(_VGG_SLICES)}
    lin_path = tmp_path / "lin.pth"
    torch.save(lin, str(lin_path))

    loaded, ok = load_torch_lpips(params, str(vgg_path), str(lin_path))
    assert ok
    w0 = np.asarray(loaded["params"]["vgg"]["conv0_0"]["kernel"])
    np.testing.assert_allclose(
        w0, sd["features.0.weight"].numpy().transpose(2, 3, 1, 0))
    # self-distance is exactly zero; distinct images give positive distance
    d_same = lpips.apply(loaded, a, a)
    b = jnp.ones((1, 32, 32, 3)) * 0.5
    d_diff = lpips.apply(loaded, a, b)
    assert float(jnp.abs(d_same).max()) < 1e-6
    assert float(d_diff[0]) > 0


def _export_tiny_tokenizer_dir(tmp_path, cfg, seed=0):
    model = CompressiveVQModel(cfg, use_pallas=False)
    F = 2
    px = jnp.zeros((1, cfg.context_length + F, 32, 32, 3), jnp.float32)
    params = model.init(
        jax.random.key(seed),
        px[:, :cfg.context_length].reshape(-1, 32, 32, 3),
        px[:, cfg.context_length:].reshape(-1, 32, 32, 3), segment_len=F)
    d = tmp_path / "tokenizer"
    d.mkdir(parents=True, exist_ok=True)
    ckpt.export_tokenizer_safetensors(params, str(d / "model.safetensors"))
    (d / "config.json").write_text(cfg.to_json())
    return d, params


def test_load_tokenizer_for_context_same(tmp_path):
    d, params = _export_tiny_tokenizer_dir(tmp_path, TINY)
    loaded, cfg = ckpt.load_tokenizer_for_context(str(d), TINY.context_length)
    assert cfg.context_length == TINY.context_length
    _tree_equal(params["params"], loaded["params"])


def test_load_tokenizer_for_context_shrinks_and_aligns_cfg(tmp_path):
    """The ONE consolidated ctx-reslice path: params sliced AND config
    aligned, so the built module matches (the hand-rolled call sites used
    to slice params but keep the checkpoint ctx in the module config)."""
    d, params = _export_tiny_tokenizer_dir(tmp_path, TINY)
    loaded, cfg = ckpt.load_tokenizer_for_context(str(d), 1)
    assert cfg.context_length == 1
    # the sliced model must run a real tokenize at the new context
    model = CompressiveVQModel(cfg, use_pallas=False)
    px = jnp.linspace(0, 1, 1 * 3 * 32 * 32 * 3,
                      dtype=jnp.float32).reshape(1, 3, 32, 32, 3)
    ids, _ = model.apply(loaded, px, 1, method=model.tokenize)
    assert np.isfinite(np.asarray(ids)).all()
    # kv pos-embs kept the LAST rows (reference slice semantics)
    def find_kv(tree, out):
        for k, v in tree.items():
            if k == "kv_pos_emb":
                out.append(v)
            elif isinstance(v, dict):
                find_kv(v, out)
        return out
    olds = find_kv(params["params"], [])
    news = find_kv(loaded["params"], [])
    assert olds and len(olds) == len(news)
    for o, n in zip(olds, news):
        np.testing.assert_array_equal(np.asarray(o)[-n.shape[0]:],
                                      np.asarray(n))


def test_load_tokenizer_for_context_refuses_grow(tmp_path):
    d, _ = _export_tiny_tokenizer_dir(tmp_path, TINY.replace(context_length=1))
    import pytest
    with pytest.raises(ValueError, match="sliced, not"):
        ckpt.load_tokenizer_for_context(str(d), 2)


def test_load_tokenizer_for_context_no_config(tmp_path):
    d, params = _export_tiny_tokenizer_dir(tmp_path, TINY)
    (d / "config.json").unlink()
    loaded, cfg = ckpt.load_tokenizer_for_context(str(d), 1)
    assert cfg is None  # caller keeps its own config; no re-slice possible
    _tree_equal(params["params"], loaded["params"])


@pytest.mark.slow
def test_i3d_torch_loader_mapping(tmp_path):
    """load_torch_i3d maps a piergiaj-named torch state_dict (the format
    the reference's i3d_torchscript.pt exports to via .state_dict()) into
    the Flax tree — synthetic weights since none exist in this env. Covers
    every conv/bn leaf: the loader raising KeyError on a missing torch
    name is part of the check."""
    import torch
    from ivideogpt_tpu.models.i3d import I3D, load_torch_i3d

    model = I3D(num_classes=40, resize=False)
    vid = jnp.zeros((1, 9, 64, 64, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), vid)

    gen = np.random.default_rng(0)
    sd = {}

    def emit(mod: dict, base: str):
        k = np.asarray(mod["conv3d"]["kernel"])        # DHWIO
        sd[f"{base}.conv3d.weight"] = torch.from_numpy(
            0.05 * gen.normal(size=k.transpose(4, 3, 0, 1, 2).shape)
            .astype(np.float32))
        if "bias" in mod["conv3d"]:
            sd[f"{base}.conv3d.bias"] = torch.from_numpy(
                gen.normal(size=k.shape[-1]).astype(np.float32))
        if "bn_scale" in mod:
            c = k.shape[-1]
            sd[f"{base}.bn.weight"] = torch.from_numpy(
                np.abs(gen.normal(size=c)).astype(np.float32))
            sd[f"{base}.bn.bias"] = torch.from_numpy(
                gen.normal(size=c).astype(np.float32))
            sd[f"{base}.bn.running_mean"] = torch.from_numpy(
                gen.normal(size=c).astype(np.float32))
            sd[f"{base}.bn.running_var"] = torch.from_numpy(
                np.abs(gen.normal(size=c)).astype(np.float32) + 0.5)

    for mod, tree in params["params"].items():
        if mod.startswith("Mixed"):
            for branch in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b"):
                emit(tree[branch], f"{mod}.{branch}")
        else:
            emit(tree, mod)
    path = tmp_path / "i3d.pth"
    torch.save(sd, str(path))

    loaded, ok = load_torch_i3d(params, str(path))
    assert ok
    w = np.asarray(loaded["params"]["Conv3d_1a_7x7"]["conv3d"]["kernel"])
    np.testing.assert_allclose(
        w, sd["Conv3d_1a_7x7.conv3d.weight"].numpy().transpose(2, 3, 4, 1, 0))
    m = np.asarray(loaded["params"]["Mixed_5c"]["b3b"]["bn_mean"])
    np.testing.assert_allclose(m, sd["Mixed_5c.b3b.bn.running_mean"].numpy())
    # loaded weights actually flow: logits move away from the random-init
    # output and stay finite
    out0 = np.asarray(jax.jit(model.apply)(params, vid))
    out1 = np.asarray(jax.jit(model.apply)(loaded, vid))
    assert np.isfinite(out1).all()
    assert np.abs(out1 - out0).max() > 1e-4

    missing, ok2 = load_torch_i3d(params, str(tmp_path / "nope.pth"))
    assert not ok2 and missing is params
