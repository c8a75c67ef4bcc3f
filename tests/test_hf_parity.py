"""Executed parity vs Hugging Face transformers (torch CPU).

The published iVideoGPT transformers are HF LlamaForCausalLM checkpoints
(reference train_gpt.py:585-597, inference/predict.py:94-113). These tests
build a REAL HF torch model, move its weights through our safetensors
bridge, and require logit agreement — the strongest checkpoint-compat
evidence available in this environment (no diffusers / published weights).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ivideogpt_tpu.configs import TransformerConfig
from ivideogpt_tpu.models.llama import LlamaForCausalLM
from ivideogpt_tpu.utils import checkpoint as ckpt


def _configs(vocab=130, hidden=64, inter=128, layers=2, heads=4, maxpos=256):
    ours = TransformerConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=heads, max_position_embeddings=maxpos,
        rms_norm_eps=1e-6, attention_dropout=0.0)
    theirs = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=heads, max_position_embeddings=maxpos,
        rms_norm_eps=1e-6, attention_dropout=0.0, tie_word_embeddings=False,
        attn_implementation="eager")
    return ours, theirs


@pytest.mark.slow
def test_hf_llama_logit_parity_torch_to_flax():
    ours_cfg, hf_cfg = _configs()
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = ckpt.torch_to_flax_llama(sd)

    ours = LlamaForCausalLM(ours_cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, hf_cfg.vocab_size, (3, 17)).astype(np.int32)

    with torch.no_grad():
        ref = hf(torch.from_numpy(ids).long()).logits.numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(ids))["logits"])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_hf_llama_logit_parity_flax_to_torch():
    """Our exported checkpoints load into stock HF and agree."""
    ours_cfg, hf_cfg = _configs()
    ours = LlamaForCausalLM(ours_cfg)
    ids = np.random.default_rng(1).integers(
        0, hf_cfg.vocab_size, (2, 23)).astype(np.int32)
    params = ours.init(jax.random.key(0), jnp.asarray(ids))

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in ckpt.flax_to_torch_llama(params).items()}
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    missing, unexpected = hf.load_state_dict(sd, strict=False)
    # rotary inv_freq buffers are recomputed by HF; nothing else may differ
    assert all("rotary" in k or "inv_freq" in k for k in missing), missing
    assert not unexpected, unexpected

    with torch.no_grad():
        ref = hf(torch.from_numpy(ids).long()).logits.numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(ids))["logits"])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_hf_generate_greedy_matches_ours():
    """Greedy continuation parity: HF generate (do_sample=False) and our
    KV-cached argmax produce the same token ids."""
    ours_cfg, hf_cfg = _configs()
    torch.manual_seed(1)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = ckpt.torch_to_flax_llama(sd)
    ours = LlamaForCausalLM(ours_cfg)

    ids = np.random.default_rng(2).integers(0, 130, (2, 9)).astype(np.int32)
    new = 12
    with torch.no_grad():
        ref = hf.generate(torch.from_numpy(ids).long(), max_new_tokens=new,
                          do_sample=False).numpy()

    # our cached greedy loop
    B, P = ids.shape
    cache = ours.apply(params, B, P + new, jnp.bfloat16,
                       method=ours.init_cache)
    emb = ours.apply(params, jnp.asarray(ids), method=ours.embed)
    hidden, cache = ours.apply(params, emb, cache, 0,
                               method=ours.forward_cached)
    tok = jnp.argmax(ours.apply(params, hidden[:, -1], method=ours.unembed),
                     axis=-1)
    out = [tok]
    for s in range(new - 1):
        emb = ours.apply(params, tok[:, None], method=ours.embed)
        hidden, cache = ours.apply(params, emb, cache, P + s,
                                   method=ours.forward_cached)
        tok = jnp.argmax(
            ours.apply(params, hidden[:, 0], method=ours.unembed), axis=-1)
        out.append(tok)
    got = np.stack([np.asarray(t) for t in out], axis=1)
    np.testing.assert_array_equal(got, ref[:, P:])


@pytest.mark.slow
def test_peft_wrapped_checkpoint_folds_to_merged_logits():
    """The reference's LoRA-finetuned VP2 transformers are saved as the
    peft-WRAPPED state_dict in one model.safetensors (reference
    vp/ivideogpt_interface.py:56-68). Build a REAL peft-wrapped HF llama
    with the reference's target_modules, fold it through
    merge_peft_state_dict, and require logit agreement with torch's own
    merge (peft merge_and_unload) — genuine-format evidence that a
    published finetuned checkpoint loads here unmodified."""
    peft = pytest.importorskip("peft")
    ours_cfg, hf_cfg = _configs()
    torch.manual_seed(3)
    hf = transformers.LlamaForCausalLM(hf_cfg)
    pcfg = peft.LoraConfig(
        task_type=peft.TaskType.CAUSAL_LM, inference_mode=False,
        r=4, lora_alpha=16, lora_dropout=0.0,
        # reference vp/ivideogpt_interface.py:62-63 target list
        target_modules=["q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                        "up_proj", "down_proj", "embed_tokens", "lm_head"])
    wrapped = peft.get_peft_model(hf, pcfg)
    with torch.no_grad():  # lora_B inits to zero: make the deltas real
        for n, p in wrapped.named_parameters():
            if "lora_B" in n or "lora_embedding_B" in n:
                p.normal_(0, 0.05)
    sd = {k: v.numpy().copy() for k, v in wrapped.state_dict().items()}
    assert ckpt.is_peft_state_dict(sd)

    ids = np.random.default_rng(5).integers(0, 130, (2, 13)).astype(np.int32)
    merged = wrapped.merge_and_unload().eval()
    with torch.no_grad():
        ref = merged(torch.from_numpy(ids).long()).logits.numpy()

    folded = ckpt.merge_peft_state_dict(sd, alpha=16, rank=4)
    assert not ckpt.is_peft_state_dict(folded)
    params = ckpt.torch_to_flax_llama(folded)
    ours = LlamaForCausalLM(ours_cfg)
    got = np.asarray(ours.apply(params, jnp.asarray(ids))["logits"])
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)

    # wrong rank is rejected loudly, not silently mis-scaled
    with pytest.raises(ValueError, match="rank"):
        ckpt.merge_peft_state_dict(sd, alpha=16, rank=8)
