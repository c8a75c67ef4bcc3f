"""Checkpointing: Orbax training state + safetensors bridge for published
HF checkpoints.

The reference persists three ways (SURVEY.md §5.4): HF save_pretrained/
from_pretrained safetensors for model export, accelerate save_state for
trainer state, raw torch.save for MBRL. Here:

- :func:`save_train_state` / :func:`restore_train_state` — Orbax, step-named
  dirs with optional latest-only pruning (reference train_tokenizer.py:106-112)
- :func:`load_tokenizer_safetensors` / :func:`load_llama_safetensors` — map
  the published HF/diffusers weight names (hub layout ``{model}/tokenizer``,
  ``{model}/transformer``, reference inference/predict.py:94-113) into our
  NHWC Flax trees
- :func:`export_tokenizer_safetensors` / :func:`export_llama_safetensors` —
  the inverse, so reference users can consume checkpoints trained here
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Orbax train-state persistence
# ---------------------------------------------------------------------------


def save_train_state(ckpt_dir: str, step: int, state, keep: Optional[int] = None):
    """Save under {ckpt_dir}/checkpoint-{step}; prune older if keep given.

    MUST be called by every process in a multi-process run: Orbax runs
    cross-host barriers inside ``save`` and each process writes its
    addressable shards (primary host writes metadata). Pruning happens on
    process 0 only, after the save barrier completes.
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, f"checkpoint-{step}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, {"params": state.params, "opt_state": state.opt_state,
                          "step": np.asarray(step)}, force=True)
    if keep is not None and jax.process_index() == 0:
        ckpts = sorted(
            (d for d in os.listdir(ckpt_dir) if d.startswith("checkpoint-")),
            key=lambda d: int(d.split("-")[1]))
        for d in ckpts[:-keep]:
            import shutil
            shutil.rmtree(os.path.join(ckpt_dir, d))


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = [d for d in os.listdir(ckpt_dir) if d.startswith("checkpoint-")]
    if not ckpts:
        return None
    best = max(ckpts, key=lambda d: int(d.split("-")[1]))
    return os.path.join(ckpt_dir, best)


def restore_train_state(path: str, template):
    """Restore {params, opt_state, step} matching the template pytree."""
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        target = {"params": template.params, "opt_state": template.opt_state,
                  "step": np.asarray(0)}
        restored = ckptr.restore(os.path.abspath(path), item=target)
    return template.replace(params=restored["params"],
                            opt_state=restored["opt_state"],
                            step=jnp.asarray(int(restored["step"]), jnp.int32))


def save_pytree_checkpoint(ckpt_dir: str, step: int, tree,
                           keep: Optional[int] = None):
    """Save an arbitrary pytree under {ckpt_dir}/checkpoint-{step}.

    Used for trainer states that go beyond one TrainState — e.g. the
    tokenizer GAN run persists generator + discriminator optimizers, BN
    stats, and EMA params together, matching the reference's
    ``accelerator.save_state`` which captures models+opts+RNG
    (reference train_tokenizer.py:87-112).
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, f"checkpoint-{step}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    if keep is not None and jax.process_index() == 0:
        ckpts = sorted(
            (d for d in os.listdir(ckpt_dir) if d.startswith("checkpoint-")),
            key=lambda d: int(d.split("-")[1]))
        for d in ckpts[:-keep]:
            import shutil
            shutil.rmtree(os.path.join(ckpt_dir, d))


def restore_pytree_checkpoint(path: str, template):
    """Restore a pytree saved by :func:`save_pytree_checkpoint`."""
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), item=template)


# ---------------------------------------------------------------------------
# safetensors <-> flax param mapping
# ---------------------------------------------------------------------------

def _read_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file
    if os.path.isdir(path):
        merged = {}
        for f in sorted(os.listdir(path)):
            if f.endswith(".safetensors"):
                merged.update(load_file(os.path.join(path, f)))
        if not merged:
            raise FileNotFoundError(f"no .safetensors under {path}")
        return merged
    return load_file(path)


def _write_safetensors(path: str, tensors: Dict[str, np.ndarray]):
    from safetensors.numpy import save_file
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # safetensors writes the raw buffer: a non-contiguous view (e.g. the
    # .T of every exported linear kernel) would be SILENTLY serialized as
    # its base buffer's bytes — force contiguity
    tensors = {k: np.ascontiguousarray(v) for k, v in tensors.items()}
    save_file(tensors, path)


def _conv_in(w):   # torch OIHW -> flax HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _conv_out(w):  # flax HWIO -> torch OIHW
    return np.transpose(w, (3, 2, 0, 1))


def _set(tree: dict, flax_path: str, value):
    keys = flax_path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = jnp.asarray(value)


def torch_to_flax_tokenizer(sd: Dict[str, np.ndarray]) -> dict:
    """Map a diffusers CompressiveVQModel state_dict into our Flax tree."""
    params: dict = {}

    def put(path, v):
        _set(params, path, v)

    handled = set()

    # cross-attention packed in_proj: split into q/k/v
    for key in list(sd):
        m = re.match(r"(.*cross_att_blocks)\.(\d+)\.att\.in_proj_(weight|bias)$",
                     key)
        if not m:
            continue
        base, idx, kind = m.groups()
        flax_base = base.replace(".", "/") + f"_{idx}"
        flax_base = re.sub(r"(\w+)/(\d+)/", r"\1_\2/", flax_base)
        v = sd[key]
        c = v.shape[0] // 3
        names = ["q_proj", "k_proj", "v_proj"]
        for i, n in enumerate(names):
            chunk = v[i * c:(i + 1) * c]
            if kind == "weight":
                put(f"{flax_base}/{n}/kernel", chunk.T)
            else:
                put(f"{flax_base}/{n}/bias", chunk)
        handled.add(key)

    for key, v in sd.items():
        if key in handled:
            continue
        # fuse list indices into module names: a.0.b -> a_0/b
        fk = re.sub(r"\.(\d+)", r"_\1", key)
        parts = fk.split(".")
        leaf = parts[-1]
        mods = parts[:-1]

        # renames
        mods = [m.replace("att_out_proj", "out_proj") for m in mods]
        joined = "/".join(mods)
        joined = joined.replace("att/out_proj", "out_proj")
        joined = joined.replace("/to_out_0", "/to_out")

        if key == "quantize.embedding.weight":
            put("codebook", v)
            continue
        if key == "dynamics_quantize.embedding.weight":
            put("dyn_codebook", v)
            continue
        if ".att." in key:  # out_proj
            joined = joined.replace("att/", "")
            if leaf == "weight":
                put(f"{joined}/kernel", v.T)
            else:
                put(f"{joined}/bias", v)
            continue

        if leaf in ("kv_pos_emb", "q_pos_emb"):
            # learned positional embeddings: the leaf IS the param name
            put(f"{joined}/{leaf}", v)
            continue
        if leaf == "bias":
            put(f"{joined}/bias", v)
            continue
        assert leaf == "weight", key
        if v.ndim == 4:  # conv
            put(f"{joined}/kernel", _conv_in(v))
        elif v.ndim == 2:  # linear
            put(f"{joined}/kernel", v.T)
        elif v.ndim == 1:  # norm scale
            put(f"{joined}/scale", v)
        else:
            raise ValueError(f"unmapped {key} {v.shape}")

    return {"params": params}


def load_tokenizer_safetensors(path: str) -> dict:
    return torch_to_flax_tokenizer(_read_safetensors(path))


def torch_to_flax_llama(sd: Dict[str, np.ndarray],
                        prefix: str = "") -> dict:
    """Map an HF LlamaForCausalLM state_dict into our Flax tree."""
    params: dict = {}

    def put(path, v):
        _set(params, path, v)

    for key, v in sd.items():
        k = key
        if prefix and k.startswith(prefix):
            k = k[len(prefix):]
        if k.startswith("model."):
            k = k[len("model."):]
        if "rotary_emb" in k:
            continue  # inv_freq buffers in older HF exports
        if k == "embed_tokens.weight":
            put("embed_tokens/embedding", v)
        elif k == "norm.weight":
            put("norm/weight", v)
        elif k == "lm_head.weight":
            put("lm_head/kernel", v.T)
        else:
            m = re.match(r"layers\.(\d+)\.(.*)\.weight$", k)
            if not m:
                raise ValueError(f"unmapped llama key {key}")
            i, rest = m.groups()
            rest = rest.replace(".", "/")
            if rest.endswith("layernorm"):
                put(f"layers_{i}/{rest}/weight", v)
            else:
                put(f"layers_{i}/{rest}/kernel", v.T)
    return {"params": params}


def load_llama_safetensors(path: str) -> dict:
    return torch_to_flax_llama(merge_peft_state_dict(_read_safetensors(path)))


def is_peft_state_dict(sd: Dict[str, np.ndarray]) -> bool:
    return any(".lora_A." in k or ".lora_embedding_A." in k for k in sd)


def merge_peft_state_dict(sd: Dict[str, np.ndarray],
                          alpha: Optional[float] = None,
                          rank: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Fold a peft-wrapped state_dict into a plain one.

    The reference's LoRA-finetuned transformers are saved as ONE
    ``model.safetensors`` holding the peft-WRAPPED module's state_dict
    (reference vp/ivideogpt_interface.py:56-68: ``get_peft_model`` then
    ``model.load_state_dict(state_dict, strict=True)``): linears targeted
    by the adapter appear as ``X.base_layer.weight`` +
    ``X.lora_A.default.weight`` [r, in] + ``X.lora_B.default.weight``
    [out, r]; embeddings as ``X.base_layer.weight`` +
    ``X.lora_embedding_A.default`` [r, num_emb] +
    ``X.lora_embedding_B.default`` [dim, r]; and every module path gains a
    ``base_model.model.`` prefix. This folds the adapters into the base
    weights (W += alpha/r * B @ A — peft Linear.merge) and strips the
    wrapper naming, so the result feeds the plain torch->flax mappers.

    alpha/rank default to what the shapes imply only if they cancel
    (alpha == rank, peft's default lora_alpha=8=r); otherwise they are
    REQUIRED — the file does not record them (peft keeps them in
    adapter_config.json, which the reference's save path does not write).
    """
    if not is_peft_state_dict(sd):
        return sd
    rank_seen = next(v.shape[0] for k, v in sd.items()
                     if ".lora_A.default.weight" in k
                     or ".lora_embedding_A.default" in k)
    if rank is None and alpha is None:
        scale = 1.0  # alpha == r cancels; any other ratio must be passed in
    elif rank is None or alpha is None:
        raise ValueError("pass both alpha and rank, or neither")
    else:
        if rank != rank_seen:
            raise ValueError(f"rank={rank} but adapters in file have "
                             f"rank {rank_seen}")
        scale = alpha / rank
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if ".lora_" in k:
            continue
        k2 = k.replace("base_model.model.", "").replace(".base_layer.", ".")
        v = np.asarray(v, np.float32)
        if ".base_layer.weight" in k:  # an adapted module's base weight
            a_key = k.replace(".base_layer.weight", ".lora_A.default.weight")
            b_key = k.replace(".base_layer.weight", ".lora_B.default.weight")
            ea_key = k.replace(".base_layer.weight",
                               ".lora_embedding_A.default")
            eb_key = k.replace(".base_layer.weight",
                               ".lora_embedding_B.default")
            if a_key in sd:    # Linear: W[out,in] += s * B[out,r] @ A[r,in]
                v = v + scale * (np.asarray(sd[b_key], np.float32)
                                 @ np.asarray(sd[a_key], np.float32))
            elif ea_key in sd:  # Embedding: W[n,d] += s * (B[d,r]@A[r,n]).T
                v = v + scale * (np.asarray(sd[eb_key], np.float32)
                                 @ np.asarray(sd[ea_key], np.float32)).T
        out[k2] = v
    return out


def load_llm_only_safetensors(path: str) -> dict:
    """Load ONLY the internal llm from a transformer checkpoint.

    The reference's ``load_internal_llm`` path loads a bare
    LlamaForCausalLM state_dict into ``model.llm`` (reference
    mbrl/video_predictor.py:84-89) — the published act-free transformers
    are bare-llama files. Checkpoints exported by our ``train_gpt.py`` are
    full HeadModelWithAction state_dicts (``llm.*`` + head linears); for
    those, strip to the llm subtree so the heads stay fresh-init.
    """
    sd = merge_peft_state_dict(_read_safetensors(path))
    if any(k.startswith("llm.") for k in sd):
        sd = {k[len("llm."):]: v for k, v in sd.items()
              if k.startswith("llm.")}
    return torch_to_flax_llama(sd)


def torch_to_flax_action_model(sd: Dict[str, np.ndarray],
                               lora_alpha: Optional[float] = None,
                               lora_rank: Optional[int] = None) -> dict:
    """Map a HeadModelWithAction state_dict (llm.* + head linears,
    reference transformer/action_model.py:19-45) into our Flax tree.

    Accepts both plain and peft-wrapped llm subtrees (the reference's
    LoRA-finetuned VP2 checkpoints are the latter — one model.safetensors
    with the adapters embedded); pass lora_alpha/lora_rank when they
    differ (peft applies alpha/r at forward time, so the fold needs it)."""
    sd = merge_peft_state_dict(sd, alpha=lora_alpha, rank=lora_rank)
    llm_sd = {k[len("llm."):]: v for k, v in sd.items()
              if k.startswith("llm.")}
    params = {"llm": torch_to_flax_llama(llm_sd)["params"]}
    for head in ("action_linear", "reward_linear", "action_recon_linear"):
        if f"{head}.weight" in sd:
            params[head] = {"kernel": jnp.asarray(sd[f"{head}.weight"].T),
                            "bias": jnp.asarray(sd[f"{head}.bias"])}
    return {"params": params}


def load_action_model_safetensors(path: str,
                                  lora_alpha: Optional[float] = None,
                                  lora_rank: Optional[int] = None) -> dict:
    return torch_to_flax_action_model(_read_safetensors(path),
                                      lora_alpha=lora_alpha,
                                      lora_rank=lora_rank)


def flax_to_torch_action_model(params: dict) -> Dict[str, np.ndarray]:
    tree = params["params"]
    sd = {f"llm.{k}": v for k, v in
          flax_to_torch_llama({"params": tree["llm"]}).items()}
    for head in ("action_linear", "reward_linear", "action_recon_linear"):
        if head in tree:
            sd[f"{head}.weight"] = np.asarray(tree[head]["kernel"]).T
            sd[f"{head}.bias"] = np.asarray(tree[head]["bias"])
    return sd


def load_tokenizer_for_context(tok_dir: str, target_context: int):
    """Load a tokenizer checkpoint dir re-sliced to ``target_context``.

    The ONE place that keeps params and config consistent across the three
    finetune-at-different-context surfaces (train_gpt, train_tokenizer,
    MBPO) — each used to hand-roll :func:`set_context_length` with its own
    guard, and only one of them also updated the module config.

    Returns ``(params, cfg)`` where ``cfg.context_length == target_context``
    (build the ``CompressiveVQModel`` from this cfg), or ``(params, None)``
    when the dir has no ``config.json`` (caller keeps its own config; no
    re-slice is possible without knowing the checkpoint's context).

    Raises ``ValueError`` when the checkpoint context is SMALLER than the
    target: the reference slices kv pos-embs, never grows them
    (reference compressive_vq_model.py:154-158).
    """
    from ivideogpt_tpu.configs import CompressiveVQConfig

    params = load_tokenizer_safetensors(tok_dir)
    cfg_path = os.path.join(tok_dir, "config.json")
    if not os.path.exists(cfg_path):
        return params, None
    with open(cfg_path) as f:
        cfg = CompressiveVQConfig.from_json(f.read())
    if target_context == cfg.context_length:
        return params, cfg
    if target_context > cfg.context_length:
        raise ValueError(
            f"checkpoint tokenizer context {cfg.context_length} < requested "
            f"{target_context}: kv positional embeddings can be sliced, not "
            f"grown — finetune at context <= {cfg.context_length}")
    print(f"[warn] pretrained tokenizer context {cfg.context_length} != "
          f"requested {target_context}; re-slicing kv pos-embs")
    params = set_context_length(params, cfg.context_length, target_context)
    return params, cfg.replace(context_length=target_context)


def set_context_length(params: dict, old_context: int, new_context: int) -> dict:
    """Re-slice cross-attention kv positional embeddings for a new context
    length (reference compressive_vq_model.py:154-158 /
    conditional_vae.py:34-36: keep the LAST new_ctx * R^2 rows).

    Use together with a CompressiveVQConfig.replace(context_length=...)
    model so the module shapes match the sliced params.
    """
    if new_context == old_context:
        return params
    assert new_context < old_context, \
        "can only shrink context (the reference slices, never grows)"

    def visit(path, x):
        names = [str(getattr(k, "key", k)) for k in path]
        if names and names[-1] == "kv_pos_emb":
            rows = x.shape[0]
            per_frame = rows // old_context
            return x[-new_context * per_frame:]
        return x

    return jax.tree_util.tree_map_with_path(visit, params)


# ---------------------------------------------------------------------------
# export (flax -> torch names), so reference-style consumers can load ours
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        name = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, name))
        else:
            out[name] = np.asarray(v)
    return out


def flax_to_torch_tokenizer(params: dict) -> Dict[str, np.ndarray]:
    flat = _flatten(params["params"])
    sd = {}
    packed: Dict[str, dict] = {}
    for path, v in flat.items():
        parts = path.split("/")
        leaf = parts[-1]
        mods = parts[:-1]
        if path == "codebook":
            sd["quantize.embedding.weight"] = v
            continue
        if path == "dyn_codebook":
            sd["dynamics_quantize.embedding.weight"] = v
            continue
        # cross-attention projections repack into in_proj / out_proj
        if mods and mods[-1] in ("q_proj", "k_proj", "v_proj", "out_proj") \
                and "cross_att_blocks" in path:
            packed.setdefault("/".join(mods[:-1]), {})[f"{mods[-1]}.{leaf}"] = v
            continue
        torch_name = ".".join(mods + [leaf])
        torch_name = re.sub(r"_(\d+)(\.|$)", r".\1\2", torch_name)
        torch_name = torch_name.replace(".to_out.", ".to_out.0.")
        if leaf == "kernel":
            base = torch_name[: -len(".kernel")]
            if v.ndim == 4:
                sd[base + ".weight"] = _conv_out(v)
            else:
                sd[base + ".weight"] = v.T
        elif leaf == "scale":
            sd[torch_name[: -len(".scale")] + ".weight"] = v
        else:
            sd[torch_name] = v

    for block, tensors in packed.items():
        torch_block = re.sub(r"_(\d+)(/|$)", r".\1\2", block).replace("/", ".")
        w = np.concatenate([tensors["q_proj.kernel"].T,
                            tensors["k_proj.kernel"].T,
                            tensors["v_proj.kernel"].T], axis=0)
        b = np.concatenate([tensors["q_proj.bias"], tensors["k_proj.bias"],
                            tensors["v_proj.bias"]], axis=0)
        sd[f"{torch_block}.att.in_proj_weight"] = w
        sd[f"{torch_block}.att.in_proj_bias"] = b
        sd[f"{torch_block}.att.out_proj.weight"] = tensors["out_proj.kernel"].T
        sd[f"{torch_block}.att.out_proj.bias"] = tensors["out_proj.bias"]
    return sd


def export_tokenizer_safetensors(params: dict, path: str):
    _write_safetensors(path, flax_to_torch_tokenizer(params))


def flax_to_torch_llama(params: dict) -> Dict[str, np.ndarray]:
    flat = _flatten(params["params"])
    sd = {}
    for path, v in flat.items():
        if path == "embed_tokens/embedding":
            sd["model.embed_tokens.weight"] = v
        elif path == "norm/weight":
            sd["model.norm.weight"] = v
        elif path == "lm_head/kernel":
            sd["lm_head.weight"] = v.T
        else:
            m = re.match(r"layers_(\d+)/(.*)/(kernel|weight)$", path)
            if not m:
                raise ValueError(f"unmapped flax key {path}")
            i, rest, leaf = m.groups()
            rest = rest.replace("/", ".")
            sd[f"model.layers.{i}.{rest}.weight"] = (
                v.T if leaf == "kernel" else v)
    return sd


def export_llama_safetensors(params: dict, path: str):
    _write_safetensors(path, flax_to_torch_llama(params))
