"""Device-mesh + sharding utilities (the DDP/NCCL replacement).

The reference is data-parallel only, via HF Accelerate wrapping torch DDP over
NCCL (reference train_tokenizer.py:309-317, train_gpt.py:672-679; SURVEY.md
§2.13). TPU-native equivalent: one ``jax.sharding.Mesh`` over ICI with axes

    ("data", "model")

- batch arrays sharded on "data" (gradient psum inserted by GSPMD — the
  all-reduce DDP does explicitly)
- parameters replicated by default; large LM projections may shard on
  "model" (tensor parallelism the reference never had, free under GSPMD)
- optimizer state can shard along "data" (ZeRO-style, also free)

Multi-slice: put DCN as the outermost "data" factor when
jax.distributed.initialize() reports multiple slices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ("data", "model") mesh over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, (n_data, n_model, n)
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split across "data"."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(path_str: str, shape) -> P:
    """Sharding rule for a parameter by name/shape.

    Heuristic GSPMD annotation: shard the big LM matmuls on "model", keep
    everything else replicated. With n_model == 1 this is a no-op, matching
    the reference's pure-DP regime.
    """
    if len(shape) < 2:
        return P()
    if "embed_tokens" in path_str or "lm_head" in path_str:
        return P(None, "model") if shape[-1] >= 128 else P()
    if any(k in path_str for k in ("q_proj", "k_proj", "v_proj",
                                   "gate_proj", "up_proj")):
        return P(None, "model")
    if any(k in path_str for k in ("o_proj", "down_proj")):
        return P("model", None)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh per param_spec."""
    def place(path, x):
        path_str = "/".join(str(k.key) if hasattr(k, "key") else str(k)
                            for k in path)
        spec = param_spec(path_str, x.shape)
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh):
    """Place batch arrays with their leading axis split across "data"."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
