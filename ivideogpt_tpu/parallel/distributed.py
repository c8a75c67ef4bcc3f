"""Multi-process (multi-host / multi-slice) bootstrap + data plumbing.

The reference's multi-device story is HF Accelerate spawning one torch DDP
process per GPU with NCCL underneath (reference train_tokenizer.py:309-317,
scripts/pretrain/oxe-64-act-free.sh:1 `accelerate launch`). The TPU-native
equivalent:

- ``jax.distributed.initialize()`` joins this process to the cluster
  (coordinator discovery via env vars or explicit flags; on Cloud TPU the
  no-arg form auto-detects).
- ONE global ``Mesh`` spans every device of every process; GSPMD inserts the
  gradient all-reduces DDP did explicitly. When more than one slice/host is
  present the "data" axis is laid out DCN-outer x ICI-inner
  (``mesh_utils.create_hybrid_device_mesh``) so gradient collectives ride
  ICI and only the DCN-sized factor crosses slices.
- Each process loads only its shard of the batch
  (``jax.make_array_from_process_local_data``), replacing the reference's
  "every rank samples independently by RNG" scheme
  (reference train_tokenizer.py:525).
- Eval features/losses are gathered across processes with
  ``multihost_utils.process_allgather`` (reference ``accelerator.gather``,
  train_gpt.py:352,467,794).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Join the jax.distributed cluster iff a multi-process run is configured.

    Returns True when running multi-process. Safe to call unconditionally:
    single-process runs (no coordinator configured anywhere) are a no-op,
    and a second call after successful initialization is also a no-op.
    """
    explicit = coordinator_address is not None
    env = (os.environ.get("JAX_COORDINATOR_ADDRESS")
           or os.environ.get("COORDINATOR_ADDRESS"))
    auto_tpu = os.environ.get("TPU_WORKER_HOSTNAMES") is not None
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    if not (explicit or env or auto_tpu):
        # no cluster configured; NOTE: do not touch jax.process_count() here
        # either — initialize() must precede any backend-initializing call
        return False
    kwargs = {}
    if explicit:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    elif env:
        kwargs = dict(coordinator_address=env)
        if os.environ.get("JAX_NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if os.environ.get("JAX_PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        if explicit:
            raise  # the user asked for a cluster; failing silently is worse
        # auto-detection tripped (e.g. a TPU tunnel exports
        # TPU_WORKER_HOSTNAMES without a reachable coordinator): run
        # single-process
        print(f"[warn] jax.distributed auto-init failed ({e}); "
              "continuing single-process")
        return False
    return jax.process_count() > 1


def make_global_mesh(n_model: int = 1, devices=None) -> Mesh:
    """("data", "model") mesh over all processes' devices.

    Multi-host/multi-slice aware: with >1 process the data axis factors as
    (num_granules x per-granule) via create_hybrid_device_mesh, so the
    "model" axis (and the inner data factor) always stays inside one
    granule's ICI domain while only the outer data factor crosses DCN.
    """
    use_all_devices = devices is None
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % n_model == 0, (n, n_model)
    if jax.process_count() > 1 and use_all_devices:
        from jax.experimental import mesh_utils
        granules = jax.process_count()
        per = n // granules
        assert per % n_model == 0, (per, n_model)
        arr = mesh_utils.create_hybrid_device_mesh(
            (per // n_model, n_model), (granules, 1),
            process_is_granule=True)
        return Mesh(arr, ("data", "model"))
    arr = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(arr, ("data", "model"))


def global_batch(batch, mesh: Mesh):
    """Assemble per-process local arrays into one global batch-sharded array.

    Each process passes only its local slice (leading axis = global_batch /
    process_count); the result is a global jax.Array sharded on "data".
    Single-process: plain device_put with the same sharding.
    """
    sharding = NamedSharding(mesh, P("data"))

    def place(x):
        x = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, batch)


def gather_across_processes(x):
    """All-gather a host array across processes (eval features/losses).

    Equivalent of reference ``accelerator.gather`` (train_gpt.py:352).
    Returns the input unchanged in single-process runs.
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(
        np.asarray(x), tiled=True))


def params_to_host(tree):
    """Replicate a (possibly globally-sharded) param pytree to host numpy.

    After ``shard_params`` the params are global jax.Arrays that are not
    fully addressable from any single process, so ``np.asarray(p)`` raises
    in multi-process runs. This gathers every leaf to every host (a
    collective — MUST be called by all processes) so process 0 can then do
    a host-side safetensors export. Single-process: plain device_get.
    """
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils
    return jax.tree_util.tree_map(
        np.asarray, multihost_utils.process_allgather(tree, tiled=True))


def is_main_process() -> bool:
    return jax.process_index() == 0


def agreed_timestamp() -> float:
    """Process-0's wall clock, agreed across all processes.

    Run directories derived from ``time.strftime`` must be IDENTICAL on
    every host (checkpoint saves are cross-host collectives into one
    path); hosts evaluating the clock independently can straddle a second
    boundary. Single-process: plain ``time.time()``.
    """
    import time
    t = time.time()
    if jax.process_count() == 1:
        return t
    from jax.experimental import multihost_utils
    return float(multihost_utils.broadcast_one_to_all(np.float64(t)))
