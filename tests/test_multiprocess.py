"""Multi-process data parallelism: 2-process jax.distributed CPU cluster
trains identically to a single process on the same global batch.

This validates the multi-host story (replaces reference accelerate/DDP,
train_gpt.py:672-679): jax.distributed bootstrap, hybrid global mesh,
per-process batch shards assembled with make_array_from_process_local_data,
GSPMD gradient collectives.

Spawned as subprocesses because jax.distributed needs one fresh JAX runtime
per process (the in-process test runtime already owns the 8-CPU backend).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multiproc_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # workers set their own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return env


def _run_workers(num_processes, n_model=1, timeout=600, ckpt_dir=None,
                 mode="gpt"):
    coord = f"127.0.0.1:{_free_port()}"
    procs = []
    for pid in range(num_processes):
        cmd = [sys.executable, WORKER, "--coordinator", coord,
               "--num_processes", str(num_processes),
               "--process_id", str(pid), "--n_model", str(n_model),
               "--mode", mode]
        if ckpt_dir:
            cmd += ["--ckpt_dir", str(ckpt_dir)]
        procs.append(subprocess.Popen(
            cmd,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=_clean_env()))
    outs = [p.communicate(timeout=timeout) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
    return json.loads(outs[0][0].strip().splitlines()[-1])["losses"]


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    ref = _run_workers(1)
    two = _run_workers(2)
    assert len(ref) == 3 and all(np.isfinite(ref))
    np.testing.assert_allclose(two, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_two_process_dp_tp_mesh():
    # DP=2 across processes x TP=2 inside each process
    two = _run_workers(2, n_model=2)
    ref = _run_workers(1)
    np.testing.assert_allclose(two, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_two_process_tokenizer_gan_matches_single_process():
    """The tokenizer's alternating G/D step — two optimizers, spectral-norm
    power-iteration state, LPIPS, adaptive-weight targeted VJPs — trains
    identically on a 2-process DP mesh and a single process (the GAN-step
    analogue of the GPT test above; reference train_tokenizer.py:526-528)."""
    ref = _run_workers(1, mode="tokenizer")
    two = _run_workers(2, mode="tokenizer")
    assert len(ref) == 3 and all(np.isfinite(ref))
    np.testing.assert_allclose(two, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_two_process_checkpoint_save_restore(tmp_path):
    """Orbax save is a collective and must run on ALL processes (a rank-0-
    only call deadlocks in the save barrier — advisor round-2 finding).
    Both processes save mid-run, restore, and re-run step 3: the restored
    loss must reproduce the original trajectory."""
    losses = _run_workers(2, ckpt_dir=tmp_path / "ckpt")
    assert len(losses) == 4 and all(np.isfinite(losses))
    np.testing.assert_allclose(losses[3], losses[2], rtol=2e-4, atol=2e-5)
    assert (tmp_path / "ckpt" / "checkpoint-2").is_dir()
