"""Bench regression fence (round-2 verdict: "fence the 5x gate").

CPU timing says nothing about the TPU bench, but the rollout's lowered HLO
STRUCTURE is backend-independent and pins the optimizations the 5x number
rests on: the frame-structured scan layout, the sort-free bit-search top-k,
pre-split rng (no in-loop threefry), and the absence of custom calls. A
drift in these counts means the generated program changed shape — re-run
bench.py on TPU before trusting the 5x gate. The TPU bench itself remains
the release gate (BENCH_r*.json).
"""

import jax
import jax.numpy as jnp
import pytest

from ivideogpt_tpu import generation, tokens
from ivideogpt_tpu.configs import ActionModelConfig, LLAMA_BASE
from ivideogpt_tpu.models.action_model import HeadModelWithAction


@pytest.mark.slow
def test_generate_lowered_structure_pinned():
    B, ctx, T = 4, 2, 16
    head = ActionModelConfig(action_dim=4, context_length=ctx,
                             segment_length=T)
    lm = HeadModelWithAction(LLAMA_BASE, head, dtype=jnp.bfloat16)
    L = tokens.seq_len(ctx, T)
    P1 = tokens.prelude_len(ctx) + 1
    ids = jax.ShapeDtypeStruct((1, L), jnp.int32)
    act1 = jax.ShapeDtypeStruct((1, T, 4), jnp.float32)
    params = jax.eval_shape(lm.init, jax.random.key(0), ids, ids, act1)
    prelude = jax.ShapeDtypeStruct((B, P1), jnp.int32)
    action = jax.ShapeDtypeStruct((B, T, 4), jnp.float32)
    key = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)

    txt = generation.generate.lower(
        lm, params, prelude, key, segment_length=T, context_length=ctx,
        action=action, cache_dtype=jnp.int8).as_text()

    # 14 per-frame inner scans + the prefill/unembed control flow; a count
    # change means the frame-structured rollout layout changed
    assert txt.count("stablehlo.while") == 16, txt.count("stablehlo.while")
    # the exact top-k is the sort-free bit search: any sort / TopK custom
    # call appearing here would put the 2.6x sampling win at risk
    assert txt.count("stablehlo.sort") == 0
    assert txt.count("chlo.top_k") == 0
    assert txt.count("stablehlo.custom_call") == 0
    # rng keys are pre-split outside the scans (stablehlo.rng would mean an
    # in-loop generator sneaked in; threefry lowers to arithmetic, so this
    # stays 0 either way — it guards against lowering-path changes)
    assert txt.count("stablehlo.rng") == 0
    # total matmul count: embed/unembed/attention/MLP GEMMs across the
    # unrolled frame loop. Wide tolerance band — catches structural blowups
    # (e.g. re-reading the full cache per step doubles the dots), not
    # incidental +-1 changes
    n_dots = txt.count("stablehlo.dot_general")
    assert 2800 <= n_dots <= 3500, n_dots


def test_bench_subprocess_retries_tunnel_outage(monkeypatch):
    """A transient tunnel outage (backend UNAVAILABLE / hung init) must not
    fail the round: run_one_subprocess retries with backoff and returns the
    first successful child result."""
    import json
    import subprocess
    import sys as _sys
    sys_path_root = __import__("os").path.dirname(
        __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
    _sys.path.insert(0, sys_path_root)
    import bench

    calls = {"n": 0}

    def fake_run(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            return subprocess.CompletedProcess(
                a, 1, stdout="", stderr="RuntimeError: Unable to initialize "
                "backend 'axon': UNAVAILABLE: TPU backend setup error")
        return subprocess.CompletedProcess(
            a, 0, stdout=json.dumps({"ctx": 2, "fps": 1.0, "dt": 1.0,
                                     "dt_median": 1.0, "blocks": [1.0],
                                     "comp": 0.0, "batch": 4,
                                     "device": "fake"}) + "\n", stderr="")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    import time as _time
    res = bench.run_one_subprocess(2, _time.time() + 300, 8)
    assert calls["n"] == 2 and res["fps"] == 1.0

    # a non-transient child failure still raises
    def fake_run_fatal(*a, **kw):
        return subprocess.CompletedProcess(a, 1, stdout="",
                                           stderr="ValueError: boom")
    monkeypatch.setattr(subprocess, "run", fake_run_fatal)
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        bench.run_one_subprocess(2, _time.time() + 300, 8)
