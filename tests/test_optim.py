"""Optimizer utilities: schedules, no-WD masking, EMA, gradient accumulation."""

import jax
import jax.numpy as jnp
import numpy as np

from ivideogpt_tpu.train.optim import (TrainState, ema_update,
                                       make_lr_schedule, make_optimizer,
                                       per_module_grad_norms)


def test_lr_schedules():
    s = make_lr_schedule("constant", 1e-3, 10, 100)
    assert float(s(0)) == 0.0
    assert abs(float(s(10)) - 1e-3) < 1e-9
    assert abs(float(s(50)) - 1e-3) < 1e-9

    c = make_lr_schedule("cosine", 1e-3, 10, 100)
    assert abs(float(c(10)) - 1e-3) < 1e-9
    assert float(c(100)) < 1e-5


def test_ema_update():
    ema = {"w": jnp.ones(3)}
    new = {"w": jnp.zeros(3)}
    out = ema_update(ema, new, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)


def test_no_wd_mask_and_grad_norms():
    params = {"embed_tokens": {"embedding": jnp.ones((4, 4))},
              "mlp": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones(4)},
              "norm": {"scale": jnp.ones(4)}}
    tx, _ = make_optimizer(params, learning_rate=1e-3, warmup_steps=1,
                           total_steps=10, weight_decay=0.1, embed_no_wd=True)
    state = TrainState.create(params, tx)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    state = state.apply_gradients(grads)  # just runs

    norms = per_module_grad_norms(grads, depth=1)
    assert "grad_norm/mlp" in norms
    # kernel(16) + bias(4) ones -> sqrt(20)
    np.testing.assert_allclose(float(norms["grad_norm/mlp"]),
                               np.sqrt(20.0), rtol=1e-6)


def test_gradient_accumulation_equivalence():
    """k micro-steps with MultiSteps == one step with the mean gradient."""
    params = {"w": jnp.ones(4)}
    g1 = {"w": jnp.full(4, 1.0)}
    g2 = {"w": jnp.full(4, 3.0)}

    tx_acc, _ = make_optimizer(params, learning_rate=1e-2, warmup_steps=0,
                               total_steps=100, max_grad_norm=None,
                               gradient_accumulation_steps=2,
                               lr_scheduler="constant")
    s = TrainState.create(params, tx_acc)
    s = s.apply_gradients(g1)
    # after the first micro step nothing is applied yet
    np.testing.assert_allclose(np.asarray(s.params["w"]), 1.0)
    s = s.apply_gradients(g2)

    tx_ref, _ = make_optimizer(params, learning_rate=1e-2, warmup_steps=0,
                               total_steps=100, max_grad_norm=None,
                               lr_scheduler="constant")
    r = TrainState.create(params, tx_ref)
    r = r.apply_gradients({"w": jnp.full(4, 2.0)})  # mean of g1, g2

    np.testing.assert_allclose(np.asarray(s.params["w"]),
                               np.asarray(r.params["w"]), rtol=1e-6)
