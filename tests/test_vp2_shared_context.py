"""VP2 shared-context dedup: identical contexts produce identical context
token grids (and the fast path triggers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_vp2 import TINY, TINY_LM
from ivideogpt_tpu.configs import ActionModelConfig
from ivideogpt_tpu.models.action_model import HeadModelWithAction
from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
from ivideogpt_tpu.vp.interface import IVideoGPTPredictor


@pytest.mark.slow
def test_shared_context_matches_per_candidate():
    from ivideogpt_tpu import tokens
    ctx, seg = 2, 12
    tokenizer = CompressiveVQModel(TINY, use_pallas=False)
    px = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    tok_params = tokenizer.init(jax.random.key(0),
                                px[:, :2].reshape(-1, 32, 32, 3),
                                px[:, 2:].reshape(-1, 32, 32, 3),
                                segment_len=2)
    head = ActionModelConfig(
        action_dim=4, context_length=ctx, segment_length=seg,
        tokens_per_context=TINY.ctx_tokens_per_frame,
        tokens_per_dyna=TINY.dyn_tokens_per_frame)
    model = HeadModelWithAction(TINY_LM, head)
    L = tokens.seq_len(ctx, seg, ctx_tokens=TINY.ctx_tokens_per_frame,
                       dyn_tokens=TINY.dyn_tokens_per_frame)
    lm_params = model.init(jax.random.key(1), jnp.zeros((1, L), jnp.int32),
                           jnp.zeros((1, L), jnp.int32),
                           jnp.zeros((1, seg, 4), jnp.float32))

    predictor = IVideoGPTPredictor(tokenizer, tok_params, model, lm_params,
                                   top_k=5)
    rng = np.random.default_rng(0)
    one_ctx = rng.uniform(0, 1, (1, 2, 32, 32, 3)).astype(np.float32)
    shared_batch = {
        "video": np.repeat(one_ctx, 4, axis=0),  # CEM population
        "actions": rng.uniform(-1, 1, (4, 10, 4)).astype(np.float32)}
    out = predictor(shared_batch)
    assert out["rgb"].shape == (4, 11, 32, 32, 3)
    assert np.isfinite(out["rgb"]).all()
