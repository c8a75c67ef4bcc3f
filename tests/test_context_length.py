"""set_context_length: ctx=2 -> ctx=1 param re-slicing works end to end
(the reference's BAIR eval uses ctx=1 on a ctx=2-pretrained tokenizer,
scripts/evaluation/bair-64-act-cond.sh)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
from ivideogpt_tpu.utils.checkpoint import set_context_length
from tests.test_tokenizer_model import TINY


@pytest.mark.slow
def test_shrink_context_length():
    model2 = CompressiveVQModel(TINY, use_pallas=False)
    px = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 4, 32, 32, 3)),
                     jnp.float32)
    params2 = model2.init(jax.random.key(0), px[:, :2].reshape(-1, 32, 32, 3),
                          px[:, 2:].reshape(-1, 32, 32, 3), segment_len=2)

    cfg1 = TINY.replace(context_length=1)
    model1 = CompressiveVQModel(cfg1, use_pallas=False)
    params1 = set_context_length(params2, 2, 1)

    # tokenize with ctx=1 must produce the ctx=1 stream layout
    ids, labels = model1.apply(params1, px, 1, method=model1.tokenize)
    L = 64 + 3 * 5  # 64 ctx tokens + 3 frames x (sdf + 4)
    assert ids.shape == (2, L)
    frames = model1.apply(params1, ids, 1, method=model1.detokenize)
    assert frames.shape == (2, 4, 32, 32, 3)
    assert np.isfinite(np.asarray(frames)).all()
