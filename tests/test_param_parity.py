"""Parameter-count parity with the published checkpoints (reference
README.md:35-38,53-57: tokenizer 114M / 310M, transformer 138M / 436M).

Counts via eval_shape (no allocation). Exact-match these counts is strong
evidence the module topology equals the reference architecture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivideogpt_tpu.configs import (LLAMA_BASE, LLAMA_MEDIUM, TOKENIZER_64,
                                   TOKENIZER_256)
from ivideogpt_tpu.models.llama import LlamaForCausalLM
from ivideogpt_tpu.models.tokenizer import CompressiveVQModel


def _count(shapes):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))


@pytest.mark.parametrize("cfg,expected_m", [(TOKENIZER_64, 114.2),
                                            (TOKENIZER_256, 310.5)])
def test_tokenizer_param_counts(cfg, expected_m):
    model = CompressiveVQModel(cfg, use_pallas=False)
    H = cfg.resolution
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((cfg.context_length, H, H, 3)),
                             jnp.zeros((1, H, H, 3)), segment_len=1),
        jax.random.key(0))
    n = _count(shapes) / 1e6
    assert abs(n - expected_m) < 0.5, n
    # derived token geometry (reference compressive_vq_model.py:59,193-196)
    assert cfg.ctx_tokens_per_frame == 256
    assert cfg.dyn_tokens_per_frame == 16


@pytest.mark.parametrize("cfg,expected_m", [(LLAMA_BASE, 138.4),
                                            (LLAMA_MEDIUM, 436.3)])
def test_llama_param_counts(cfg, expected_m):
    model = LlamaForCausalLM(cfg)
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 16), jnp.int32)),
        jax.random.key(0))
    n = _count(shapes) / 1e6
    assert abs(n - expected_m) < 0.5, n
    assert cfg.vocab_size == 16386  # 8192 + 8192 + 2 (train_gpt.py:593)
