"""iVideoGPT-TPU: a TPU-native (JAX/XLA/Pallas/pjit) interactive world-model framework.

Re-implements the full capability surface of thuml/iVideoGPT (conditional
"compressive" VQGAN tokenizer + LLaMA-architecture token transformer + video
prediction / MBRL / visual-planning application loops), redesigned TPU-first:

- NHWC conv layouts, bf16 compute on the MXU, fp32 parity mode for tokenization
- fused distance-matmul + argmin Pallas kernel for the VQ codebook lookup
- fully on-device, jitted KV-cached frame-chunked autoregressive generation
  (lax.scan, static shapes) instead of host-looped HF ``generate``
- pjit/GSPMD data+model sharding over a ``("data", "model")`` mesh instead of DDP/NCCL
- Orbax training state + a safetensors bridge for published HF checkpoints
"""

__version__ = "0.1.0"

from ivideogpt_tpu.configs import (  # noqa: F401
    CompressiveVQConfig,
    TransformerConfig,
    TOKENIZER_64,
    TOKENIZER_256,
    LLAMA_BASE,
    LLAMA_MEDIUM,
)
