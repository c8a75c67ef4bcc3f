from ivideogpt_tpu.ops.vq import (  # noqa: F401
    vq_lookup,
    quantize,
    QuantizeResult,
)
