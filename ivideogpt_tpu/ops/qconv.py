"""Opt-in int8 compute for Flax conv stacks, via method interception.

The detokenizer's decoder is conv-FLOPs-bound at ~78% of the bf16 MXU
peak (COMPONENTS.md headroom notes); v5e's int8 MXU path runs at 2x the
bf16 rate. This module lets a CALLER run any existing Flax model's
``nn.Conv`` layers as int8 x int8 -> int32 MXU convs without touching the
model definition or its param tree:

    with int8_convs():
        frames = tokenizer.apply(params, ids, ctx,
                                 method=tokenizer.detokenize)

Quantization scheme (standard post-training dynamic quant):
  - weights: per-OUTPUT-CHANNEL symmetric absmax int8 (computed from the
    fp params inside the traced program; XLA constant-folds it when the
    params are compile-time constants and fuses it otherwise),
  - activations: per-TENSOR symmetric dynamic absmax int8 (one fused
    reduce + round/clip/cast pass that XLA fuses into the producer's
    epilogue where possible),
  - accumulation: int32 on the MXU, dequantized to the layer's original
    output dtype; bias added after dequant in fp.

STATIC activation scales (post-training static quant): the dynamic
per-tensor absmax is a full HBM reduce over every conv input that cannot
fuse with the quantize pass that follows it (a reduction feeding an
elementwise over the same tensor is two passes) — measured at ~2/3 of the
int8 lever's unrealized gain (COMPONENTS.md headroom notes). Calibrate
once on a representative batch and the quantize collapses to a fused
clip/round/cast in the producer's epilogue:

    with calibrate_convs() as rec:
        _ = tokenizer.apply(params, ids, ctx, method=tokenizer.detokenize)
    scales = jax.device_get(rec.scales())     # {module-path: absmax}
    with int8_convs(act_scales=scales):
        frames = tokenizer.apply(params, ids2, ctx,
                                 method=tokenizer.detokenize)

``calibrate_convs`` works under ``jax.jit`` too: record absmaxes as
traced scalars by returning ``rec.scales()`` from the jitted function.
Inputs beyond a layer's calibrated absmax SATURATE (clip to ±127) — the
standard static-quant contract; pass ``margin>1`` for headroom.

This changes OUTPUT PIXELS (bounded by tools/bench_int8_conv.py's parity
rows and the golden-fixture PSNR test), not token ids — tokenize and the
LM are untouched. It is an inference-only knob that must be explicitly
enabled by the caller (the exact-parity render is the default everywhere,
including bench.py's headline): never enable under a training step (the
straight-through estimator this would need is deliberately not
implemented), and treat trained-weight FVD parity as unproven until the
published checkpoints can be loaded (see COMPONENTS.md).

No reference counterpart: the reference renders in fp16/fp32 CUDA
(ivideogpt/vq_model/compressive_vq_model.py decode path); this is a
TPU-specific throughput lever.
"""

from __future__ import annotations

import contextlib
import contextvars

import flax.linen as nn
import jax
import jax.numpy as jnp


def _quantize_per_tensor(x: jnp.ndarray, scale=None):
    if scale is None:  # dynamic: absmax reduce over the whole tensor
        scale = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
    # guard all-zero inputs: scale 0 would produce 0/0 -> NaN
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _quantize_weight_per_channel(w: jnp.ndarray):
    """HWIO kernel -> int8 kernel + [O] scales."""
    scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2)) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _int8_conv_call(mod: nn.Conv, x: jnp.ndarray, act_scale=None) -> jnp.ndarray:
    params = mod.variables["params"]
    w = params["kernel"]
    out_dtype = x.dtype
    x_q, x_scale = _quantize_per_tensor(x, act_scale)
    w_q, w_scale = _quantize_weight_per_channel(w)

    strides = mod.strides or (1, 1)
    if isinstance(strides, int):
        strides = (strides,) * 2
    padding = mod.padding
    if isinstance(padding, int):
        padding = [(padding, padding)] * 2
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, tuple(strides), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=mod.feature_group_count,
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (x_scale * w_scale)
    if mod.use_bias:
        out = out + params["bias"].astype(jnp.float32)
    return out.astype(out_dtype)


def _eligible(mod, context, args) -> bool:
    return (isinstance(mod, nn.Conv) and context.method_name == "__call__"
            and "params" in mod.variables
            and args and hasattr(args[0], "ndim") and args[0].ndim == 4
            and mod.kernel_dilation in (None, 1, (1, 1))
            and mod.input_dilation in (None, 1, (1, 1)))


def _module_key(mod) -> str:
    return "/".join(mod.path)


# active int8 config: (act_scales dict or None, margin). A ContextVar —
# not a module global — so a concurrent trace on another thread (or an
# asyncio task) never picks up this thread's interception state; this
# matches how flax scopes intercept_methods itself.
_ACTIVE: contextvars.ContextVar = contextvars.ContextVar(
    "qconv_active", default=None)


def _interceptor(next_fun, args, kwargs, context):
    mod = context.module
    active = _ACTIVE.get()
    if active is not None and _eligible(mod, context, args):
        act_scales, margin = active
        scale = None
        if act_scales is not None:
            amax = act_scales.get(_module_key(mod))
            if amax is not None:
                scale = jnp.asarray(amax, jnp.float32) * margin / 127.0
        return _int8_conv_call(mod, args[0], scale)
    return next_fun(*args, **kwargs)


@contextlib.contextmanager
def int8_convs(act_scales=None, margin: float = 1.0):
    """Run every nn.Conv under this context as an int8 MXU conv.

    act_scales: optional {module-path: activation absmax} from
    ``calibrate_convs`` — layers found there use a STATIC scale
    (absmax*margin/127, inputs beyond it saturate); layers absent fall
    back to the dynamic per-tensor absmax.
    """
    token = _ACTIVE.set((act_scales, float(margin)))
    try:
        with nn.intercept_methods(_interceptor):
            yield
    finally:
        _ACTIVE.reset(token)


class _CalibRecord:
    """Per-conv activation absmax, keyed by module path. Values are traced
    scalars when recorded under jit — return ``scales()`` from the jitted
    function and ``jax.device_get`` the result."""

    def __init__(self):
        self._amax = {}

    def observe(self, key: str, x: jnp.ndarray):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        prev = self._amax.get(key)
        # a conv called twice (e.g. scanned) keeps the max over calls
        self._amax[key] = amax if prev is None else jnp.maximum(prev, amax)

    def scales(self) -> dict:
        return dict(self._amax)


@contextlib.contextmanager
def calibrate_convs():
    """Record every eligible nn.Conv input's absmax (fp compute unchanged)."""
    rec = _CalibRecord()

    def observer(next_fun, args, kwargs, context):
        if _eligible(context.module, context, args):
            rec.observe(_module_key(context.module), args[0])
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(observer):
        yield rec
