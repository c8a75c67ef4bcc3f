"""int8 conv interception (ops/qconv.py): correctness on CPU.

The perf claim lives in tools/bench_int8_conv.py (TPU); these tests pin
the numerics: exact integer cases are bit-exact, the general case tracks
the fp conv within quantization error, and the interceptor reproduces the
full decoder's output within the same bound without touching params.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ivideogpt_tpu.ops.qconv import calibrate_convs, int8_convs


def test_int8_conv_exact_on_integer_grids():
    """Inputs and weights already on the int8 grid pass through unchanged:
    quantization is then lossless and the int32 accumulation is exact."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (2, 8, 8, 4)), jnp.float32)
    conv = nn.Conv(6, (3, 3), padding="SAME")
    params = conv.init(jax.random.key(0), x)
    # force weights onto the int grid with a per-channel scale of exactly 1
    k = rng.integers(-127, 128, np.asarray(params["params"]["kernel"]).shape)
    # ensure every output channel hits |127| so per-channel scale == 1
    k[0, 0, 0, :] = 127
    params = {"params": {"kernel": jnp.asarray(k, jnp.float32),
                         "bias": params["params"]["bias"]}}
    ref = conv.apply(params, x)
    with int8_convs():
        got = conv.apply(params, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_int8_conv_tracks_fp_within_quant_error():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    conv = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME")
    params = conv.init(jax.random.key(1), x)
    ref = np.asarray(conv.apply(params, x))
    with int8_convs():
        got = np.asarray(jax.jit(conv.apply)(params, x))
    # absmax-symmetric int8: error ~ |x|max*|w|sum/127 per tap; 2% of the
    # output scale is far above the observed error but fails on any
    # scheme bug (wrong axis, missing dequant, swapped scales)
    tol = 0.02 * np.abs(ref).max()
    assert np.abs(ref - got).max() < tol, np.abs(ref - got).max()


def test_int8_convs_on_decoder_stack():
    """The full Decoder under int8_convs: same params, finite output,
    close to the fp render (the detokenize-path integration point)."""
    from ivideogpt_tpu.models.vae import Decoder
    dec = Decoder(out_channels=3, block_out_channels=(16, 32),
                  layers_per_block=1, norm_num_groups=8,
                  mid_block_add_attention=False)
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    params = dec.init(jax.random.key(2), z)
    ref = np.asarray(dec.apply(params, z))
    with int8_convs():
        got = np.asarray(jax.jit(dec.apply)(params, z))
    assert np.isfinite(got).all()
    # per-conv quant error compounds through the stack; random-init
    # activations are worst-case (no trained scale structure)
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-8)
    assert err < 0.15, err


def test_static_scales_match_dynamic_on_calibration_batch():
    """On the calibration batch the static render tracks the dynamic one
    closely (exactly for the first conv; later convs see int8-perturbed
    inputs whose absmax drifts from the fp calibration by quantization
    error only) and stays within the dynamic test's bound of the fp
    render — a keying/lookup bug would blow both up."""
    from ivideogpt_tpu.models.vae import Decoder
    dec = Decoder(out_channels=3, block_out_channels=(16, 32),
                  layers_per_block=1, norm_num_groups=8,
                  mid_block_add_attention=False)
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    params = dec.init(jax.random.key(3), z)

    def calib(p, x):
        with calibrate_convs() as rec:
            out = dec.apply(p, x)
        return out, rec.scales()

    _, scales = jax.jit(calib)(params, z)
    scales = jax.device_get(scales)
    assert len(scales) >= 6  # conv_in, blocks, conv_out all observed
    with int8_convs():
        dyn = np.asarray(jax.jit(dec.apply)(params, z))
    with int8_convs(act_scales=scales):
        stat = np.asarray(jax.jit(dec.apply)(params, z))
    ref = np.asarray(dec.apply(params, z))
    scale = np.abs(ref).max() + 1e-8
    assert np.abs(stat - dyn).max() / scale < 0.05, \
        np.abs(stat - dyn).max() / scale
    assert np.abs(stat - ref).max() / scale < 0.15, \
        np.abs(stat - ref).max() / scale


def test_static_scales_saturate_out_of_range_inputs():
    """Inputs beyond the calibrated absmax clip to the int8 edge instead of
    rescaling: output stays finite and within the saturation bound."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    conv = nn.Conv(8, (3, 3), padding="SAME")
    params = conv.init(jax.random.key(4), x)

    def calib(p, a):
        with calibrate_convs() as rec:
            out = conv.apply(p, a)
        return out, rec.scales()

    _, scales = jax.jit(calib)(params, x)
    scales = jax.device_get(scales)
    with int8_convs(act_scales=scales):
        got = np.asarray(jax.jit(conv.apply)(params, 3.0 * x))
    # saturated input == quantizing clip(3x, amax): compare against the
    # fp conv of the clipped input, same tolerance as the dynamic test
    amax = float(next(iter(scales.values())))
    ref = np.asarray(conv.apply(params, jnp.clip(3.0 * x, -amax, amax)))
    assert np.isfinite(got).all()
    tol = 0.02 * np.abs(ref).max()
    assert np.abs(ref - got).max() < tol, np.abs(ref - got).max()
