"""int8 vs bf16 3x3 convs at the detokenize decoder's dominant shapes.

Detokenize is 39% of the headline rollout and FLOP-bound at ~78% of the
bf16 MXU peak (COMPONENTS.md headroom notes); v5e's int8 MXU path is 2x
the bf16 rate, so int8 convs are the one untried protocol-honest lever
on that phase. This measures the REALISTIC int8 pipeline per conv —
dynamic per-tensor activation quantize (absmax -> scale -> round) +
int8 x int8 conv accumulating int32 + fp32 dequant — against the bf16
conv XLA currently emits, at the decoder's three hot shapes with the
bench's real frame count (B=256 rollouts x 14 future frames = 3584
images through every decoder conv).

Timing inside one jitted lax.scan per variant (tunnel dispatch is ~1.8ms
per call; see the verify-skill gotchas).

Run on TPU: python tools/bench_int8_conv.py    [N_IMGS=3584 ITERS=20]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ivg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DN = ("NHWC", "HWIO", "NHWC")


def conv_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(jnp.bfloat16), (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=jnp.bfloat16)


def conv_int8(x_q, w, a_scale):
    """int8 conv + per-iteration weight quant + dequant.

    The ACTIVATION arrives pre-quantized: with static (calibrated) scales
    the x-quant fuses into the previous layer's epilogue, so excluding it
    here measures the OPTIMISTIC static-quant bound — if even this loses
    to bf16, dynamic quant (an extra absmax+cast pass) loses harder."""
    w_scale = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    w_q = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (a_scale * w_scale)).astype(jnp.bfloat16)


def time_scan(fn, x, w, extra, iters):
    """Median per-iteration time of fn(x, w_i, *extra) inside one jitted
    scan, where w_i = w + c*1e-6 depends on the carry — the weight
    perturbation (KBs) forces recomputation every iteration (defeats
    loop-invariant code motion: the first cut of this tool read 3230
    'TF/s', 16x the chip peak, because XLA hoisted the conv) while the
    big activation stays loop-invariant, as it is in the real decoder
    (read once from HBM per conv either way).

    The perturbed weight goes through an optimization_barrier: conv is
    LINEAR in w, so without it XLA's algebraic simplifier splits
    conv(x, w + s) into hoisted conv(x, w) + s-dependent cheap terms and
    the bf16 row reads 5x the chip peak (observed 962 'TF/s' on v5e; the
    int8 row was immune because round/clip are nonlinear).

    The carry reduces over EVERY output element: a channel-sliced reduce
    (out[..., 0], the second cut of this tool) lets XLA dead-code-
    eliminate all other output channels and shrink the conv to co=1 —
    the bf16 row then measures a memory-bound read of x (935 'TF/s')
    while the quantize chain happened to block the same DCE for int8."""
    @jax.jit
    def run(x, w):
        def body(c, _):
            out = fn(x, jax.lax.optimization_barrier(w + c * 1e-6), *extra)
            return jnp.sum(out.astype(jnp.float32)) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=iters)
        return c

    float(run(x, w))  # compile + 1 run
    t0 = time.time()
    float(run(x, w))
    return (time.time() - t0) / iters


def main():
    n = int(os.environ.get("N_IMGS", "3584"))
    iters = int(os.environ.get("ITERS", "20"))
    rng = np.random.default_rng(0)

    # decoder hot shapes (Decoder block_out_channels (128,256,512), latent
    # 16x16 -> 64x64): mid/up0 at 16x16x512, up1 at 32x32x512->256 region,
    # up2 at 64x64x256->128 region. n images flow through EVERY one.
    # three shapes cover the FLOP distribution: the deep 16x16 stack, the
    # mid 32x32 stack, and the wide 64x64 stack (each compile costs ~60-90s
    # over the tunnel, so keep the sweep tight)
    shapes = [
        (16, 16, 512, 512),
        (32, 32, 256, 256),
        (64, 64, 128, 128),
    ]
    total_bf, total_i8 = 0.0, 0.0
    for (h, w, ci, co) in shapes:
        # keep per-shape memory bounded: split n into chunks that fit, but
        # time at a chunk big enough to saturate the MXU
        chunk = min(n, max(256, 2 ** 20 // (h * w)))
        x = jnp.asarray(rng.normal(size=(chunk, h, w, ci)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, ci, co)) * 0.05, jnp.float32)
        a_scale = jnp.float32(3.0 / 127.0)
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                       -127, 127).astype(jnp.int8)

        t_bf = time_scan(conv_bf16, x, k, (), iters)
        t_i8 = time_scan(conv_int8, x_q, k, (a_scale,), iters)
        factor = n / chunk
        total_bf += t_bf * factor
        total_i8 += t_i8 * factor
        fl = 2 * chunk * h * w * ci * co * 9
        print(f"{h}x{w}x{ci}->{co} (chunk {chunk}): "
              f"bf16 {t_bf*1e3:.2f} ms ({fl/t_bf/1e12:.1f} TF/s)  "
              f"int8 {t_i8*1e3:.2f} ms ({fl/t_i8/1e12:.1f} TOP/s)  "
              f"speedup {t_bf/t_i8:.2f}x", flush=True)

    print(f"TOTAL over hot shapes at n={n}: bf16 {total_bf*1e3:.0f} ms, "
          f"int8 {total_i8*1e3:.0f} ms, speedup {total_bf/total_i8:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
