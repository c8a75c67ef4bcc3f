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
        x, w, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=jnp.bfloat16)


def conv_int8(x, w_q, w_scale):
    """Dynamic per-tensor activation quant + int8 conv + dequant."""
    a_scale = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                   -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (a_scale * w_scale)).astype(jnp.bfloat16)


def time_scan(fn, args, iters):
    @jax.jit
    def run(args):
        def body(c, _):
            out = fn(*args)
            # fold output back into a scalar carry so the scan can't be
            # collapsed; cast keeps the reduce cheap
            return c + jnp.sum(out[..., 0].astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return c

    float(run(args))  # compile + 1 run
    t0 = time.time()
    float(run(args))
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
        w_scale = float(np.abs(np.asarray(k)).max() / 127.0)
        w_q = jnp.clip(jnp.round(k / w_scale), -127, 127).astype(jnp.int8)

        t_bf = time_scan(conv_bf16, (x, k.astype(jnp.bfloat16)), iters)
        t_i8 = time_scan(conv_int8, (x, w_q, jnp.float32(w_scale)), iters)
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
