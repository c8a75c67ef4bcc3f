"""A/B the decoder's Upsample (nearest 2x + 3x3 conv) vs a sub-pixel fusion.

The two upsample convs are the most expensive single convs in the
detokenize path (they run at the DOUBLED resolution with full channel
width): 32x32@512->512 and 64x64@256->256 are ~9.6 GFLOP of the ~40
GFLOP frame-decode. But their input is a nearest-neighbor 2x blow-up —
every 2x2 block is the same pixel — so the 3x3 conv re-reads each source
pixel up to 4x and multiplies it by up to 2 taps that could be one.

Folding the duplication into the kernel gives, per output phase
(r, s) in {0,1}^2, an exact 2x2 conv over the LOW-res input whose taps
are sums of the original 3x3 taps (e.g. phase r=0 rows: [W0, W1+W2]).
All 4 phases run as ONE conv with 4*Cout output channels on the once-
padded low-res input, followed by a shifted-slice interleave:
16*(H+1)*(W+1) vs 36*H*W tap-positions ~= 2.2x fewer MXU FLOPs,
numerically exact up to one fp32 weight-sum rounding per merged tap.

Run: python tools/bench_subpixel.py   (optional BENCH_BATCH, default 256)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/ivg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DN = ("NHWC", "HWIO", "NHWC")
ROWMAP = {0: (0, 1, 1), 1: (0, 0, 1)}  # W tap row i -> K row u, per phase r


def fold_kernel(W):
    """[3,3,Ci,Co] -> [2,2,Ci,4*Co], phase blocks ordered (r,s) row-major."""
    Ks = []
    for r in (0, 1):
        for s in (0, 1):
            K = jnp.zeros((2, 2) + W.shape[2:], W.dtype)
            for i in range(3):
                for j in range(3):
                    K = K.at[ROWMAP[r][i], ROWMAP[s][j]].add(W[i, j])
            Ks.append(K)
    return jnp.concatenate(Ks, axis=-1)


def upsample_ref(x, W, b):
    u = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    u = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return lax.conv_general_dilated(u, W, (1, 1), "VALID",
                                    dimension_numbers=DN) + b


def upsample_subpixel(x, K4, b):
    B, H, Wd, _ = x.shape
    Co = K4.shape[-1] // 4
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = lax.conv_general_dilated(xp, K4, (1, 1), "VALID",
                                 dimension_numbers=DN)  # [B,H+1,W+1,4Co]
    phases = [y[:, r:H + r, s:Wd + s, (2 * r + s) * Co:(2 * r + s + 1) * Co]
              for r in (0, 1) for s in (0, 1)]
    p = jnp.stack(phases, axis=3).reshape(B, H, Wd, 2, 2, Co)
    return p.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * Wd, Co) + b


def bench(name, fn, args, iters=8):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt, out


def main():
    B = int(os.environ.get("BENCH_BATCH", "256"))
    for (H, C, Co) in [(16, 512, 512), (32, 256, 256)]:
        print(f"-- {H}x{H}x{C} -> {2*H}x{2*H}x{Co}, B={B}")

        # generate ON DEVICE: shipping B=256 fp32 activations over the
        # tunnel (134MB at the 512-ch shape) would dominate the run
        @jax.jit
        def make(key, H=H, C=C, Co=Co):
            k1, k2, k3 = jax.random.split(key, 3)
            x32 = jax.random.normal(k1, (2, H, H, C), jnp.float32)
            W32 = jax.random.normal(k2, (3, 3, C, Co), jnp.float32) * 0.02
            b32 = jax.random.normal(k3, (Co,), jnp.float32) * 0.01
            return x32, W32, b32

        x2, W32, b32 = jax.block_until_ready(make(jax.random.key(0)))
        # fp32 equivalence check on a small slice
        a = upsample_ref(x2, W32, b32)
        bb = upsample_subpixel(x2, fold_kernel(W32), b32)
        err = float(jnp.max(jnp.abs(a - bb)) / (jnp.max(jnp.abs(a)) + 1e-9))
        print(f"   fp32 rel max err: {err:.2e}  "
              "(TPU f32 convs use bf16 multiplies by default)")
        del a, bb, x2
        # bf16 timing at the real compute dtype (fold in fp32, cast after);
        # the full-batch activations exist ONLY in bf16 (fp32 copies of the
        # 3584-deep shapes don't fit next to the conv temps)
        x = jax.jit(lambda k: jax.random.normal(
            k, (B, H, H, C), jnp.bfloat16))(jax.random.key(9))
        W = W32.astype(jnp.bfloat16)
        K4 = fold_kernel(W32).astype(jnp.bfloat16)
        b = b32.astype(jnp.bfloat16)
        t_ref, _ = bench("nearest-2x repeat + 3x3 conv (current)",
                         upsample_ref, (x, W, b))
        t_sp, _ = bench("sub-pixel fused conv (4Co) + interleave",
                        upsample_subpixel, (x, K4, b))
        print(f"   speedup: {t_ref / t_sp:.2f}x ({t_ref - t_sp:+.2f} ms)")


if __name__ == "__main__":
    main()
