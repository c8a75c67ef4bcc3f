"""VQ nearest-neighbor microbenchmark: XLA expanded form vs Pallas kernels,
on the headline shape 7168 x 8192 x 64 (B=2 tokenizer training batch).

Prints a markdown table (pasted into COMPONENTS.md) and asserts 100%
id agreement for every variant.
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


def timeit(fn, *args, iters=10):
    out = fn(*args)
    out.block_until_ready()
    float(jnp.sum(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.time() - t0) / iters, out


def main():
    from ivideogpt_tpu.ops import vq

    N, K, D = 7168, 8192, 64
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    E = jnp.asarray(rng.normal(size=(K, D)), jnp.float32)

    t_xla, ref = timeit(jax.jit(vq._vq_lookup_xla), z, E)
    print("| variant | time (ms) | id agreement |", flush=True)
    print("|---|---|---|", flush=True)
    print(f"| XLA expanded form | {t_xla*1e3:.2f} | 1.000 |", flush=True)

    # round-1 tuning for the grid-revisit variant (defaults spill vregs)
    os.environ["IVG_VQ_TN"] = "128"
    os.environ["IVG_VQ_KTILE"] = "512"
    try:
        t_rev, got_rev = timeit(lambda a, b: vq._vq_lookup_pallas(a, b), z, E)
        agree = float((ref == got_rev).mean())
        print(f"| Pallas grid-revisit (TN=128,KT=512) | {t_rev*1e3:.2f} | "
              f"{agree:.3f} |", flush=True)
    except Exception as e:
        print(f"| Pallas grid-revisit | compile failed: {type(e).__name__} "
              f"| - |", flush=True)
    os.environ["IVG_VQ_TN"] = "256"
    try:
        t_fl, got_fl = timeit(
            lambda a, b: vq._vq_lookup_pallas_flash(a, b), z, E)
        agree = float((ref == got_fl).mean())
        print(f"| Pallas flash (VMEM codebook) | {t_fl*1e3:.2f} | "
              f"{agree:.3f} |", flush=True)
        assert agree == 1.0
    except Exception as e:
        print(f"| Pallas flash | compile failed: {type(e).__name__} | - |",
              flush=True)


if __name__ == "__main__":
    main()
