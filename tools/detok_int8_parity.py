"""Pixel-parity bound for int8 detokenizer convs (ops/qconv.py).

The BENCH_INT8_DETOK lever runs the detokenizer's nn.Conv layers as
int8 x int8 -> int32 MXU convs (2x the bf16 MXU rate on v5e). Token ids
are untouched — only the RENDER changes — so the honest quality bound is
per-frame PSNR/SSIM between the bf16 render and the int8 render of the
SAME token stream, through the same tokenizer params.

Caveat (same as tools/kv_divergence_study.py): published weights are
unavailable offline, so this runs on a random-init tokenizer. Random-init
activations lack trained scale structure and are the WORST case for
absmax dynamic quantization (tests/test_qconv.py shows the same effect on
the bare Decoder), so the committed numbers are conservative.

Run on TPU:  python tools/detok_int8_parity.py            (B=16, ~2 min)
CPU smoke:   JAX_PLATFORMS=cpu PARITY_B=2 PARITY_T=6 python tools/...
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("IVG_JAX_CACHE", "/tmp/ivg_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from ivideogpt_tpu.configs import TOKENIZER_64
    from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
    from ivideogpt_tpu.ops.qconv import calibrate_convs, int8_convs
    from ivideogpt_tpu.utils import video_metric
    from ivideogpt_tpu import tokens

    B = int(os.environ.get("PARITY_B", "16"))
    T = int(os.environ.get("PARITY_T", "16"))
    ctx = 2
    F = T - ctx

    tok_cfg = TOKENIZER_64.replace(context_length=ctx)
    tokenizer = CompressiveVQModel(tok_cfg, dtype=jnp.bfloat16)
    tok_params = jax.jit(tokenizer.init, static_argnames="segment_len")(
        jax.random.key(2), jnp.zeros((ctx, 64, 64, 3)),
        jnp.zeros((F, 64, 64, 3)), segment_len=F)

    # a REAL token stream: encode random pixels (so ctx tokens carry
    # encoder statistics, not uniform ids), then random dyn ids
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(0, 1, (B, ctx, 64, 64, 3)), jnp.float32)
    idx_c = jax.jit(lambda p, x: tokenizer.apply(
        p, x, method=tokenizer.encode_context))(tok_params, px)
    prelude = tokens.make_prelude(
        idx_c, tok_cfg.num_vq_embeddings, tok_cfg.num_dyn_embeddings)
    D = tok_cfg.dyn_tokens_per_frame
    base = tok_cfg.num_vq_embeddings
    dyn = rng.integers(base, base + tok_cfg.num_dyn_embeddings,
                       (B, F, D + 1))
    dyn[:, :, D] = base + tok_cfg.num_dyn_embeddings  # sdf separators
    stream = np.concatenate(
        [np.asarray(prelude), dyn.reshape(B, -1)[:, :-1]], axis=1)
    stream = jnp.asarray(stream, jnp.int32)

    detok_bf = jax.jit(lambda p, i: tokenizer.apply(
        p, i, ctx, method=tokenizer.detokenize))

    def _detok_i8(p, i):
        with int8_convs():
            return tokenizer.apply(p, i, ctx, method=tokenizer.detokenize)
    detok_i8 = jax.jit(_detok_i8)

    # static-scale variant: calibrate on a DIFFERENT stream (held-out
    # calibration, like bench.py's first-rollout calibration vs later
    # rollouts), render the eval stream with those fixed scales
    dyn_c = rng.integers(base, base + tok_cfg.num_dyn_embeddings,
                         (B, F, D + 1))
    dyn_c[:, :, D] = base + tok_cfg.num_dyn_embeddings
    calib_stream = jnp.asarray(np.concatenate(
        [np.asarray(prelude), dyn_c.reshape(B, -1)[:, :-1]], axis=1),
        jnp.int32)

    def _calib(p, i):
        with calibrate_convs() as rec:
            tokenizer.apply(p, i, ctx, method=tokenizer.detokenize)
            return rec.scales()
    scales = {k: float(v) for k, v in
              jax.device_get(jax.jit(_calib)(tok_params, calib_stream)).items()}

    def _detok_st(p, i):
        with int8_convs(act_scales=scales):
            return tokenizer.apply(p, i, ctx, method=tokenizer.detokenize)
    detok_st = jax.jit(_detok_st)

    fr_b = np.asarray(detok_bf(tok_params, stream), np.float32)

    def rows(fr):
        flat_b = jnp.asarray(fr_b.reshape(B * T, *fr_b.shape[2:]))
        flat_i = jnp.asarray(fr.reshape(B * T, *fr.shape[2:]))
        pp = np.asarray(video_metric.psnr(flat_b, flat_i)).reshape(B, T)
        ps = np.asarray(video_metric.ssim(flat_b, flat_i)).reshape(B, T)
        return {
            "psnr_per_frame_mean": [round(float(x), 2) for x in pp.mean(0)],
            "psnr_min": round(float(pp.min()), 2),
            "ssim_per_frame_mean": [round(float(x), 4) for x in ps.mean(0)],
            "ssim_min": round(float(ps.min()), 4),
        }

    out = {
        "tokenizer": "TOKENIZER_64 random-init bf16",
        "B": B, "T": T, "ctx": ctx,
        "dynamic": rows(np.asarray(detok_i8(tok_params, stream), np.float32)),
        "static": rows(np.asarray(detok_st(tok_params, stream), np.float32)),
        "note": ("bf16 vs int8_convs render of the SAME tokens; random-init "
                 "decoder is worst-case for absmax quant; 'static' uses "
                 "held-out-calibrated activation scales (bench.py default)"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
