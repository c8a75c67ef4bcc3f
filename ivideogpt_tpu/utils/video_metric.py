"""Video evaluation metrics: MSE / PSNR / SSIM / LPIPS with best-of-t
selection, plus streaming FVD statistics.

Rebuild of reference ivideogpt/utils/video_metric.py:18-191:
- frame metrics computed on-device in fp32; best-of-t over t generated
  samples per GT clip (reference :59-89)
- FVD: I3D features -> streaming mean/cov accumulator (FeatureStats,
  reference :118-173) -> Frechet distance with scipy sqrtm on host
  (reference :29-39); the TorchScript I3D binary is replaced by a Flax I3D
  (ivideogpt_tpu/models/i3d.py) whose weights load from a converted file.

Inputs are NHWC videos in [0, 1]: video shape [B, T, H, W, C].
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def mse(a, b):
    """Per-frame MSE: [N, H, W, C] -> [N]."""
    return jnp.mean(jnp.square(a - b), axis=(1, 2, 3))


def psnr(a, b, value_range: float = 1.0, eps: float = 1e-8):
    """Per-frame PSNR (piqa semantics, reference :23)."""
    m = mse(a, b)
    return 10.0 * jnp.log10(value_range ** 2 / (m + eps))


def _gaussian_kernel(window: int, sigma: float):
    x = jnp.arange(window, dtype=jnp.float32) - (window - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    return g / g.sum()


def ssim(a, b, window: int = 11, sigma: float = 1.5, value_range: float = 1.0):
    """Per-frame SSIM, separable gaussian window, channel-averaged
    (piqa SSIM(window_size=11, sigma=1.5), reference :24)."""
    c1 = (0.01 * value_range) ** 2
    c2 = (0.03 * value_range) ** 2
    k = _gaussian_kernel(window, sigma)

    def blur(x):
        # separable conv along H then W, per channel; valid padding
        x = jnp.moveaxis(x, -1, 1)  # N, C, H, W
        n, c, h, w = x.shape
        x = x.reshape(n * c, 1, h, w)
        kh = k.reshape(1, 1, window, 1)
        kw = k.reshape(1, 1, 1, window)
        x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                         dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                         dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return x.reshape(n, c, x.shape[-2], x.shape[-1])

    mu_a, mu_b = blur(a), blur(b)
    saa = blur(a * a) - mu_a * mu_a
    sbb = blur(b * b) - mu_b * mu_b
    sab = blur(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * sab + c2)
    den = (mu_a ** 2 + mu_b ** 2 + c1) * (saa + sbb + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))


def best_of_t_metrics(gt, gen, lpips_fn=None):
    """Best-of-t frame metrics (reference video_metric.py:59-89).

    gt: [B, T, H, W, C]; gen: [t*B, T, H, W, C] (t samples per clip).
    Returns dict of scalars: best (min) MSE/LPIPS, best (max) PSNR/SSIM,
    averaged over clips.
    """
    B, T = gt.shape[:2]
    t = gen.shape[0] // B
    gt_rep = jnp.tile(gt, (t, 1, 1, 1, 1)).reshape(t * B * T, *gt.shape[2:])
    gen_flat = gen.reshape(t * B * T, *gen.shape[2:])

    m = mse(gt_rep, gen_flat).reshape(t, B, T).mean(-1)
    p = psnr(gt_rep, gen_flat).reshape(t, B, T).mean(-1)
    s = ssim(gt_rep, gen_flat).reshape(t, B, T).mean(-1)
    out = {
        "mse": m.min(0).mean(),
        "psnr": p.max(0).mean(),
        "ssim": s.max(0).mean(),
    }
    if lpips_fn is not None:
        lp = lpips_fn(gt_rep * 2 - 1, gen_flat * 2 - 1).reshape(t, B, T).mean(-1)
        out["lpips"] = lp.min(0).mean()
    return out


class FeatureStats:
    """Streaming mean/cov accumulator (reference video_metric.py:118-173)."""

    def __init__(self, capture_mean_cov: bool = True,
                 max_items: Optional[int] = None):
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self.num_items = 0
        self.num_features = None
        self.raw_mean = None
        self.raw_cov = None

    def _init(self, n_features: int):
        self.num_features = n_features
        self.raw_mean = np.zeros(n_features, np.float64)
        self.raw_cov = np.zeros((n_features, n_features), np.float64)

    def append(self, x: np.ndarray):
        x = np.asarray(x, np.float32)
        assert x.ndim == 2
        if self.max_items is not None:
            if self.num_items >= self.max_items:
                return
            x = x[: self.max_items - self.num_items]
        if self.num_features is None:
            self._init(x.shape[1])
        self.num_items += x.shape[0]
        x64 = x.astype(np.float64)
        self.raw_mean += x64.sum(axis=0)
        self.raw_cov += x64.T @ x64

    def get_mean_cov(self):
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items - np.outer(mean, mean)
        return mean, cov


def frechet_distance(stats_real: FeatureStats, stats_gen: FeatureStats) -> float:
    """FVD from two feature-stat accumulators (reference :29-39);
    scipy sqrtm on host — this is offline post-processing."""
    import scipy.linalg
    if stats_real.num_items == 0 or stats_gen.num_items == 0:
        raise ValueError("No data to compute FVD")
    mu_r, sig_r = stats_real.get_mean_cov()
    mu_g, sig_g = stats_gen.get_mean_cov()
    m = np.square(mu_g - mu_r).sum()
    s, _ = scipy.linalg.sqrtm(np.dot(sig_g, sig_r), disp=False)
    return float(np.real(m + np.trace(sig_g + sig_r - s * 2)))


class Evaluator:
    """Frame metrics + FVD orchestration (reference Evaluator, :18-97).

    lpips_fn / i3d_fn are callables (device functions); both optional so the
    evaluator degrades gracefully when pretrained weights are unavailable.
    """

    def __init__(self, lpips_fn=None, i3d_fn=None, max_batchsize: int = 64):
        self.lpips_fn = lpips_fn
        self.i3d_fn = i3d_fn
        self.max_batchsize = max_batchsize

    def frame_metrics(self, gt, gen):
        return {k: float(v) for k, v in
                best_of_t_metrics(jnp.asarray(gt), jnp.asarray(gen),
                                  self.lpips_fn).items()}

    def i3d_features(self, videos) -> np.ndarray:
        """videos [B, T, H, W, C] in [0,1] -> [B, 400] logit features."""
        if self.i3d_fn is None:
            raise ValueError("no I3D model available")
        return np.asarray(self.i3d_fn(jnp.asarray(videos)))
