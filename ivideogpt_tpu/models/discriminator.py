"""PatchGAN-style discriminator with spectral norm.

Rebuild of reference ivideogpt/vq_model/discriminator.py:12-47 (ported there
from Paella): stride-2 spectral-norm conv stack, InstanceNorm + LeakyReLU(0.2),
1x1 conv to a hinge-loss logits map. NHWC.

Spectral norm uses flax.linen.SpectralNorm (power iteration state lives in the
'batch_stats' collection; pass update_stats=True + mutable during training).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ivideogpt_tpu.configs import DiscriminatorConfig


def _instance_norm(x, eps: float = 1e-5):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class Discriminator(nn.Module):
    config: DiscriminatorConfig = DiscriminatorConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, update_stats: bool = False):
        c = self.config
        d = max(c.depth - 3, 3)
        h = nn.SpectralNorm(
            nn.Conv(c.hidden_channels // (2 ** d), (3, 3), strides=(2, 2),
                    padding=1, dtype=self.dtype, name="conv_in"))(
            x, update_stats=update_stats)
        h = nn.leaky_relu(h, 0.2)
        for i in range(c.depth - 1):
            c_out = c.hidden_channels // (2 ** max(d - 1 - i, 0))
            h = nn.SpectralNorm(
                nn.Conv(c_out, (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name=f"conv_{i}"))(
                h, update_stats=update_stats)
            h = _instance_norm(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (1, 1), dtype=self.dtype, name="shuffle")(h)


def hinge_d_loss(real_logits, fake_logits):
    """Discriminator hinge loss (reference train_tokenizer.py:776)."""
    return jnp.mean(nn.relu(1.0 + fake_logits) + nn.relu(1.0 - real_logits))


def gen_loss(fake_logits):
    """Generator adversarial loss (reference train_tokenizer.py:717)."""
    return -jnp.mean(fake_logits)
