"""FC discriminator for AdvSSL (reference:
pixelssl/ssl_algorithm/ssl_adv.py:466-503, from Hung et al.,
"Adversarial Learning for Semi-supervised Semantic Segmentation", BMVC'18).

Five 4x4 stride-2 convs (64→128→256→512→1) with LeakyReLU(0.2), then an
align_corners=True bilinear upsample back to the input resolution. NHWC,
matmul-based resize (models/layers.py). No normalization layers — the module
is stateless apart from its params.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import resize_bilinear, leaky_relu_02


class FCDiscriminator(nn.Module):
    ndf: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, task_pred):
        x = task_pred
        widths = (self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8)
        for i, w in enumerate(widths):
            x = nn.Conv(w, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name='conv{0}'.format(i + 1))(x)
            x = leaky_relu_02(x)  # select-free fwd+bwd (see layers.py)
        x = nn.Conv(1, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name='classifier')(x)
        x = resize_bilinear(x.astype(jnp.float32), task_pred.shape[1:3],
                            align_corners=True)
        return x  # raw logits — activated inside the BCE criterion


def fc_discriminator_criterion(pred, gt):
    """Per-pixel BCE-with-logits, mean over (H,W,C) → [N]
    (reference ssl_adv.py:496-503)."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    # numerically-stable BCE with logits: max(x,0) - x*z + log(1+exp(-|x|))
    loss = jnp.maximum(pred, 0.0) - pred * gt + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    return jnp.mean(loss, axis=(1, 2, 3))
