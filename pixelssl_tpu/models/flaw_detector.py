"""Flaw detector for GCT (reference:
pixelssl/ssl_algorithm/ssl_gct.py:539-621).

    Ke et al., "Guided Collaborative Training for Pixel-wise
    Semi-Supervised Learning", ECCV'20.

Nine 4x4 convs (4 strided + 3 stride-1 + strided classifier) each followed
by IBNorm (cross-replica SyncBatchNorm on the first half of channels ‖
affine-free InstanceNorm on the rest, ssl_gct.py:588-607) and
LeakyReLU(0.2); input is channel-concat(task_inp..., task_pred); output is
the flawmap upsampled align_corners=True back to input size. NHWC.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import SyncBatchNorm, resize_bilinear, leaky_relu_02


class IBNorm(nn.Module):
    """BatchNorm ‖ InstanceNorm channel split (reference ssl_gct.py:588-607)."""
    axis_name: str = None
    split: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool):
        features = x.shape[-1]
        num_bn = int(features * self.split + 0.5)
        xb = SyncBatchNorm(axis_name=self.axis_name, name='bnorm')(
            x[..., :num_bn], train)
        if num_bn == features:
            return xb
        xi = x[..., num_bn:].astype(jnp.float32)
        mean = jnp.mean(xi, axis=(1, 2), keepdims=True)
        var = jnp.var(xi, axis=(1, 2), keepdims=True)
        xi = (xi - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.concatenate([xb, xi.astype(xb.dtype)], axis=-1)


class FlawDetector(nn.Module):
    ndf: int = 64
    axis_name: str = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, task_inp, task_pred, train: bool):
        x = jnp.concatenate(tuple(task_inp) + (task_pred,), axis=-1)
        spec = [('conv1', self.ndf, 2), ('conv2', self.ndf * 2, 2),
                ('conv2_1', self.ndf * 2, 1), ('conv3', self.ndf * 4, 2),
                ('conv3_1', self.ndf * 4, 1), ('conv4', self.ndf * 8, 2),
                ('conv4_1', self.ndf * 8, 1)]
        for name, width, stride in spec:
            x = nn.Conv(width, (4, 4), strides=(stride, stride),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=name)(x)
            x = IBNorm(axis_name=self.axis_name, name='ibn' + name[4:])(x, train)
            x = leaky_relu_02(x)  # select-free fwd+bwd (see layers.py)
        x = nn.Conv(1, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name='classifier')(x)
        x = resize_bilinear(x.astype(jnp.float32), task_pred.shape[1:3],
                            align_corners=True)
        return x  # raw flawmap logits (activated by the criterion)


def flaw_detector_criterion(pred, gt, reduction=True):
    """Per-pixel MSE (reference ssl_gct.py:610-621)."""
    loss = jnp.square(pred.astype(jnp.float32) - gt.astype(jnp.float32))
    if reduction:
        return jnp.mean(loss, axis=(1, 2, 3))
    return loss
