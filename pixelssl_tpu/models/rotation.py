"""Rotation classifier for S4L (reference:
pixelssl/ssl_algorithm/ssl_s4l.py:381-400).

Two 4x4 stride-2 conv+BN+LeakyReLU blocks, adaptive average pool, linear
head over 4 rotation angles. NHWC. The reference used per-replica
nn.BatchNorm2d here; this uses the cross-replica SyncBatchNorm for
mesh-consistent statistics.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import SyncBatchNorm, leaky_relu_02


class RotationClassifier(nn.Module):
    axis_name: str = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name='conv1')(x)
        x = SyncBatchNorm(axis_name=self.axis_name, name='bn1')(x, train)
        x = leaky_relu_02(x)  # select-free fwd+bwd (see layers.py)
        x = nn.Conv(in_ch * 2, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name='conv2')(x)
        x = SyncBatchNorm(axis_name=self.axis_name, name='bn2')(x, train)
        x = leaky_relu_02(x)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        # named 'fc' (not 'classifier') so task lr-mult path rules like
        # ('classifier', 10x) never match the rotation head
        return nn.Dense(4, dtype=self.dtype, name='fc')(x).astype(jnp.float32)
