"""PSPNet: dilated ResNet + pyramid pooling + PixelShuffle decoder (NHWC).

Re-design of the reference (reference: task/sseg/module/_pspnet.py:15-142):
PSP module with adaptive-avg-pool bins [1,2,3,6] → 1x1 conv+BN+ReLU →
align_corners=False upsample → concat → 3x3 bottleneck to 512
(_pspnet.py:57-102); decoder = 1x1 conv + log2(8)=3 PixelShuffle×2 stages
with ICNR init (_pspnet.py:15-54); final align_corners=True bilinear resize
to input size (_pspnet.py:127). Adaptive pools and resizes are the
matmul-based TPU formulations from models/layers.py.
"""

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import (SyncBatchNorm, adaptive_avg_pool, resize_bilinear,
                     pixel_shuffle, icnr_init)
from .resnet import build_backbone

# torch kaiming_uniform_(a=0, fan_in, relu)
psp_conv_init = nn.initializers.variance_scaling(2.0, 'fan_in', 'uniform')


class PSPModule(nn.Module):
    """Pyramid pooling (reference _pspnet.py:57-102)."""
    bin_sizes: Sequence[int] = (1, 2, 3, 6)
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        in_ch = x.shape[-1]
        out_ch = in_ch // len(self.bin_sizes)
        h, w = x.shape[1:3]
        pyramids = [x]
        for i, b in enumerate(self.bin_sizes):
            y = adaptive_avg_pool(x, b)
            y = nn.Conv(out_ch, (1, 1), use_bias=False,
                        kernel_init=psp_conv_init, dtype=self.dtype,
                        name='stages_{0}_conv'.format(i))(y)
            y = SyncBatchNorm(axis_name=self.bn_axis_name,
                              name='stages_{0}_bn'.format(i))(y, train)
            y = nn.relu(y)
            y = resize_bilinear(y, (h, w), align_corners=False)
            pyramids.append(y)
        y = jnp.concatenate(pyramids, axis=-1)
        y = nn.Conv(out_ch, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=psp_conv_init, dtype=self.dtype,
                    name='bottleneck_conv')(y)
        y = SyncBatchNorm(axis_name=self.bn_axis_name, name='bottleneck_bn')(y, train)
        return nn.relu(y)


class PixelShuffleBlock(nn.Module):
    """conv1x1(n→4n, ICNR) → relu → shuffle×2 (reference _pspnet.py:40-54)."""
    channels: int
    scale: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def init(key, shape, dtype=jnp.float32):
            return icnr_init(key, shape, dtype, scale=self.scale)
        y = nn.Conv(self.channels * self.scale ** 2, (1, 1), use_bias=True,
                    kernel_init=init, dtype=self.dtype, name='conv')(x)
        return pixel_shuffle(nn.relu(y), self.scale)


class UpsampleDecoder(nn.Module):
    """1x1 conv then ×2 shuffles until `upscale` (reference _pspnet.py:15-23)."""
    out_channels: int
    upscale: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    kernel_init=nn.initializers.kaiming_normal(),
                    dtype=self.dtype, name='conv1x1')(x)
        for i in range(int(math.log2(self.upscale))):
            x = PixelShuffleBlock(channels=self.out_channels, dtype=self.dtype,
                                  name='shuffle_{0}'.format(i))(x)
        return x


class PSPNet(nn.Module):
    """Returns (logits at input resolution, psp latent [.,.,.,512])."""
    backbone: str = 'resnet101'
    output_stride: int = 8
    num_classes: int = 21
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.backbone_net = build_backbone(self.backbone, self.output_stride,
                                           self.bn_axis_name, self.dtype,
                                           remat=self.remat)
        self.psp = PSPModule(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        self.decoder = UpsampleDecoder(out_channels=self.num_classes,
                                       upscale=8, dtype=self.dtype)

    def __call__(self, x, train: bool):
        bx = self.backbone_net(x, train)
        px = self.psp(bx, train)
        logits = self.decoder(px)
        logits = resize_bilinear(logits.astype(jnp.float32),
                                 x.shape[1:3], align_corners=True)
        return logits, px
