"""Dilated ResNet-50/101 backbone with multi-grid (NHWC, flax.linen).

TPU-native re-design of the reference backbone
(reference: task/sseg/module/backbone/resnet.py:13-174): same topology —
7x7 stem, bottleneck stages [3,4,{6,23},3], output-stride 8/16 via
strides/dilations ([1,2,2,1]/[1,1,1,2] for os=16, [1,2,1,1]/[1,1,2,4] for
os=8, resnet.py:59-66), multi-grid [1,2,4] in layer4 (resnet.py:102-119) —
but NHWC layout (TPU conv layout), bf16-capable compute with fp32 BN
statistics, and cross-replica SyncBatchNorm via psum (models/layers.py)
instead of the thread-queue SyncBN.

Submodule names mirror the torch state-dict structure (conv1/bn1/layerX/...)
so the torch→JAX checkpoint converter (models/convert.py) is a mechanical
rename.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import SyncBatchNorm

# torch _init_weight: normal(0, sqrt(2/n)), n = kh*kw*out_ch → fan_out kaiming
conv_init = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')


class Bottleneck(nn.Module):
    """1x1 → 3x3(dilated) → 1x1 bottleneck (reference resnet.py:13-50)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool):
        def bn(name):
            return SyncBatchNorm(axis_name=self.bn_axis_name, name=name)

        def conv(features, kernel, stride=1, dilation=1, name=None):
            return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                           kernel_dilation=(dilation, dilation),
                           padding=[(dilation * (kernel // 2),) * 2] * 2,
                           use_bias=False, kernel_init=conv_init,
                           dtype=self.dtype, name=name)

        residual = x
        out = conv(self.planes, 1, name='conv1')(x)
        out = nn.relu(bn('bn1')(out, train))
        out = conv(self.planes, 3, stride=self.stride, dilation=self.dilation,
                   name='conv2')(out)
        out = nn.relu(bn('bn2')(out, train))
        out = conv(self.planes * self.expansion, 1, name='conv3')(out)
        out = bn('bn3')(out, train)

        if self.has_downsample:
            residual = conv(self.planes * self.expansion, 1, stride=self.stride,
                            name='downsample_conv')(x)
            residual = bn('downsample_bn')(residual, train)

        return nn.relu(out + residual)


class ResNet(nn.Module):
    """Dilated multi-grid ResNet trunk returning the layer4 feature map.

    ``remat=True`` wraps every bottleneck in jax.checkpoint — activations
    are rematerialized in the backward pass, trading ~30% FLOPs for the
    HBM needed to scale batch/resolution (SURVEY.md TPU design notes).
    """
    layers: Sequence[int]  # blocks per stage, e.g. (3, 4, 23, 3)
    output_stride: int = 16
    multi_grid: Sequence[int] = (1, 2, 4)
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        if self.output_stride == 16:
            strides, dilations = (1, 2, 2, 1), (1, 1, 1, 2)
        elif self.output_stride == 8:
            strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)
        else:
            raise NotImplementedError(
                'output_stride must be 8 or 16, got {0}'.format(self.output_stride))

        # static_argnums=(2,): `train` is a Python bool, not a traced value
        block_cls = (nn.remat(Bottleneck, static_argnums=(2,))
                     if self.remat else Bottleneck)

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=conv_init, dtype=self.dtype,
                    name='conv1')(x)
        x = nn.relu(SyncBatchNorm(axis_name=self.bn_axis_name, name='bn1')(x, train))
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        inplanes = 64
        for stage, planes in enumerate((64, 128, 256)):
            n_blocks = self.layers[stage]
            for b in range(n_blocks):
                stride = strides[stage] if b == 0 else 1
                has_ds = b == 0 and (stride != 1 or inplanes != planes * 4)
                x = block_cls(planes=planes, stride=stride,
                               dilation=dilations[stage], has_downsample=has_ds,
                               bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                               name='layer{0}_{1}'.format(stage + 1, b))(x, train)
                inplanes = planes * 4

        # layer4: multi-grid unit (reference resnet.py:102-119)
        planes = 512
        for b, grid in enumerate(self.multi_grid):
            stride = strides[3] if b == 0 else 1
            has_ds = b == 0 and (stride != 1 or inplanes != planes * 4)
            x = block_cls(planes=planes, stride=stride,
                           dilation=grid * dilations[3], has_downsample=has_ds,
                           bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                           name='layer4_{0}'.format(b))(x, train)
            inplanes = planes * 4

        return x


def resnet50(output_stride, bn_axis_name=None, dtype=jnp.float32, remat=False):
    return ResNet(layers=(3, 4, 6, 3), output_stride=output_stride,
                  bn_axis_name=bn_axis_name, dtype=dtype, remat=remat)


def resnet101(output_stride, bn_axis_name=None, dtype=jnp.float32, remat=False):
    return ResNet(layers=(3, 4, 23, 3), output_stride=output_stride,
                  bn_axis_name=bn_axis_name, dtype=dtype, remat=remat)


def resnet10(output_stride, bn_axis_name=None, dtype=jnp.float32, remat=False):
    """Tiny 1-block-per-stage variant for tests and sharding dry-runs
    (no reference analog — the topology matches ResNet-50/101)."""
    return ResNet(layers=(1, 1, 1, 1), output_stride=output_stride,
                  bn_axis_name=bn_axis_name, dtype=dtype, remat=remat)


def build_backbone(name, output_stride, bn_axis_name=None, dtype=jnp.float32,
                   remat=False):
    name = name.split('-')[0]  # 'resnet101-coco' → 'resnet101'
    if name == 'resnet10':
        return resnet10(output_stride, bn_axis_name, dtype, remat)
    if name == 'resnet50':
        return resnet50(output_stride, bn_axis_name, dtype, remat)
    if name == 'resnet101':
        return resnet101(output_stride, bn_axis_name, dtype, remat)
    raise ValueError('Unsupported backbone: {0}'.format(name))
