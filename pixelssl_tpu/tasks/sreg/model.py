"""Pixel-regression task model: a small NHWC encoder–decoder
("unet_lite") following the task-model contract (task_template/model.py;
reference: pixelssl/task_template/model.py:17-85).

Resulter keys: ``pred`` (raw 1-channel map), ``activated_pred`` (sigmoid —
alpha lives in [0,1]), ``ssls4l_rc_inp`` (bottleneck features for the S4L
rotation head, mirroring how sseg feeds its logits,
tasks/sseg/model.py). bf16 conv compute / fp32 head follows the
repo-wide dtype policy; BatchNorm is the cross-replica SyncBatchNorm
(models/layers.py).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...models.layers import SyncBatchNorm, resize_bilinear
from ...parallel import DATA_AXIS
from ...utils import cmd
from ...task_template import model_template


def add_parser_arguments(parser):
    model_template.add_parser_arguments(parser)
    parser.add_argument('--base-channels', type=int, default=32,
                        help='sreg - width of the first encoder stage')
    parser.add_argument('--bf16', type=cmd.str2bool,
                        default=True,
                        help='sreg - bfloat16 conv compute (fp32 statistics/losses)')


def unet_lite():
    return UNetLiteModel


class _ConvBNRelu(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: str = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding='SAME', use_bias=False, dtype=self.dtype)(x)
        x = SyncBatchNorm(axis_name=self.bn_axis_name)(x, train)
        return nn.relu(x)


class UNetLite(nn.Module):
    """3-stage encoder (C, 2C, 4C; stride-2 downsampling) + matmul-bilinear
    decoder with skip concats + fp32 1-channel head."""
    base: int = 32
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: str = DATA_AXIS

    @nn.compact
    def __call__(self, x, train: bool):
        c = self.base
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        e1 = _ConvBNRelu(c, **kw)(x.astype(self.dtype), train)
        e2 = _ConvBNRelu(2 * c, strides=2, **kw)(e1, train)
        e3 = _ConvBNRelu(4 * c, strides=2, **kw)(e2, train)
        latent = _ConvBNRelu(4 * c, **kw)(e3, train)

        d2 = resize_bilinear(latent.astype(jnp.float32), e2.shape[1:3])
        d2 = _ConvBNRelu(2 * c, **kw)(
            jnp.concatenate([d2.astype(self.dtype), e2], axis=-1), train)
        d1 = resize_bilinear(d2.astype(jnp.float32), e1.shape[1:3])
        d1 = _ConvBNRelu(c, **kw)(
            jnp.concatenate([d1.astype(self.dtype), e1], axis=-1), train)

        out = nn.Conv(1, (1, 1), dtype=jnp.float32, name='head')(
            d1.astype(jnp.float32))
        return out, latent


class _SregModule(nn.Module):
    net: nn.Module

    @nn.compact
    def __call__(self, inp, train: bool):
        if len(inp) != 1:
            raise ValueError('sreg models require exactly one input, got '
                             '{0}'.format(len(inp)))
        pred, latent = self.net(inp[0], train)
        pred = pred.astype(jnp.float32)
        return {
            'pred': (pred,),
            'activated_pred': (jax.nn.sigmoid(pred),),
            'ssls4l_rc_inp': latent.astype(jnp.float32),
        }


class UNetLiteModel(model_template.TaskModel):
    lr_mult_spec = (('head', 10.0),)  # heads 10x, like sseg (model.py:45-48)

    def __init__(self, args):
        super(UNetLiteModel, self).__init__(args)
        dtype = jnp.bfloat16 if getattr(args, 'bf16', True) else jnp.float32
        bn_axis = None if getattr(args, 'spatial_train', 0) else DATA_AXIS
        net = UNetLite(base=args.base_channels, dtype=dtype,
                       bn_axis_name=bn_axis)
        self.module = _SregModule(net=net)

    def load_pretrained(self, variables, path):
        from ...utils import logger
        logger.log_err('sreg models have no pretrained checkpoints — the '
                       'synthetic task trains from scratch')
