"""Semantic-segmentation task models (reference: task/sseg/model.py:21-125).

The torch wrappers become thin flax modules enforcing the resulter contract:
``pred``/``activated_pred`` tuples plus the S4L (logits) and CCT (latent)
keys (reference model.py:61-64). Param groups (backbone 1x lr, heads 10x —
reference model.py:45-48,103-107) become ``lr_mult_spec`` path rules.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...models.deeplab_v2 import DeepLabV2
from ...models.pspnet import PSPNet
from ...parallel import DATA_AXIS
from ...task_template import model_template
from ...utils import logger


def add_parser_arguments(parser):
    model_template.add_parser_arguments(parser)
    parser.add_argument('--output-stride', type=int, default=16,
                        help='sseg - output stride of the ResNet backbone')
    parser.add_argument('--backbone', type=str, default='resnet101',
                        help='sseg - backbone architecture')
    parser.add_argument('--freeze-bn', type=lambda v: str(v).lower() in ('1', 'true', 'yes'),
                        default=False, help='sseg - freeze BatchNorm statistics')
    parser.add_argument('--pretrained-path', type=str, default='',
                        help='sseg - path to a converted pretrained backbone '
                             '(torch→jax, see models/convert.py)')


def deeplabv2():
    return DeepLabV2Model


def pspnet():
    return PSPNetModel


class _SsegModule(nn.Module):
    """Shared forward contract around a segmentation net."""
    net: nn.Module

    @nn.compact
    def __call__(self, inp, train: bool):
        if len(inp) != 1:
            raise ValueError('sseg models require exactly one input, got '
                             '{0}'.format(len(inp)))
        pred, latent = self.net(inp[0], train)
        pred = pred.astype(jnp.float32)
        return {
            'pred': (pred,),
            'activated_pred': (jax.nn.softmax(pred, axis=-1),),
            'ssls4l_rc_inp': pred,
            'sslcct_ad_inp': latent,
        }


class DeepLabV2Model(model_template.TaskModel):
    """DeepLab-v2 wrapper (reference model.py:29-84)."""

    lr_mult_spec = (('classifier', 10.0),)

    def __init__(self, args):
        super(DeepLabV2Model, self).__init__(args)
        net = DeepLabV2(backbone=args.backbone,
                        output_stride=args.output_stride,
                        num_classes=args.num_classes,
                        bn_axis_name=DATA_AXIS,
                        dtype=_model_dtype(args))
        self.module = _SsegModule(net=net)


class PSPNetModel(model_template.TaskModel):
    """PSPNet wrapper (reference model.py:87-125)."""

    lr_mult_spec = (('psp', 10.0), ('decoder', 10.0))

    def __init__(self, args):
        super(PSPNetModel, self).__init__(args)
        if args.output_stride != 8:
            logger.log_warn('PSPNet is benchmarked with output_stride=8 '
                            '(got {0})'.format(args.output_stride))
        net = PSPNet(backbone=args.backbone,
                     output_stride=args.output_stride,
                     num_classes=args.num_classes,
                     bn_axis_name=DATA_AXIS,
                     dtype=_model_dtype(args))
        self.module = _SsegModule(net=net)


def _model_dtype(args):
    return jnp.bfloat16 if getattr(args, 'bf16', True) else jnp.float32
