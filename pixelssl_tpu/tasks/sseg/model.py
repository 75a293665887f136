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
from ...utils import cmd
from ...task_template import model_template


def add_parser_arguments(parser):
    model_template.add_parser_arguments(parser)
    parser.add_argument('--output-stride', type=int, default=16,
                        help='sseg - output stride of the ResNet backbone')
    parser.add_argument('--backbone', type=str, default='resnet101',
                        help='sseg - backbone architecture')
    parser.add_argument('--freeze-bn', type=cmd.str2bool,
                        default=False, help='sseg - freeze BatchNorm statistics')
    parser.add_argument('--pretrained-path', type=str, default='',
                        help='sseg - path to a converted pretrained backbone '
                             '(torch→jax, see models/convert.py)')
    parser.add_argument('--remat', type=cmd.str2bool,
                        default=False,
                        help='sseg - rematerialize backbone activations in the '
                             'backward pass (larger batch/resolution per HBM)')
    parser.add_argument('--bf16', type=cmd.str2bool,
                        default=True,
                        help='sseg - bfloat16 conv compute (fp32 statistics/losses)')


def deeplabv2():
    return DeepLabV2Model


def pspnet():
    return PSPNetModel


class _SsegModule(nn.Module):
    """Shared forward contract around a segmentation net.

    ``freeze_bn=True`` keeps BatchNorm in eval mode during training
    (reference deeplab_v2.py:35-40 / model flags) — these nets have no
    other train-mode behavior, so forcing train=False on the inner net is
    exact.
    """
    net: nn.Module
    freeze_bn: bool = False

    @nn.compact
    def __call__(self, inp, train: bool):
        if len(inp) != 1:
            raise ValueError('sseg models require exactly one input, got '
                             '{0}'.format(len(inp)))
        train = train and not self.freeze_bn
        pred, latent = self.net(inp[0], train)
        pred = pred.astype(jnp.float32)
        return {
            'pred': (pred,),
            'activated_pred': (jax.nn.softmax(pred, axis=-1),),
            'ssls4l_rc_inp': pred,
            'sslcct_ad_inp': latent,
        }


def _load_sseg_pretrained(variables, path, full_converter):
    """Dispatch: full-model checkpoints (keys under 'backbone.' /
    'model.backbone.') use the wrapper converter; bare torch ResNet .pth
    files (conv1/layerX keys) load into the backbone only."""
    from ...models.convert import load_torch_state_dict, load_pretrained_backbone
    state = load_torch_state_dict(path)
    if any(k.startswith(('backbone.', 'model.backbone.')) for k in state):
        return full_converter(state, variables)
    return load_pretrained_backbone(variables, path)


class DeepLabV2Model(model_template.TaskModel):
    """DeepLab-v2 wrapper (reference model.py:29-84)."""

    lr_mult_spec = (('classifier', 10.0),)

    def load_pretrained(self, variables, path):
        from ...models.convert import convert_deeplab_v2
        return _load_sseg_pretrained(variables, path, convert_deeplab_v2)

    def __init__(self, args):
        super(DeepLabV2Model, self).__init__(args)
        net = DeepLabV2(backbone=args.backbone,
                        output_stride=args.output_stride,
                        num_classes=args.num_classes,
                        bn_axis_name=_bn_axis(args),
                        dtype=_model_dtype(args),
                        remat=getattr(args, 'remat', False))
        self.module = _SsegModule(net=net,
                                  freeze_bn=getattr(args, 'freeze_bn', False))


class PSPNetModel(model_template.TaskModel):
    """PSPNet wrapper (reference model.py:87-125)."""

    lr_mult_spec = (('psp', 10.0), ('decoder', 10.0))

    def load_pretrained(self, variables, path):
        from ...models.convert import convert_pspnet
        return _load_sseg_pretrained(variables, path, convert_pspnet)

    def __init__(self, args):
        super(PSPNetModel, self).__init__(args)
        # all 11 reference pspnet_* scripts set ('output_stride', 16) —
        # OS16 IS the published benchmark protocol (the upstream
        # _PSPModule's output_stride=8 parameter default is overridden by
        # every script, reference task/sseg/script/pspnet_*.py)
        net = PSPNet(backbone=args.backbone,
                     output_stride=args.output_stride,
                     num_classes=args.num_classes,
                     bn_axis_name=_bn_axis(args),
                     dtype=_model_dtype(args),
                     remat=getattr(args, 'remat', False))
        self.module = _SsegModule(net=net,
                                  freeze_bn=getattr(args, 'freeze_bn', False))


def _bn_axis(args):
    """BN collective axis: the shard_map data axis normally; None under
    --spatial-train, where the step runs on the GLOBAL batch and GSPMD
    partitions SyncBatchNorm's plain reductions into the same cross-device
    statistics (parallel/spatial.py)."""
    return None if getattr(args, 'spatial_train', 0) else DATA_AXIS


def _model_dtype(args):
    return jnp.bfloat16 if getattr(args, 'bf16', True) else jnp.float32
