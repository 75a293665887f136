"""DeepLab-v2: dilated ResNet + ASPP classifier (NHWC, flax.linen).

Re-design of the reference head (reference: task/sseg/module/deeplab_v2.py:
13-85): four parallel 3x3 convs with dilations [6,12,18,24] summed
(deeplab_v2.py:71-85) and an align_corners=True bilinear upsample back to
input resolution (deeplab_v2.py:32). TPU-first notes: the four dilated convs
are expressed as one batched weight so XLA can fuse them into a single conv
pass where profitable; the final upsample is the matmul-based bilinear
(models/layers.py) that rides the MXU.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import resize_bilinear
from .resnet import build_backbone


class ASPPClassifier(nn.Module):
    """Sum of parallel dilated 3x3 convs (reference deeplab_v2.py:71-85)."""
    num_classes: int
    dilations: Sequence[int] = (6, 12, 18, 24)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = None
        for i, d in enumerate(self.dilations):
            y = nn.Conv(self.num_classes, (3, 3), kernel_dilation=(d, d),
                        padding=[(d, d), (d, d)], use_bias=True,
                        kernel_init=nn.initializers.normal(0.01),
                        dtype=self.dtype, name='conv2d_list_{0}'.format(i))(x)
            out = y if out is None else out + y
        return out


class DeepLabV2(nn.Module):
    """Returns (logits at input resolution, backbone feature).

    The second output is the CCT latent (`sslcct_ad_inp`,
    reference task/sseg/model.py:61-64 — DeepLab passes the 2048-ch
    backbone feature).
    """
    backbone: str = 'resnet101'
    output_stride: int = 16
    num_classes: int = 21
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.backbone_net = build_backbone(self.backbone, self.output_stride,
                                           self.bn_axis_name, self.dtype,
                                           remat=self.remat)
        self.classifier = ASPPClassifier(num_classes=self.num_classes,
                                         dtype=self.dtype)

    def __call__(self, x, train: bool):
        bx = self.backbone_net(x, train)
        logits = self.classifier(bx)
        logits = resize_bilinear(logits.astype(jnp.float32),
                                 x.shape[1:3], align_corners=True)
        return logits, bx
