"""FULL-model torch-forward parity at benchmark resolutions (VERDICT r1
next-step #4): random torch weights for twins of the reference networks
(task/sseg/module/deeplab_v2.py, _pspnet.py) converted through
models/convert.py must reproduce the torch forward numerics — DeepLab-v2 at
321, PSPNet at 513. This is the converter half of the mIoU fidelity gate,
runnable without VOC data."""

import math

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pixelssl_tpu.models.convert import convert_deeplab_v2, convert_pspnet
from pixelssl_tpu.models.deeplab_v2 import DeepLabV2
from pixelssl_tpu.models.pspnet import PSPNet


# ---------------------------------------------------------------------------
# torch twins of the reference modules (rebuilt from the reference layouts;
# resnet10-depth backbone so the test stays CPU-fast)
# ---------------------------------------------------------------------------

class _Bottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                dilation=dilation, padding=dilation,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride=stride,
                           bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + r)


class _Backbone(tnn.Module):
    """Twin of the reference dilated ResNet
    (task/sseg/module/backbone/resnet.py), multi-grid [1,2,4] layer4.
    ``layers`` = block counts for layer1-3: (1,1,1) is the CPU-fast
    resnet10 twin, (3,4,23) the REAL ResNet-101."""

    def __init__(self, output_stride=16, layers=(1, 1, 1)):
        super().__init__()
        if output_stride == 16:
            strides, dils = (1, 2, 2, 1), (1, 1, 1, 2)
        else:
            strides, dils = (1, 2, 1, 1), (1, 1, 2, 4)
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)

        def stage(inplanes, planes, n, stride, dil):
            blocks = [_Bottleneck(inplanes, planes, stride, dil, True)]
            blocks += [_Bottleneck(planes * 4, planes, 1, dil, False)
                       for _ in range(n - 1)]
            return tnn.Sequential(*blocks)

        self.layer1 = stage(64, 64, layers[0], strides[0], dils[0])
        self.layer2 = stage(256, 128, layers[1], strides[1], dils[1])
        self.layer3 = stage(512, 256, layers[2], strides[2], dils[2])
        self.layer4 = tnn.Sequential(
            _Bottleneck(1024, 512, strides[3], 1 * dils[3], True),
            _Bottleneck(2048, 512, 1, 2 * dils[3], False),
            _Bottleneck(2048, 512, 1, 4 * dils[3], False))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


class _TorchDeepLabV2(tnn.Module):
    """Twin of the reference DeepLabV2 (deeplab_v2.py:13-85)."""

    def __init__(self, num_classes, layers=(1, 1, 1)):
        super().__init__()
        self.backbone = _Backbone(output_stride=16, layers=layers)
        self.classifier = tnn.Module()
        self.classifier.conv2d_list = tnn.ModuleList([
            tnn.Conv2d(2048, num_classes, 3, padding=d, dilation=d, bias=True)
            for d in (6, 12, 18, 24)])

    def forward(self, x):
        bx = self.backbone(x)
        out = self.classifier.conv2d_list[0](bx)
        for conv in self.classifier.conv2d_list[1:]:
            out = out + conv(bx)
        return F.interpolate(out, size=x.size()[2:], mode='bilinear',
                             align_corners=True)


class _TorchPixelShuffle(tnn.Module):
    def __init__(self, n_channels, scale=2):
        super().__init__()
        self.conv = tnn.Conv2d(n_channels, n_channels * scale ** 2, 1)
        self.shuf = tnn.PixelShuffle(scale)
        self.relu = tnn.ReLU()

    def forward(self, x):
        return self.shuf(self.relu(self.conv(x)))


class _TorchPSPNet(tnn.Module):
    """Twin of the reference _PSPNet (_pspnet.py:57-142)."""

    def __init__(self, num_classes, layers=(1, 1, 1)):
        super().__init__()
        self.backbone = _Backbone(output_stride=8, layers=layers)
        self.psp = tnn.Module()
        in_ch, bins = 2048, (1, 2, 3, 6)
        out_ch = in_ch // len(bins)
        self.psp.stages = tnn.ModuleList([
            tnn.Sequential(tnn.AdaptiveAvgPool2d(b),
                           tnn.Conv2d(in_ch, out_ch, 1, bias=False),
                           tnn.BatchNorm2d(out_ch), tnn.ReLU())
            for b in bins])
        self.psp.bottleneck = tnn.Sequential(
            tnn.Conv2d(in_ch + out_ch * len(bins), out_ch, 3, padding=1,
                       bias=False),
            tnn.BatchNorm2d(out_ch), tnn.ReLU())
        self.decoder = tnn.Sequential(
            tnn.Conv2d(out_ch, num_classes, 1, bias=False),
            *[_TorchPixelShuffle(num_classes) for _ in range(int(math.log2(8)))])

    def forward(self, x):
        bx = self.backbone(x)
        h, w = bx.size(2), bx.size(3)
        pyr = [bx] + [F.interpolate(s(bx), size=(h, w), mode='bilinear',
                                    align_corners=False)
                      for s in self.psp.stages]
        px = self.psp.bottleneck(torch.cat(pyr, dim=1))
        out = self.decoder(px)
        return F.interpolate(out, size=x.size()[2:], mode='bilinear',
                             align_corners=True)


def _randomize_bn(net):
    for m in net.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 1.5)


def _full_state(net, prefix='model.'):
    """The reference wraps the net as TaskModel.model → keys model.*."""
    return {prefix + k: v.detach().numpy() for k, v in net.state_dict().items()}


@pytest.mark.parametrize('model_name,size', [('deeplabv2', 321),
                                             ('pspnet', 513)])
def test_fullmodel_forward_parity(model_name, size):
    torch.manual_seed(0)
    nc = 6
    if model_name == 'deeplabv2':
        tnet = _TorchDeepLabV2(nc).eval()
        jnet = DeepLabV2(backbone='resnet10', output_stride=16,
                         num_classes=nc, bn_axis_name=None)
        converter = convert_deeplab_v2
    else:
        tnet = _TorchPSPNet(nc).eval()
        jnet = PSPNet(backbone='resnet10', output_stride=8,
                      num_classes=nc, bn_axis_name=None)
        converter = convert_pspnet
    _randomize_bn(tnet)

    x = np.random.default_rng(0).standard_normal(
        (1, size, size, 3)).astype(np.float32)
    variables = jnet.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    converted = converter(_full_state(tnet), dict(variables))

    ours, _ = jnet.apply({'params': converted['params'],
                          'batch_stats': converted['batch_stats']},
                         jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(x).permute(0, 3, 1, 2))
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-3)
    # guard against vacuous parity: outputs must have real dynamic range
    assert np.std(theirs) > 1e-3
