"""torch→JAX weight conversion: numerics must match a torch reference
forward through a small dilated bottleneck stack."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from pixelssl_tpu.models.convert import convert_resnet_backbone
from pixelssl_tpu.models.resnet import ResNet


def _build_torch_resnet10():
    """Torch twin of models.resnet.resnet10 (output_stride=16)."""
    import torch.nn as nn

    class Bottleneck(nn.Module):
        def __init__(self, inplanes, planes, stride=1, dilation=1,
                     downsample=False):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                                   dilation=dilation, padding=dilation,
                                   bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU()
            self.downsample = None
            if downsample:
                self.downsample = nn.Sequential(
                    nn.Conv2d(inplanes, planes * 4, 1, stride=stride,
                              bias=False),
                    nn.BatchNorm2d(planes * 4))

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + r)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            strides, dils = (1, 2, 2, 1), (1, 1, 1, 2)
            self.layer1 = nn.Sequential(Bottleneck(64, 64, strides[0], dils[0], True))
            self.layer2 = nn.Sequential(Bottleneck(256, 128, strides[1], dils[1], True))
            self.layer3 = nn.Sequential(Bottleneck(512, 256, strides[2], dils[2], True))
            # multi-grid [1,2,4] → 3 blocks at dilation 2*grid
            self.layer4 = nn.Sequential(
                Bottleneck(1024, 512, strides[3], 1 * dils[3], True),
                Bottleneck(2048, 512, 1, 2 * dils[3], False),
                Bottleneck(2048, 512, 1, 4 * dils[3], False))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            return self.layer4(self.layer3(self.layer2(self.layer1(x))))

    return Net()


def test_converted_backbone_matches_torch_forward():
    torch.manual_seed(0)
    tnet = _build_torch_resnet10().eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    for m in tnet.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 1.5)

    # our net uses multi-grid layer4 with 3 blocks — layers=(1,1,1) + grid
    jnet = ResNet(layers=(1, 1, 1, 3), output_stride=16)
    x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    variables = jnet.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    torch_state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, batch_stats, n = convert_resnet_backbone(
        torch_state, variables['params'], variables['batch_stats'])
    assert n > 60  # all tensors matched

    ours = jnet.apply({'params': params, 'batch_stats': batch_stats},
                      jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(x).permute(0, 3, 1, 2))
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)


def test_convert_deeplab_classifier_numerics():
    """ASPP classifier weights map correctly (dilated convs + bias sum)."""
    import torch.nn as nn
    import torch.nn.functional  # noqa: F401
    from pixelssl_tpu.models.convert import convert_deeplab_v2
    from pixelssl_tpu.models.deeplab_v2 import ASPPClassifier

    torch.manual_seed(1)
    convs = nn.ModuleList([
        nn.Conv2d(8, 4, 3, padding=d, dilation=d, bias=True)
        for d in (6, 12, 18, 24)])
    x = np.random.default_rng(0).standard_normal((1, 24, 24, 8)).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        theirs = convs[0](xt)
        for c in convs[1:]:
            theirs = theirs + c(xt)
    theirs = theirs.permute(0, 2, 3, 1).numpy()

    head = ASPPClassifier(num_classes=4)
    variables = head.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # wrap into the DeepLabV2-like tree expected by the converter
    fake_vars = {'params': {'classifier': variables['params'],
                            'backbone_net': {}},
                 'batch_stats': {'backbone_net': {}}}
    torch_state = {}
    for i, c in enumerate(convs):
        torch_state['classifier.conv2d_list.{0}.weight'.format(i)] = \
            c.weight.detach().numpy()
        torch_state['classifier.conv2d_list.{0}.bias'.format(i)] = \
            c.bias.detach().numpy()
    out = convert_deeplab_v2(torch_state, fake_vars)
    ours = head.apply({'params': out['params']['classifier']}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)


def test_load_pretrained_backbone_via_taskmodel(tmp_path):
    """--pretrained-path with a bare torch ResNet .pth loads backbone
    weights at model init (the path that reproduces published mIoU)."""
    tnet = _build_torch_resnet10()
    pth = tmp_path / 'backbone.pth'
    torch.save(tnet.state_dict(), str(pth))

    from pixelssl_tpu import harness
    args = harness.default_args('ssl_null', backbone='resnet10', im_size=32,
                                num_classes=5, batch_size=8,
                                unlabeled_batch_size=0, ignore_unlabeled=True,
                                lr=0.01, pretrained_path=str(pth))
    # init through the TaskModel surface
    from pixelssl_tpu.tasks.sseg.model import deeplabv2
    model = deeplabv2()(args)
    variables = model.init(jax.random.PRNGKey(0),
                           (np.zeros((1, 32, 32, 3), np.float32),))
    # stem conv must equal the torch weights (OIHW→HWIO)
    ours = np.asarray(
        variables['params']['net']['backbone_net']['conv1']['kernel'])
    theirs = np.transpose(tnet.state_dict()['conv1.weight'].numpy(),
                          (2, 3, 1, 0))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_sgd_dampening_matches_torch():
    import jax.numpy as jnp
    from pixelssl_tpu.nn import optimizer as nnopt

    class A:
        lr, momentum, dampening, weight_decay, nesterov = 0.1, 0.9, 0.5, 0.0, False
        alpha = centered = eps = beta1 = beta2 = amsgrad = -1
    tx = nnopt.sgd(A()).make(lambda s: 0.1)

    p = torch.nn.Parameter(torch.tensor([1.0, -2.0]))
    opt = torch.optim.SGD([p], lr=0.1, momentum=0.9, dampening=0.5)
    jp = jnp.asarray([1.0, -2.0])
    state = tx.init(jp)
    for g in ([0.5, 0.25], [0.1, -0.3], [0.2, 0.2]):
        gt = torch.tensor(g)
        p.grad = gt.clone()
        opt.step()
        upd, state = tx.update(jnp.asarray(g), state, jp)
        jp = jp + upd
    np.testing.assert_allclose(np.asarray(jp), p.detach().numpy(), atol=1e-6)
