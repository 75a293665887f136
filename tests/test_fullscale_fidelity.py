"""Full-scale fidelity path without egress (round-2 verdict item #5):
the published-checkpoint machinery — reference-layout torch state dict →
models/convert.py → orbax → exact-val protocol — exercised at REAL
ResNet-101 parameter count and benchmark resolutions, not the resnet10
twins the fast tests use. One run of this file proves the whole
out-of-the-box rescoring path minus the actual download
(reference task/sseg/README.md:18-40, script defaults
deeplabv2_pascalvoc_1-8_suponly.py:24-25).

Runtime note: R101 on a CPU host is minutes per forward-compile; this
file keeps one model per test and fixes fixture image sizes so exact-val
compiles a single shape.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from test_fullmodel_parity import (_TorchDeepLabV2, _TorchPSPNet,
                                   _randomize_bn, _full_state)
from test_rescore import _make_voc_fixture

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'scripts'))

R101_LAYERS = (3, 4, 23)

# real parameter counts (weights+biases+BN affine) of the benchmark
# networks — the reference's headline models (task/sseg/README.md tables)
R101_DEEPLAB_PARAMS_MIN = 42_000_000
R101_PSPNET_PARAMS_MIN = 42_000_000


def _n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def _forward_parity(model_name, size, nc=21):
    from pixelssl_tpu.models.convert import convert_deeplab_v2, convert_pspnet
    from pixelssl_tpu.models.deeplab_v2 import DeepLabV2
    from pixelssl_tpu.models.pspnet import PSPNet

    torch.manual_seed(0)
    if model_name == 'deeplabv2':
        tnet = _TorchDeepLabV2(nc, layers=R101_LAYERS).eval()
        jnet = DeepLabV2(backbone='resnet101', output_stride=16,
                         num_classes=nc, bn_axis_name=None)
        converter, pmin = convert_deeplab_v2, R101_DEEPLAB_PARAMS_MIN
    else:
        tnet = _TorchPSPNet(nc, layers=R101_LAYERS).eval()
        jnet = PSPNet(backbone='resnet101', output_stride=8,
                      num_classes=nc, bn_axis_name=None)
        converter, pmin = convert_pspnet, R101_PSPNET_PARAMS_MIN
    _randomize_bn(tnet)

    x = np.random.default_rng(0).standard_normal(
        (1, size, size, 3)).astype(np.float32)
    variables = jnet.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    n_jax = _n_params(variables['params'])
    n_torch = sum(p.numel() for p in tnet.parameters())
    assert n_jax == n_torch, (n_jax, n_torch)
    assert n_jax > pmin, 'not the real network: %d params' % n_jax

    converted = converter(_full_state(tnet), dict(variables))
    ours, _ = jnet.apply({'params': converted['params'],
                          'batch_stats': converted['batch_stats']},
                         jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(x).permute(0, 3, 1, 2))
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    # 100-conv-deep fp32 stacks: reduction-order noise accumulates more
    # than in the resnet10 twins (same check, looser atol)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-2)
    assert np.std(theirs) > 1e-3


def test_deeplabv2_r101_forward_parity_321():
    _forward_parity('deeplabv2', 321)


def test_pspnet_r101_forward_parity_513():
    _forward_parity('pspnet', 513)


def test_rescore_r101_exact_val_e2e(tmp_path, monkeypatch):
    """scripts/rescore.py end-to-end at real parameter count: convert a
    reference-layout R101 checkpoint, write the orbax pytree, run the
    exact reference validation protocol (batch 1, original unpadded
    size) on a VOC-shaped fixture."""
    import rescore as rescore_mod

    # fixed-size fixture images -> exact-val compiles ONE shape
    voc = _make_voc_fixture(str(tmp_path / 'VOC2012'), n_val=2)
    import PIL.Image as Image
    rng = np.random.default_rng(5)
    for name in ('2007_000000', '2007_000001'):
        img = rng.integers(0, 255, (65, 81, 3), np.uint8)
        Image.fromarray(img).save(
            os.path.join(voc, 'JPEGImages', name + '.jpg'))
        lbl = rng.integers(0, 21, (65, 81)).astype(np.uint8)
        Image.fromarray(lbl, mode='L').save(
            os.path.join(voc, 'SegmentationClassAug', name + '.png'))

    torch.manual_seed(7)
    net = _TorchDeepLabV2(num_classes=21, layers=R101_LAYERS)
    _randomize_bn(net)
    assert sum(p.numel() for p in net.parameters()) > R101_DEEPLAB_PARAMS_MIN
    state = {'module.model.' + k: v for k, v in net.state_dict().items()}
    ckpt = str(tmp_path / 'deeplabv2_pascalvoc_1-8_suponly.ckpt')
    torch.save({'algorithm': 'ssl_null', 'epoch': 40, 'model': state}, ckpt)

    monkeypatch.chdir(tmp_path)
    results = rescore_mod.rescore(
        'deeplabv2_pascalvoc_1-8_suponly', ckpt, voc_root=voc,
        overrides={'out_path': str(tmp_path / 'result'), 'num_workers': 0,
                   'exact_val': True})
    assert results, 'validation produced no mIoU metric'
    for k, v in results.items():
        assert 0.0 <= v <= 1.0, (k, v)
    assert os.path.isdir(str(tmp_path / 'pretrained' /
                             'deeplabv2_pascalvoc_1-8_suponly.ckpt'))
