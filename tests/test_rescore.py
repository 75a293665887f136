"""End-to-end mIoU fidelity gate on fixture data (VERDICT r1 next-step #4):
scripts/rescore.py takes a reference-style torch checkpoint + a VOC-shaped
directory and produces exact-protocol mIoU numbers. The same command works
on real VOC + published checkpoints the moment the data exists."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'scripts'))


def _make_voc_fixture(root, n_val=3):
    """Miniature VOC2012 tree: JPEGImages + SegmentationClassAug +
    ImageSets/Segmentation/{val,train_aug}.txt."""
    img_dir = os.path.join(root, 'JPEGImages')
    lbl_dir = os.path.join(root, 'SegmentationClassAug')
    set_dir = os.path.join(root, 'ImageSets', 'Segmentation')
    for d in (img_dir, lbl_dir, set_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(3)
    names = []
    for i in range(n_val):
        name = '2007_{0:06d}'.format(i)
        names.append(name)
        h, w = int(rng.integers(60, 90)), int(rng.integers(60, 90))
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, name + '.jpg'))
        lbl = rng.integers(0, 21, (h, w)).astype(np.uint8)
        Image.fromarray(lbl, mode='L').save(
            os.path.join(lbl_dir, name + '.png'))
    with open(os.path.join(set_dir, 'val.txt'), 'w') as f:
        f.write('\n'.join(names) + '\n')
    with open(os.path.join(set_dir, 'train_aug.txt'), 'w') as f:
        f.write('\n'.join(names) + '\n')
    return root


def _reference_style_ckpt(path, algo='ssl_null'):
    """A torch checkpoint shaped like the reference's (ssl_null.py:194-201):
    {'algorithm', 'epoch', 'model': state_dict with DataParallel+TaskModel
    prefixes 'module.model.*'}."""
    from test_fullmodel_parity import _TorchDeepLabV2, _randomize_bn
    torch.manual_seed(7)
    net = _TorchDeepLabV2(num_classes=21)
    _randomize_bn(net)
    state = {'module.model.' + k: v for k, v in net.state_dict().items()}
    ckpt = {'algorithm': algo, 'epoch': 40, 'model': state}
    torch.save(ckpt, path)


def test_rescore_fixture_e2e(tmp_path, monkeypatch):
    import rescore as rescore_mod

    voc = _make_voc_fixture(str(tmp_path / 'VOC2012'))
    ckpt = str(tmp_path / 'deeplabv2_pascalvoc_1-8_suponly.ckpt')
    _reference_style_ckpt(ckpt)

    monkeypatch.chdir(tmp_path)  # pretrained/ + result/ land in tmp
    # the README's path-prefixed form must resolve too (ADVICE round 2:
    # rescore.py now basenames the script arg)
    results = rescore_mod.rescore(
        'scripts/deeplabv2_pascalvoc_1-8_suponly.py', ckpt, voc_root=voc,
        overrides={'backbone': 'resnet10', 'im_size': 65,
                   'out_path': str(tmp_path / 'result'),
                   'num_workers': 0})
    assert results, 'validation produced no mIoU metric'
    for k, v in results.items():
        assert 0.0 <= v <= 1.0, (k, v)
    # the converted orbax checkpoint for out-of-box script rescoring exists
    assert os.path.isdir(str(tmp_path / 'pretrained' /
                             'deeplabv2_pascalvoc_1-8_suponly.ckpt'))
