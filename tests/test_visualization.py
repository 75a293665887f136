"""Visualization pipeline: with --visualize and visual_freq=1, train and val
both write openable input/pred/gt PNGs per model (reference behavior:
task/sseg/func.py:82-131 via each algorithm's visual_freq hook)."""

import collections
import glob

from PIL import Image

import pixelssl_tpu
from pixelssl_tpu.tasks import sseg


def test_visualization_writes_pngs(tmp_path):
    with open(tmp_path / 'sublabeled.txt', 'w') as f:
        for i in range(0, 16, 2):
            f.write('synthetic_{0:05d}\n'.format(i))

    cfg = collections.OrderedDict([
        ('exp_id', 'viz'),
        ('out_path', str(tmp_path)),
        ('ssl_algorithm', 'ssl_mt'),
        ('trainset', "{'synthetic_sseg': ['/tmp']}"),
        ('valset', "{'synthetic_sseg': ['/tmp']}"),
        ('num_workers', 0),
        ('im_size', 32),
        ('synthetic_samples', 16),
        ('sublabeled_path', str(tmp_path / 'sublabeled.txt')),
        ('ignore_unlabeled', False),
        ('epochs', 1),
        ('batch_size', 2),            # per device
        ('unlabeled_batch_size', 1),  # per device
        ('models', "{'model': 'deeplabv2'}"),
        ('optimizers', "{'model': 'sgd'}"),
        ('lrers', "{'model': 'polynomiallr'}"),
        ('criterions', "{'model': 'sseg_criterion'}"),
        ('lr', 0.001),
        ('momentum', 0.9),
        ('backbone', 'resnet10'),
        ('num_classes', 4),
        ('log_freq', 1),
        ('cons_scale', 1.0),
        ('cons_rampup_epochs', 1),
        ('ema_decay', 0.99),
        ('visualize', True),
        ('visual_freq', 1),
        ('val_freq', 1),
    ])
    pixelssl_tpu.run_script(cfg, sseg, sseg.SemanticSegmentationProxy)

    train_pngs = glob.glob(str(tmp_path / 'viz/visualization/train/*.png'))
    val_pngs = glob.glob(str(tmp_path / 'viz/visualization/val/*.png'))
    assert train_pngs, 'no train visualizations written'
    assert val_pngs, 'no val visualizations written'
    # both models visualized, all three panels present somewhere
    names = ' '.join(train_pngs + val_pngs)
    for token in ('student', 'teacher', '1-inp', '2-pred', '3-gt'):
        assert token in names, 'missing visualization panel: ' + token
    for p in train_pngs[:2] + val_pngs[:2]:
        im = Image.open(p)
        im.verify()
        assert Image.open(p).size == (32, 32)
