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


def _debug_viz_run(tmp_path, algo_name, extra, task='sseg'):
    """Train 1 epoch with --visualize through the harness-level loop."""
    import numpy as np
    from pixelssl_tpu import harness, parallel

    mesh = parallel.make_mesh()
    n = mesh.devices.size
    viz_dir = tmp_path / 'debugviz'
    viz_dir.mkdir()
    base = dict(backbone='resnet10', im_size=32, num_classes=5,
                batch_size=2 * n, unlabeled_batch_size=1 * n,
                ignore_unlabeled=False, lr=0.01, momentum=0.9, epochs=1,
                visualize=True, visual_freq=1, log_freq=10,
                visual_train_path=str(viz_dir))
    base.update(extra)
    args = harness.default_args(algo_name, task=task, **base)
    algo = harness.build_algorithm(args, mesh=mesh)
    batches = [harness.synthetic_batch(args, mesh, seed=s) for s in range(2)]
    algo.train(batches, epoch=0)
    return [p.name for p in viz_dir.iterdir()]


def test_adv_debug_visualization(tmp_path):
    """AdvSSL dumps D confidence maps (reference ssl_adv.py:393-408)."""
    names = ' '.join(_debug_viz_run(
        tmp_path, 'ssl_adv',
        dict(adv_for_labeled=True, labeled_adv_scale=0.01,
             unlabeled_adv_scale=0.001)))
    assert 'labeled-cmap' in names
    assert 'unlabeled-cmap' in names


def test_gct_debug_visualization(tmp_path):
    """GCT dumps flawmaps, FD-GT and DC pseudo-GT (ssl_gct.py:486-499)."""
    names = ' '.join(_debug_viz_run(
        tmp_path, 'ssl_gct',
        dict(im_size=64, ssl_mode='gct', fc_ssl_scale=1.0, dc_ssl_scale=1.0,
             dc_threshold=0.5, dc_rampup_epochs=1, mu=0.5, nu=1)))
    for token in ('l-fmap.png', 'r-fmap.png', 'l-fmap-gt', 'r-fmap-gt',
                  'l-pseudo-gt', 'r-pseudo-gt'):
        assert token in names, 'missing debug dump: ' + token


def test_gct_debug_visualization_sreg(tmp_path):
    """The same GCT debug dumps must work for the REGRESSION task, whose
    visualize_pseudo_gt renders grayscale alpha instead of a colorized
    argmax (tasks/sreg/func.py)."""
    names = ' '.join(_debug_viz_run(
        tmp_path, 'ssl_gct',
        dict(im_size=64, base_channels=8, ssl_mode='gct', fc_ssl_scale=1.0,
             dc_ssl_scale=1.0, dc_threshold=0.5, dc_rampup_epochs=1,
             mu=0.5, nu=1),
        task='sreg'))
    for token in ('l-fmap.png', 'r-fmap.png', 'l-pseudo-gt', 'r-pseudo-gt'):
        assert token in names, 'missing debug dump: ' + token
