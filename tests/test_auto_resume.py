"""--auto-resume preemption recovery through the full proxy stack:
a relaunched job picks up the newest checkpoint in its own ckpt dir and
continues from the saved epoch (TPU build addition; the reference's only
resume is an explicit --resume path, reference proxy.py:132-134)."""

import collections
import os

import numpy as np

import pixelssl_tpu
from pixelssl_tpu.task_template.proxy import _latest_checkpoint
from pixelssl_tpu.tasks import sseg


def _config(tmp_path, **overrides):
    cfg = collections.OrderedDict([
        ('exp_id', 'test_autoresume'),
        ('out_path', str(tmp_path)),
        ('ssl_algorithm', 'ssl_null'),
        ('trainset', "{'synthetic_sseg': ['/tmp']}"),
        ('valset', "{'synthetic_sseg': ['/tmp']}"),
        ('num_workers', 0),
        ('im_size', 32),
        ('synthetic_samples', 32),
        ('epochs', 1),
        ('batch_size', 2),          # per device
        ('unlabeled_batch_size', 0),
        ('models', "{'model': 'deeplabv2'}"),
        ('optimizers', "{'model': 'sgd'}"),
        ('lrers', "{'model': 'polynomiallr'}"),
        ('criterions', "{'model': 'sseg_criterion'}"),
        ('lr', 0.01),
        ('momentum', 0.9),
        ('backbone', 'resnet50'),
        ('num_classes', 4),
        ('log_freq', 1),
        ('val_freq', 100),
        ('checkpoint_freq', 1),
        ('auto_resume', True),
    ])
    cfg.update(overrides)
    return cfg


def test_latest_checkpoint_selection(tmp_path):
    assert _latest_checkpoint(str(tmp_path / 'missing')) is None
    d = tmp_path / 'ckpt'
    d.mkdir()
    assert _latest_checkpoint(str(d)) is None
    for name in ('checkpoint_1', 'checkpoint_10', 'checkpoint_2',
                 'checkpoint_junk', 'other'):
        (d / name).mkdir()
    assert _latest_checkpoint(str(d)) == str(d / 'checkpoint_10')


def test_auto_resume_continues_from_newest_checkpoint(tmp_path):
    # "preempted" first launch: 1 epoch, saves checkpoint_1 (no existing
    # checkpoint -> auto-resume silently starts from scratch)
    proxy1 = pixelssl_tpu.run_script(
        _config(tmp_path), sseg, sseg.SemanticSegmentationProxy)
    ipe = proxy1.args.iters_per_epoch
    assert int(np.asarray(proxy1.ssl_algorithm.state['step'])) == ipe
    ckpt_dir = str(tmp_path / 'test_autoresume' / 'ckpt')
    assert os.path.isdir(os.path.join(ckpt_dir, 'checkpoint_1'))

    # relaunch with the SAME command but a longer budget: must pick up
    # checkpoint_1 and train only the remaining epoch
    proxy2 = pixelssl_tpu.run_script(
        _config(tmp_path, epochs=2), sseg, sseg.SemanticSegmentationProxy)
    assert proxy2.args.resume == os.path.join(ckpt_dir, 'checkpoint_1')
    assert int(np.asarray(proxy2.ssl_algorithm.state['step'])) == 2 * ipe
    assert os.path.isdir(os.path.join(ckpt_dir, 'checkpoint_2'))
