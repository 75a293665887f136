"""End-to-end SupOnly (ssl_null) run through the full proxy stack on the
fake 8-device CPU mesh: train 2 epochs on synthetic data, validate,
checkpoint, resume."""

import collections

import numpy as np
import pytest

import pixelssl_tpu
from pixelssl_tpu.tasks import sseg


def _config(tmp_path, **overrides):
    cfg = collections.OrderedDict([
        ('exp_id', 'test_suponly'),
        ('out_path', str(tmp_path)),
        ('ssl_algorithm', 'ssl_null'),
        ('trainset', "{'synthetic_sseg': ['/tmp']}"),
        ('valset', "{'synthetic_sseg': ['/tmp']}"),
        ('num_workers', 0),
        ('im_size', 32),
        ('synthetic_samples', 32),
        ('epochs', 2),
        ('batch_size', 2),          # per device → global 16 on 8 devices
        ('unlabeled_batch_size', 0),
        ('models', "{'model': 'deeplabv2'}"),
        ('optimizers', "{'model': 'sgd'}"),
        ('lrers', "{'model': 'polynomiallr'}"),
        ('criterions', "{'model': 'sseg_criterion'}"),
        ('lr', 0.01),
        ('momentum', 0.9),
        ('weight-decay', 0.0005),
        ('backbone', 'resnet50'),
        ('num_classes', 4),
        ('log_freq', 1),
        ('val_freq', 1),
        ('checkpoint_freq', 1),
    ])
    cfg.update(overrides)
    return cfg


def test_suponly_e2e(tmp_path):
    proxy = pixelssl_tpu.run_script(
        _config(tmp_path), sseg, sseg.SemanticSegmentationProxy)
    algo = proxy.ssl_algorithm
    assert int(np.asarray(algo.state['step'])) == 2 * proxy.args.iters_per_epoch
    # loss is finite and training metrics were logged
    assert 'task_loss' in algo.meters or algo.meters is not None

    # validation-only rescore from the saved checkpoint (the reference's
    # fidelity gate: every benchmark script defaults to validation+resume)
    ckpt = str(tmp_path / 'test_suponly' / 'ckpt' / 'checkpoint_2')
    proxy2 = pixelssl_tpu.run_script(
        _config(tmp_path, exp_id='test_suponly_val', validation=True,
                resume=ckpt),
        sseg, sseg.SemanticSegmentationProxy)
    meters = proxy2.ssl_algorithm.meters
    miou_keys = [k for k in meters.keys() if 'mIoU' in k]
    assert miou_keys, 'validation must produce an mIoU metric'
    assert 0.0 <= float(meters[miou_keys[0]].val) <= 1.0


def test_suponly_checkpoint_guard(tmp_path):
    cfg = _config(tmp_path, epochs=1)
    proxy = pixelssl_tpu.run_script(cfg, sseg, sseg.SemanticSegmentationProxy)
    # wrong-algorithm guard: corrupt the stored algorithm id
    algo = proxy.ssl_algorithm
    algo.NAME = 'ssl_other'
    with pytest.raises(SystemExit):
        algo.load_checkpoint(str(tmp_path / 'test_suponly' / 'ckpt' / 'checkpoint_1'))
