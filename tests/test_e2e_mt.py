"""End-to-end Mean Teacher on the fake 8-device mesh with a two-stream
labeled/unlabeled pipeline (1/2-labeled synthetic split)."""

import collections

import numpy as np

import pixelssl_tpu
from pixelssl_tpu.tasks import sseg


def _config(tmp_path):
    return collections.OrderedDict([
        ('exp_id', 'test_mt'),
        ('out_path', str(tmp_path)),
        ('ssl_algorithm', 'ssl_mt'),
        ('trainset', "{'synthetic_sseg': ['/tmp']}"),
        ('valset', "{'synthetic_sseg': ['/tmp']}"),
        ('num_workers', 0),
        ('im_size', 32),
        ('synthetic_samples', 32),
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
        ('backbone', 'resnet50'),
        ('num_classes', 4),
        ('log_freq', 1),
        ('cons_scale', 1.0),
        ('cons_rampup_epochs', 1),
        ('ema_decay', 0.99),
        ('gaussian_noise_std', 0.1),
        # raw-logit MSE consistency at full scale with an instant ramp-up
        # can blow up a short random-init run (BN transient + 10x head
        # lr); clip keeps the e2e numerics sane so finiteness is a
        # meaningful assertion
        ('clip_grad_norm', 1.0),
    ])


def test_mt_e2e(tmp_path):
    # half of the synthetic samples are labeled
    with open(tmp_path / 'sublabeled.txt', 'w') as f:
        for i in range(0, 32, 2):
            f.write('synthetic_{0:05d}\n'.format(i))

    proxy = pixelssl_tpu.run_script(
        _config(tmp_path), sseg, sseg.SemanticSegmentationProxy)
    algo = proxy.ssl_algorithm
    state = algo.state
    assert int(np.asarray(state['step'])) > 0

    # teacher must lag the student (EMA happened)
    import jax as _jax
    s_leaves = _jax.tree.leaves(state['model']['params'])
    t_leaves = _jax.tree.leaves(state['teacher']['params'])
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(s_leaves, t_leaves)]
    assert max(diffs) > 0.0  # teacher lags student
    # but not identical to init → EMA updated
    # validation scored both student and teacher, with finite losses
    meters = algo.meters
    assert any('student' in k and 'mIoU' in k for k in meters.keys())
    assert any('teacher' in k and 'mIoU' in k for k in meters.keys())
    for k, m in meters.items():
        if k.endswith('_loss'):
            assert np.isfinite(m.avg), (k, m.avg)
