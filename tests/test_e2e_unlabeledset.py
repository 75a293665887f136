"""End-to-end Mean Teacher with a separate --unlabeledset (the
JointDatasetsWrapper proxy path: labeled trainset + dedicated unlabeled
dataset, reference proxy.py:361-364), rather than splitting one dataset
via sublabeled_path."""

import collections

import pixelssl_tpu
from pixelssl_tpu.tasks import sseg


def test_mt_with_separate_unlabeledset(tmp_path):
    cfg = collections.OrderedDict([
        ('exp_id', 'joint'),
        ('out_path', str(tmp_path)),
        ('ssl_algorithm', 'ssl_mt'),
        # two labeled roots of the same dataset type + one unlabeled root
        ('trainset', "{'synthetic_sseg': ['/tmp/a', '/tmp/b']}"),
        ('unlabeledset', "{'synthetic_sseg': ['/tmp/c']}"),
        ('valset', "{'synthetic_sseg': ['/tmp']}"),
        ('num_workers', 0),
        ('im_size', 32),
        ('synthetic_samples', 8),
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
        ('val_freq', 1),
    ])
    proxy = pixelssl_tpu.run_script(cfg, sseg, sseg.SemanticSegmentationProxy)
    # 2 labeled roots x 8 samples labeled, 1 unlabeled root x 8 unlabeled
    trainset = proxy.train_loader.dataset
    assert len(trainset.labeled_idxs) == 16
    assert len(trainset.unlabeled_idxs) == 8
    # training consumed both streams and validation ran
    algo = proxy.ssl_algorithm
    assert int(algo.state['step']) > 0
