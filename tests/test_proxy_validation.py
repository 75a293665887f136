"""Proxy argument validation fails fast with clean FatalError messages
(reference proxy.py:198-237 validation block). Each case drives the full
run_script CLI path with one misconfiguration."""

import collections

import pytest

import pixelssl_tpu
from pixelssl_tpu.tasks import sseg
from pixelssl_tpu.utils.logger import FatalError


def _base_cfg(tmp_path):
    return collections.OrderedDict([
        ('exp_id', 'badcfg'),
        ('out_path', str(tmp_path)),
        ('ssl_algorithm', 'ssl_mt'),
        ('trainset', "{'synthetic_sseg': ['/tmp']}"),
        ('valset', "{'synthetic_sseg': ['/tmp']}"),
        ('num_workers', 0),
        ('im_size', 32),
        ('synthetic_samples', 32),
        ('sublabeled_path', str(tmp_path / 'sub.txt')),
        ('ignore_unlabeled', False),
        ('epochs', 1),
        ('batch_size', 2),
        ('unlabeled_batch_size', 1),
        ('models', "{'model': 'deeplabv2'}"),
        ('optimizers', "{'model': 'sgd'}"),
        ('lrers', "{'model': 'polynomiallr'}"),
        ('criterions', "{'model': 'sseg_criterion'}"),
        ('lr', 0.001),
        ('momentum', 0.9),
        ('backbone', 'resnet10'),
        ('num_classes', 4),
    ])


def _run(cfg):
    return pixelssl_tpu.run_script(cfg, sseg, sseg.SemanticSegmentationProxy)


@pytest.mark.parametrize('patch,match', [
    # component dicts of different lengths
    ({'optimizers': "{'model': 'sgd', 'extra': 'sgd'}"},
     'must'),
    # unlabeled batch without unlabeled data semantics
    ({'ignore_unlabeled': True, 'unlabeled_batch_size': 1},
     'requires unlabeled_batch_size == 0'),
    ({'ignore_unlabeled': False, 'unlabeled_batch_size': 0},
     'requires unlabeled_batch_size != 0'),
    # labeled batch must remain positive
    ({'batch_size': 1, 'unlabeled_batch_size': 1},
     'labeled_batch_size'),
    # nonexistent sublabeled prefix file
    ({'sublabeled_path': '/nonexistent/sub.txt'},
     'Cannot find labeled file'),
    # unknown component names
    ({'models': "{'model': 'not_a_model'}"}, 'not_a_model'),
    ({'trainset': "{'not_a_dataset': ['/tmp']}"}, 'Unknown dataset type'),
    # multiple trainsets exclude sublabeled_path
    ({'trainset': "{'synthetic_sseg': ['/tmp/a', '/tmp/b']}"},
     'sublabeled_path is not allowed'),
])
def test_misconfig_fails_cleanly(tmp_path, patch, match):
    with open(tmp_path / 'sub.txt', 'w') as f:
        for i in range(0, 32, 2):
            f.write('synthetic_{0:05d}\n'.format(i))
    cfg = _base_cfg(tmp_path)
    cfg.update(patch)
    with pytest.raises(FatalError, match=match):
        _run(cfg)


def test_latest_checkpoint_picks_highest_epoch(tmp_path):
    from pixelssl_tpu.task_template.proxy import _latest_checkpoint
    assert _latest_checkpoint('') is None
    assert _latest_checkpoint(str(tmp_path / 'missing')) is None
    d = tmp_path / 'ckpt'
    d.mkdir()
    assert _latest_checkpoint(str(d)) is None
    for name in ('checkpoint_2', 'checkpoint_10', 'checkpoint_junk', 'other'):
        (d / name).mkdir()
    assert _latest_checkpoint(str(d)).endswith('checkpoint_10')
