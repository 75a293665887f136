"""Checkpoint round-trip for every algorithm's state structure (GCT's 3
models/optimizers, ADV's discriminator, CCT's nested decoder params, EMA
teachers) — reference parity: per-algorithm save/load with the
algorithm-name guard (reference ssl_null.py:194-218 etc.)."""

import numpy as np
import pytest

import jax

from pixelssl_tpu import harness, parallel

CONFIGS = {
    'ssl_null': dict(unlabeled_batch_size=0, ignore_unlabeled=True),
    'ssl_mt': dict(cons_scale=1.0, cons_rampup_epochs=1, ema_decay=0.99),
    'ssl_adv': dict(adv_for_labeled=True, labeled_adv_scale=0.01,
                    unlabeled_adv_scale=0.001),
    'ssl_s4l': dict(rotated_sup_scale=0.1, rotation_scale=0.1),
    'ssl_cutmix': dict(cons_scale=1.0, cons_rampup_epochs=1,
                       cons_threshold=0.9, ema_decay=0.99),
    'ssl_gct': dict(im_size=64, ssl_mode='gct', fc_ssl_scale=1.0,
                    dc_ssl_scale=1.0, dc_threshold=0.5, dc_rampup_epochs=1,
                    mu=0.5, nu=1),
    'ssl_cct': dict(im_size=64, cons_scale=1.0, cons_rampup_epochs=1,
                    ad_lr_scale=10.0, drop_dec_num=1, fn_dec_num=1),
}


@pytest.mark.parametrize('algo_name', sorted(CONFIGS))
def test_checkpoint_roundtrip(algo_name, tmp_path):
    mesh = parallel.make_mesh()
    n = mesh.devices.size
    base = dict(backbone='resnet10', im_size=32, num_classes=5,
                batch_size=2 * n,
                unlabeled_batch_size=(2 if algo_name == 'ssl_cutmix' else 1) * n,
                ignore_unlabeled=False, lr=0.01, momentum=0.9, epochs=1,
                checkpoint_path=str(tmp_path / algo_name))
    if algo_name == 'ssl_cutmix':
        base['batch_size'] = 4 * n
    base.update(CONFIGS[algo_name])
    args = harness.default_args(algo_name, **base)
    algo = harness.build_algorithm(args, mesh=mesh)

    import os
    os.makedirs(args.checkpoint_path, exist_ok=True)
    algo.save_checkpoint(epoch=1)

    # mutate the live state, then restore and compare against the snapshot
    snapshot = jax.device_get(algo.state)
    algo.state = jax.tree.map(lambda x: x * 0 if hasattr(x, 'dtype') else x,
                              algo.state)
    epoch = algo.load_checkpoint(
        str(tmp_path / algo_name / 'checkpoint_1'))
    assert epoch == 1
    for a, b in zip(jax.tree.leaves(snapshot),
                    jax.tree.leaves(jax.device_get(algo.state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
