"""End-to-end coverage of the REGRESSION task type through the full proxy
stack on the fake 8-device CPU mesh.

The reference declares REGRESSION as a first-class task type
(pixelssl/utils/constant.py; per-algorithm SUPPORTED_TASK_TYPES) but ships
only the classification sseg task — these tests run the synthetic sreg
task (tasks/sreg) through every regression-supporting algorithm and assert
the classification-only algorithms are rejected by the task-type gate
(task_template/proxy.py)."""

import collections

import numpy as np
import pytest

import pixelssl_tpu
from pixelssl_tpu.tasks import sreg


def _config(tmp_path, algo, **overrides):
    cfg = collections.OrderedDict([
        ('exp_id', 'sreg_{0}'.format(algo)),
        ('out_path', str(tmp_path)),
        ('ssl_algorithm', algo),
        ('trainset', "{'synthetic_sreg': ['/tmp']}"),
        ('valset', "{'synthetic_sreg': ['/tmp']}"),
        ('num_workers', 0),
        ('im_size', 32),
        ('synthetic_samples', 16),
        ('epochs', 1),
        ('batch_size', 1),            # per device → global 8
        ('unlabeled_batch_size', 0),
        ('models', "{'model': 'unet_lite'}"),
        ('optimizers', "{'model': 'sgd'}"),
        ('lrers', "{'model': 'polynomiallr'}"),
        ('criterions', "{'model': 'sreg_criterion'}"),
        ('base_channels', 16),
        ('lr', 0.05),
        ('momentum', 0.9),
        ('weight-decay', 0.0),
        ('log_freq', 1),
        ('val_freq', 1),
    ])
    cfg.update(overrides)
    return cfg


def _ssl_overrides(algo):
    """Minimal flag sets per algorithm (mirrors tests/test_algorithms.py),
    with a dedicated unlabeled set so the two-stream path is exercised."""
    common = {
        'unlabeledset': "{'synthetic_sreg': ['/tmp/u']}",
        'batch_size': 2,              # per device: 1 labeled + 1 unlabeled
        'unlabeled_batch_size': 1,
        'ignore_unlabeled': False,
    }
    per_algo = {
        'ssl_mt': dict(cons_scale=1.0, cons_rampup_epochs=1,
                       ema_decay=0.99, gaussian_noise_std=0.1),
        'ssl_adv': dict(adv_for_labeled=True, labeled_adv_scale=0.01,
                        unlabeled_adv_scale=0.001,
                        unlabeled_for_discriminator=True),
        # im_size 64: the flaw-detector pyramid needs the spatial extent
        # (same constraint as the sseg GCT tests / dryrun configs)
        'ssl_gct': dict(im_size=64, ssl_mode='gct', fc_ssl_scale=1.0,
                        dc_ssl_scale=1.0, dc_threshold=0.4,
                        dc_rampup_epochs=1, mu=0.5, nu=1, fd_scale=1.0),
        'ssl_s4l': dict(rotated_sup_scale=0.5, rotation_scale=1.0),
    }
    out = dict(common)
    out.update(per_algo[algo])
    return out


def _val_scores(proxy):
    meters = proxy.ssl_algorithm.meters
    keys = {k: float(meters[k].val) for k in meters.keys() if 'metric' in k}
    assert keys, 'validation must produce regression metrics'
    return keys


def test_synthetic_roots_yield_distinct_samples():
    """A dedicated --unlabeledset must contain different samples than the
    labeled trainset — not byte-identical copies (dataset_root_key folds
    the root path into the per-sample RNG, task_template/data.py)."""
    import types

    from pixelssl_tpu.tasks.sreg.data import SyntheticSregDataset
    from pixelssl_tpu.tasks.sseg.data import SyntheticSsegDataset

    def mkargs(root):
        return types.SimpleNamespace(
            trainset={'synthetic': [root]}, valset={'synthetic': [root]},
            im_size=16, synthetic_samples=4, noise_std=0.05, seed=0,
            num_classes=4)

    for cls in (SyntheticSregDataset, SyntheticSsegDataset):
        a = cls(mkargs('/tmp'), True)[0][0][0]
        b = cls(mkargs('/tmp/u'), True)[0][0][0]
        c = cls(mkargs('/tmp'), True)[0][0][0]
        assert not np.array_equal(a, b), cls.__name__
        assert np.array_equal(a, c), cls.__name__  # deterministic per root


def test_sreg_suponly_e2e(tmp_path):
    proxy = pixelssl_tpu.run_script(
        _config(tmp_path, 'ssl_null', epochs=8, synthetic_samples=32,
                optimizers="{'model': 'adam'}", lr=0.003, beta1=0.9,
                beta2=0.999, eps=1e-8, checkpoint_freq=8),
        sreg, sreg.PixelRegressionProxy)
    assert int(np.asarray(proxy.ssl_algorithm.state['step'])) == \
        8 * proxy.args.iters_per_epoch

    # rescore from the saved checkpoint (validation+resume, the reference
    # out-of-box script mode) and check the regression metrics
    ckpt = str(tmp_path / 'sreg_ssl_null' / 'ckpt' / 'checkpoint_8')
    # same optimizer flags as training — restore rebuilds the opt-state tree
    proxy2 = pixelssl_tpu.run_script(
        _config(tmp_path, 'ssl_null', exp_id='sreg_val', validation=True,
                synthetic_samples=32, optimizers="{'model': 'adam'}",
                lr=0.003, beta1=0.9, beta2=0.999, eps=1e-8, resume=ckpt),
        sreg, sreg.PixelRegressionProxy)
    scores = _val_scores(proxy2)
    mse = [v for k, v in scores.items() if k.endswith('_mse')][0]
    psnr = [v for k, v in scores.items() if k.endswith('_psnr')][0]
    mae = [v for k, v in scores.items() if k.endswith('_mae')][0]
    assert 0.0 <= mse <= 1.0 and np.isfinite(psnr)
    # sanity relations: mae^2 <= mse (Jensen), psnr consistent with mse
    assert mae ** 2 <= mse + 1e-9
    np.testing.assert_allclose(psnr, 10 * np.log10(1.0 / max(mse, 1e-12)),
                               rtol=1e-6)
    # the model must beat the trivial "predict 0.5 everywhere" baseline
    assert mse < 0.08


@pytest.mark.parametrize('algo', ['ssl_mt', 'ssl_adv', 'ssl_gct', 'ssl_s4l'])
def test_sreg_ssl_algorithm_e2e(tmp_path, algo):
    cfg = _config(tmp_path, algo, **_ssl_overrides(algo))
    proxy = pixelssl_tpu.run_script(cfg, sreg, sreg.PixelRegressionProxy)
    algo_obj = proxy.ssl_algorithm
    assert int(np.asarray(algo_obj.state['step'])) == proxy.args.iters_per_epoch
    scores = _val_scores(proxy)
    for k, v in scores.items():
        assert np.isfinite(v), '{0} not finite'.format(k)


@pytest.mark.parametrize('mode', ['bucketed', 'spatial'])
def test_sreg_val_padding_never_scores_fake_pixels(tmp_path, mode):
    """Validation padding must be masked out of regression metrics in BOTH
    val modes. im_size 36 forces real padding (bucketed pads to 64;
    --spatial-val pads H to the mesh multiple 40) — the metrics' valid-
    pixel denominator must equal exactly n_samples * 36 * 36. Regression
    test for the float-GT fill defect (spatial H-padding used to fill GT
    with 0.0, a VALID alpha, instead of ignore_index)."""
    over = dict(validation=True, im_size=36, synthetic_samples=6,
                exp_id='sreg_pad_{0}'.format(mode))
    if mode == 'spatial':
        over['spatial_val'] = True
    proxy = pixelssl_tpu.run_script(_config(tmp_path, 'ssl_null', **over),
                                    sreg, sreg.PixelRegressionProxy)
    meters = proxy.ssl_algorithm.meters
    sums_key = [k for k in meters.keys() if k.endswith('_err_sums')][0]
    n_valid = float(meters[sums_key].sum[2])
    assert n_valid == 6 * 36 * 36, n_valid


def test_sreg_spatial_train_step():
    """sreg under --spatial-train: the GSPMD 2-D (data, spatial) mesh must
    accept the regression task's float GT (UNetLite switches SyncBatchNorm
    to plain reductions, tasks/sreg/model.py)."""
    import jax as _jax

    from pixelssl_tpu import harness

    args = harness.default_args(
        'ssl_mt', task='sreg', im_size=32, base_channels=8,
        batch_size=4, unlabeled_batch_size=2, ignore_unlabeled=False,
        cons_scale=1.0, cons_rampup_epochs=1, ema_decay=0.99,
        gaussian_noise_std=0.1, lr=0.01, momentum=0.9, epochs=1,
        spatial_train=2)
    algo = harness.build_algorithm(args, mesh=None)
    assert dict(algo.ctx.mesh.shape)['spatial'] == 2
    batch = harness.synthetic_batch(args, algo.ctx.mesh)
    state, metrics = algo._train_step(algo.state, batch)
    _jax.block_until_ready(metrics)
    assert np.isfinite(float(np.asarray(metrics['s_task_loss'])))
    assert int(np.asarray(state['step'])) == 1


@pytest.mark.parametrize('algo,flags', [
    ('ssl_cct', dict(cons_scale=1.0, cons_rampup_epochs=1, ad_lr_scale=10.0,
                     vat_dec_num=1, drop_dec_num=1, cut_dec_num=1,
                     context_dec_num=1, object_dec_num=1, fd_dec_num=1,
                     fn_dec_num=1)),
    ('ssl_cutmix', dict(cons_scale=1.0, cons_rampup_epochs=1,
                        cons_threshold=0.1, ema_decay=0.99)),
])
def test_sreg_rejects_classification_only_algorithms(tmp_path, algo, flags):
    """CCT/CutMix declare CLASSIFICATION only (reference ssl_cct.py:88,
    ssl_cutmix.py:67) — pairing them with a REGRESSION task must fail
    loudly (either the task-type gate or an unimplemented task hook)."""
    cfg = _config(tmp_path, algo,
                  unlabeledset="{'synthetic_sreg': ['/tmp/u']}",
                  batch_size=2, unlabeled_batch_size=1,
                  ignore_unlabeled=False, **flags)
    with pytest.raises(SystemExit):
        pixelssl_tpu.run_script(cfg, sreg, sreg.PixelRegressionProxy)
