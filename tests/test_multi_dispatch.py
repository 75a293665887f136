"""--steps-per-dispatch: the lax.scan multi-step train path must be
numerically equivalent to the single-step loop (same batches, same
updates), including the leftover single-step tail when the epoch length
is not a multiple of the dispatch size. (TPU build addition: multi-step
dispatches amortize host/tunnel round-trips — docs/performance.md;
the reference dispatches per iteration.)"""

import collections

import numpy as np

import jax
import pixelssl_tpu
from pixelssl_tpu.tasks import sseg


def _config(tmp_path, exp_id, **overrides):
    cfg = collections.OrderedDict([
        ('exp_id', exp_id),
        ('out_path', str(tmp_path)),
        ('ssl_algorithm', 'ssl_null'),
        ('trainset', "{'synthetic_sseg': ['/tmp']}"),
        ('valset', "{'synthetic_sseg': ['/tmp']}"),
        ('num_workers', 0),
        ('im_size', 32),
        ('synthetic_samples', 48),   # 3 iters of global batch 16
        ('epochs', 1),
        ('batch_size', 2),           # per device
        ('unlabeled_batch_size', 0),
        ('models', "{'model': 'deeplabv2'}"),
        ('optimizers', "{'model': 'sgd'}"),
        ('lrers', "{'model': 'polynomiallr'}"),
        ('criterions', "{'model': 'sseg_criterion'}"),
        # small lr: with the mesh-scaled default the synthetic run goes
        # chaotic (loss ~1e3) and the two programs' 1-ULP reassociation
        # noise amplifies to O(0.1) param drift within 3 steps; a
        # well-conditioned run keeps legit noise ~1e-6 so real dispatch
        # bugs (wrong batch order, duplicated step) remain detectable
        ('lr', 1e-5),
        ('momentum', 0.9),
        ('backbone', 'resnet50'),
        ('num_classes', 4),
        ('log_freq', 1),
        ('val_freq', 100),
        ('checkpoint_freq', 100),
        ('seed', 7),
        # fp32: the scan and the single-step program compile to different
        # fusions, so bf16 reassociation noise (~1e-4/step) is amplified
        # by training into O(1e-2) param drift within a few steps —
        # measured as pure float noise (1 ULP/step in fp32); fp32 keeps
        # the equivalence check tight
        ('bf16', False),
    ])
    cfg.update(overrides)
    return cfg


def test_multi_dispatch_matches_single_step(tmp_path):
    p1 = pixelssl_tpu.run_script(
        _config(tmp_path, 'test_spd1'), sseg, sseg.SemanticSegmentationProxy)
    # 3 iters with a 2-step dispatch: one scan dispatch + 1 leftover
    p2 = pixelssl_tpu.run_script(
        _config(tmp_path, 'test_spd2', steps_per_dispatch=2),
        sseg, sseg.SemanticSegmentationProxy)

    s1, s2 = p1.ssl_algorithm.state, p2.ssl_algorithm.state
    assert p1.args.iters_per_epoch == 3
    assert int(np.asarray(s1['step'])) == int(np.asarray(s2['step'])) == 3

    leaves1 = jax.tree.leaves(s1['model']['params'])
    leaves2 = jax.tree.leaves(s2['model']['params'])
    # the scan and single-step programs compile to different fusions, so
    # fp32 reassociation noise is amplified through the training-mode BN
    # feedback; measured max drift across data draws is ~2e-4 on a few
    # high-gradient early-conv elements. A logic bug (wrong batch order,
    # skipped/duplicated step, stale rng) shows up as O(1e-1) drift, so
    # 5e-4 keeps 200x headroom while tolerating the float noise.
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)


def test_eager_ingest_is_bitwise_identical(tmp_path):
    """--eager-ingest only moves WHEN the transfer happens (a consuming
    reduction in the loader thread, parallel.touch_tree); the train
    program and its inputs are unchanged, so the run must be bit-identical
    — in both the chunked and single-step dispatch paths."""
    p1 = pixelssl_tpu.run_script(
        _config(tmp_path, 'test_eager0', steps_per_dispatch=2),
        sseg, sseg.SemanticSegmentationProxy)
    p2 = pixelssl_tpu.run_script(
        _config(tmp_path, 'test_eager1', steps_per_dispatch=2,
                eager_ingest=True),
        sseg, sseg.SemanticSegmentationProxy)
    p3 = pixelssl_tpu.run_script(
        _config(tmp_path, 'test_eager2', eager_ingest=True),
        sseg, sseg.SemanticSegmentationProxy)

    s1 = p1.ssl_algorithm.state
    for p in (p2, p3):
        s = p.ssl_algorithm.state
        assert int(np.asarray(s['step'])) == int(np.asarray(s1['step'])) == 3
    for a, b in zip(jax.tree.leaves(s1['model']['params']),
                    jax.tree.leaves(p2.ssl_algorithm.state['model']['params'])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_dispatch_two_stream_matches_single_step(tmp_path):
    """Two-stream (ssl_mt) equivalence: exercises the chunked loader's
    reorder_two_stream_steps + shard_step_chunk path (parallel/mesh.py)
    against the single-step loop's per-batch reorder_two_stream — a wrong
    axis-1 reorder would feed devices the wrong labeled/unlabeled blocks
    and drift immediately."""
    def cfg(exp_id, **overrides):
        return _config(
            tmp_path, exp_id,
            ssl_algorithm='ssl_mt',
            unlabeledset="{'synthetic_sseg': ['/tmp/u']}",
            ignore_unlabeled=False,
            synthetic_samples=24,        # global labeled batch 8 -> 3 iters
            batch_size=2,                # per device
            unlabeled_batch_size=1,      # per device
            backbone='resnet10',
            cons_scale=1.0,
            cons_rampup_epochs=1,
            ema_decay=0.99,
            **overrides)

    p1 = pixelssl_tpu.run_script(
        cfg('test_ts_spd1'), sseg, sseg.SemanticSegmentationProxy)
    # 3 iters with a 2-step dispatch: one chunk dispatch + 1 leftover
    p2 = pixelssl_tpu.run_script(
        cfg('test_ts_spd2', steps_per_dispatch=2),
        sseg, sseg.SemanticSegmentationProxy)

    s1, s2 = p1.ssl_algorithm.state, p2.ssl_algorithm.state
    assert p1.args.iters_per_epoch == 3
    assert int(np.asarray(s1['step'])) == int(np.asarray(s2['step'])) == 3
    # the chunked loader actually ran in chunk mode
    assert p2.train_loader.chunk_steps == 2
    assert p2.train_loader.chunk_put_fn is not None

    for key in ('model', 'teacher'):
        leaves1 = jax.tree.leaves(s1[key]['params'])
        leaves2 = jax.tree.leaves(s2[key]['params'])
        for a, b in zip(leaves1, leaves2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=5e-4)


def test_multi_dispatch_spatial_matches_single_step(tmp_path):
    """--spatial-train + --steps-per-dispatch: the chunked loader's
    shard_train_chunk placement (scan axis replicated, batch on 'data',
    H on 'spatial'; parallel/spatial.py) must be BIT-IDENTICAL to the
    legacy per-step-put + on-device-jnp.stack path — same scan program,
    same data, so any drift is a placement/reorder bug. Against the
    single-step program only a loose bound holds: under GSPMD the scanned
    and unscanned programs partition differently and BN's backward
    cancellation amplifies fp32 reduction-order noise to ~5e-3 over 3
    steps (measured; cf. module docstring of test_spatial_train.py) —
    still 20x below the O(1e-1) drift a wrong batch order produces."""
    def cfg(exp_id, **overrides):
        return _config(
            tmp_path, exp_id,
            backbone='resnet10',
            spatial_train=2,
            batch_size=2,                # per data-axis device (x4)
            synthetic_samples=24,        # global batch 8 -> 3 iters
            **overrides)

    p2 = pixelssl_tpu.run_script(
        cfg('test_sp_spd2', steps_per_dispatch=2),
        sseg, sseg.SemanticSegmentationProxy)
    assert p2.train_loader.chunk_steps == 2
    assert p2.train_loader.chunk_put_fn is not None

    # legacy fallback path: per-step puts, stacked on device in the loop
    base = None
    for k in sseg.SemanticSegmentationProxy.__mro__:
        if '_make_train_chunk_put_fn' in vars(k):
            base = k
            break
    orig = base._make_train_chunk_put_fn
    base._make_train_chunk_put_fn = lambda self, lbs, ubs, n_dev: None
    try:
        p_fall = pixelssl_tpu.run_script(
            cfg('test_sp_fall', steps_per_dispatch=2),
            sseg, sseg.SemanticSegmentationProxy)
    finally:
        base._make_train_chunk_put_fn = orig
    assert p_fall.train_loader.chunk_steps == 1

    s2, sf = p2.ssl_algorithm.state, p_fall.ssl_algorithm.state
    assert int(np.asarray(s2['step'])) == int(np.asarray(sf['step'])) == 3
    for a, b in zip(jax.tree.leaves(s2['model']['params']),
                    jax.tree.leaves(sf['model']['params'])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # loose sanity vs the single-step program (GSPMD scan noise, above)
    p1 = pixelssl_tpu.run_script(
        cfg('test_sp_spd1'), sseg, sseg.SemanticSegmentationProxy)
    s1 = p1.ssl_algorithm.state
    assert p1.args.iters_per_epoch == 3
    assert int(np.asarray(s1['step'])) == 3
    for a, b in zip(jax.tree.leaves(s1['model']['params']),
                    jax.tree.leaves(s2['model']['params'])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.2, atol=2e-2)
