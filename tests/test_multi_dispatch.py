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
