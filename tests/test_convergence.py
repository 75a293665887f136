"""Convergence smoke test (SURVEY.md §4: the reference ships no tests;
convergence smoke per algorithm is part of the rebuilt strategy).

Overfit one fixed batch with frozen BN (the early-training BN-statistics
transient otherwise dominates short runs) — the loss must drop
substantially, proving the full grad/optimizer/lr-mult path optimizes.
"""

import jax
import numpy as np

from pixelssl_tpu import harness, parallel


def test_suponly_overfits_fixed_batch():
    mesh = parallel.make_mesh()
    n = mesh.devices.size
    args = harness.default_args(
        'ssl_null', backbone='resnet10', im_size=32, num_classes=5,
        batch_size=2 * n, unlabeled_batch_size=0, ignore_unlabeled=True,
        lr=0.01, momentum=0.9, epochs=1, bf16=False, freeze_bn=True)
    algo = harness.build_algorithm(args, mesh=mesh, iters_per_epoch=1000)
    # labels derived from the input (not random): learnable signal, so the
    # loss must fall well below the uniform-prediction floor
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2 * n, 32, 32, 3)).astype(np.float32)
    gt = (img[..., 0] > 0).astype(np.int32) + 2 * (img[..., 1] > 0).astype(np.int32)
    batch = parallel.shard_batch({'inp': (img,), 'gt': (gt,)}, mesh)
    state = algo.state
    losses = []
    for _ in range(60):
        state, m = algo._train_step(state, batch)
        losses.append(m['task_loss'])
    losses = [float(np.asarray(x)) for x in jax.device_get(losses)]
    assert all(np.isfinite(losses))
    assert min(losses[-10:]) < losses[0] * 0.8, (
        'no convergence: first={0:.3f} last10min={1:.3f}'.format(
            losses[0], min(losses[-10:])))


def test_mean_teacher_overfits_and_teacher_tracks():
    mesh = parallel.make_mesh()
    n = mesh.devices.size
    args = harness.default_args(
        'ssl_mt', backbone='resnet10', im_size=32, num_classes=5,
        batch_size=2 * n, unlabeled_batch_size=1 * n, ignore_unlabeled=False,
        cons_scale=0.1, cons_rampup_epochs=1, ema_decay=0.9,
        lr=0.01, momentum=0.9, epochs=1, bf16=False, freeze_bn=True)
    algo = harness.build_algorithm(args, mesh=mesh, iters_per_epoch=1000)
    rng = np.random.default_rng(1)
    b = 3 * n
    img = rng.standard_normal((b, 32, 32, 3)).astype(np.float32)
    gt = (img[..., 0] > 0).astype(np.int32) + 2 * (img[..., 1] > 0).astype(np.int32)
    gt[2 * n:] = -1  # unlabeled tail (labeled-first per-device layout built below)
    img2 = parallel.reorder_two_stream(img, 2 * n, n, n) if n > 1 else img
    gt2 = parallel.reorder_two_stream(gt, 2 * n, n, n) if n > 1 else gt
    batch = parallel.shard_batch({'inp': (img2,), 'gt': (gt2,)}, mesh)

    state = algo.state
    s_losses, t_losses = [], []
    for _ in range(60):
        state, m = algo._train_step(state, batch)
        s_losses.append(m['s_task_loss'])
        t_losses.append(m['t_task_loss'])
    s_losses = [float(np.asarray(x)) for x in jax.device_get(s_losses)]
    t_losses = [float(np.asarray(x)) for x in jax.device_get(t_losses)]
    assert min(s_losses[-10:]) < s_losses[0] * 0.8
    # the EMA teacher must follow the student down
    assert min(t_losses[-10:]) < t_losses[0] * 0.9
