"""Mesh-size invariance: the same GLOBAL batch must produce the same
training math on meshes of different sizes.

This is the core guarantee of the data-parallel design (SURVEY.md §2.5
TPU-native equivalents): per-device losses/gradients/BN statistics are
psum-combined into global quantities, so results depend only on the global
batch — not on how many chips it is sharded across. The reference could
never test this (DataParallel required physical GPUs)."""

import jax
import jax.numpy as jnp
import numpy as np

from pixelssl_tpu import harness, parallel


def _train_two_steps(n_dev, global_img, global_gt, lbs, ubs):
    mesh = parallel.make_mesh(n_dev)
    args = harness.default_args(
        'ssl_mt', backbone='resnet10', im_size=32, num_classes=5,
        batch_size=lbs + ubs, unlabeled_batch_size=ubs,
        ignore_unlabeled=False, cons_scale=1.0, cons_rampup_epochs=1,
        ema_decay=0.99, lr=1e-4, momentum=0.9, epochs=1, bf16=False)
    algo = harness.build_algorithm(args, mesh=mesh)

    img, gt = global_img, global_gt
    if n_dev > 1:
        img = parallel.reorder_two_stream(img, lbs, ubs, n_dev)
        gt = parallel.reorder_two_stream(gt, lbs, ubs, n_dev)
    batch = parallel.shard_batch({'inp': (img,), 'gt': (gt,)}, mesh)

    state = algo.state
    state, m1 = algo._train_step(state, batch)
    state, m2 = algo._train_step(state, batch)
    return (jax.device_get(state['model']['params']),
            float(np.asarray(m2['s_task_loss'])))


def test_mesh_size_invariance():
    lbs, ubs = 8, 8
    rng = np.random.default_rng(0)
    img = rng.standard_normal((lbs + ubs, 32, 32, 3)).astype(np.float32)
    gt = rng.integers(0, 5, (lbs + ubs, 32, 32)).astype(np.int32)
    gt[lbs:] = -1

    p8, l8 = _train_two_steps(8, img, gt, lbs, ubs)
    p2, l2 = _train_two_steps(2, img, gt, lbs, ubs)

    assert l8 == np.float32(l2) or abs(l8 - l2) < 1e-4 * max(1.0, abs(l8))
    for a, b in zip(jax.tree.leaves(p8), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
