"""bf16 compute path on the CPU mesh: the default --bf16 dtype
(tasks/sseg/model.py:132) runs a full Mean-Teacher train step and an eval
forward without NaN/Inf and with fp32 master params/BN stats intact.
On TPU this path is what every benchmark row runs; this test pins it in CI.
"""

import numpy as np

import jax
import jax.numpy as jnp

from pixelssl_tpu import harness, parallel


def test_bf16_train_step_and_eval():
    mesh = parallel.make_mesh()
    n = mesh.devices.size
    args = harness.default_args(
        'ssl_mt', backbone='resnet10', im_size=32, num_classes=5,
        batch_size=2 * n, unlabeled_batch_size=1 * n, ignore_unlabeled=False,
        cons_scale=1.0, cons_rampup_epochs=1, ema_decay=0.99,
        lr=0.01, momentum=0.9, epochs=1, bf16=True)
    algo = harness.build_algorithm(args, mesh=mesh)
    batch = harness.synthetic_batch(args, mesh)

    # master params and BN running stats stay fp32 even in bf16 mode
    for leaf in jax.tree.leaves(algo.state['model']['params']):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(algo.state['model']['batch_stats']):
        assert leaf.dtype == jnp.float32

    state0 = jax.device_get(algo.state)
    state, metrics = algo._train_step(algo.state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(np.asarray(v))), 'non-finite metric ' + k
    assert int(np.asarray(state['step'])) == 1

    # params actually moved (bf16 forward produced usable fp32 grads)
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state0['model']['params']),
                        jax.tree.leaves(jax.device_get(state)['model']['params'])))
    assert moved, 'parameters did not change after a bf16 step'

    # eval path (running-stats BN branch) also finite in bf16
    preds = algo._eval_step(state, batch)
    for model_id, (pred, loss_vec) in preds.items():
        assert np.isfinite(np.asarray(pred, np.float32)).all()
        assert np.isfinite(np.asarray(loss_vec, np.float32)).all()
