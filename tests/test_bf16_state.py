"""--bf16-ema / --bf16-opt-state: bf16 storage for EMA teacher and
optimizer state (HBM-bandwidth savers, BASELINE.md profiling notes).
Update math stays fp32; flags default off for exact torch-parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelssl_tpu import harness, parallel


@pytest.mark.parametrize('algo_name', ['ssl_mt', 'ssl_cutmix'])
def test_bf16_ema_and_opt_state(algo_name):
    mesh = parallel.make_mesh()
    n = mesh.devices.size
    extra = dict(cons_scale=1.0, cons_rampup_epochs=1, ema_decay=0.99,
                 bf16_ema=True, bf16_opt_state=True)
    if algo_name == 'ssl_cutmix':
        extra['cons_threshold'] = 0.9
    bs = 4 if algo_name == 'ssl_cutmix' else 2
    ubs = 2 if algo_name == 'ssl_cutmix' else 1
    args = harness.default_args(
        algo_name, backbone='resnet10', im_size=32, num_classes=5,
        batch_size=bs * n, unlabeled_batch_size=ubs * n,
        ignore_unlabeled=False, lr=0.01, momentum=0.9, epochs=1, **extra)
    algo = harness.build_algorithm(args, mesh=mesh)

    # teacher stored bf16; momentum trace stored bf16
    assert jax.tree.leaves(
        algo.state['teacher']['params'])[0].dtype == jnp.bfloat16
    assert any(hasattr(x, 'dtype') and x.dtype == jnp.bfloat16
               for x in jax.tree.leaves(algo.state['opt']))

    before = [np.asarray(x, np.float32) for x in
              jax.device_get(jax.tree.leaves(algo.state['teacher']['params']))]
    batch = harness.synthetic_batch(args, mesh)
    state, metrics = algo._train_step(algo.state, batch)
    jax.block_until_ready(metrics)
    for k, v in metrics.items():
        if 'loss' in k:
            assert np.isfinite(float(np.asarray(v))), (algo_name, k)

    # EMA still moves the bf16 teacher (fp32 math inside ema_update)
    after = [np.asarray(x, np.float32) for x in
             jax.device_get(jax.tree.leaves(state['teacher']['params']))]
    assert any(float(np.abs(a - b).max()) > 0 for a, b in zip(before, after))
    # dtype is preserved across the update
    assert jax.tree.leaves(
        state['teacher']['params'])[0].dtype == jnp.bfloat16


def test_default_state_stays_fp32():
    mesh = parallel.make_mesh()
    n = mesh.devices.size
    args = harness.default_args(
        'ssl_mt', backbone='resnet10', im_size=32, num_classes=5,
        batch_size=2 * n, unlabeled_batch_size=1 * n, ignore_unlabeled=False,
        lr=0.01, momentum=0.9, epochs=1,
        cons_scale=1.0, cons_rampup_epochs=1, ema_decay=0.99)
    algo = harness.build_algorithm(args, mesh=mesh)
    assert jax.tree.leaves(
        algo.state['teacher']['params'])[0].dtype == jnp.float32
    assert not any(hasattr(x, 'dtype') and x.dtype == jnp.bfloat16
                   for x in jax.tree.leaves(algo.state['opt']))
