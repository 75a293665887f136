"""--spatial-train: GSPMD 2-D ('data','spatial') mesh training.

The reference has no spatial-parallel analog (each GPU always sees whole
images); this is the TPU-native scaling axis for resolutions whose
activations exceed one chip's HBM (parallel/spatial.py).

Correctness evidence is two-layered because BN's backward is a massive
cancellation (sums of ~1e4-scale terms yielding ~1e-1-scale gradients), so
fp32 reduction-order noise differs visibly between sharding layouts:

* float64 micro-equivalence: the partitioned conv+BN backward under
  H-sharding matches the replicated one to ~1e-11 — the partitioner's
  MATH is exact (measured fp32 deltas are rounding, not bugs);
* fp32 end-to-end: a multi-step fixed-batch run tracks the shard_map
  data-parallel loss trajectory to within noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelssl_tpu import harness, parallel


def test_partitioner_backward_exact_in_f64():
    """H-sharded grad of sum(square(normalize(conv(x)))) == replicated grad
    at f64 precision: the GSPMD backward (conv halos + sharded-axis
    reductions) is mathematically exact."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = parallel.make_mesh_2d(2)
    shd = NamedSharding(mesh, P('data', 'spatial', None, None))
    rep = NamedSharding(mesh, P())

    rng = np.random.default_rng(0)
    jax.config.update('jax_enable_x64', True)
    try:
        x = jnp.asarray(rng.standard_normal((8, 32, 32, 8)))
        k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1)

        def f(k, x):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            mean = jnp.mean(y, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(y), axis=(0, 1, 2)) - jnp.square(mean)
            out = (y - mean) * jax.lax.rsqrt(var + 1e-5)
            return jnp.sum(jnp.square(out))

        g_rep = jax.jit(jax.grad(f))(k, jax.device_put(x, rep))
        g_shd = jax.jit(jax.grad(f))(k, jax.device_put(x, shd))
        np.testing.assert_allclose(np.asarray(g_rep), np.asarray(g_shd),
                                   rtol=1e-9, atol=1e-9)
    finally:
        jax.config.update('jax_enable_x64', False)


def _build(algo_name, spatial, **over):
    base = dict(backbone='resnet10', im_size=32, num_classes=5,
                batch_size=8, unlabeled_batch_size=0, ignore_unlabeled=True,
                lr=1e-3, momentum=0.9, weight_decay=0.0005, epochs=1,
                bf16=False, seed=0)
    base.update(over)
    if spatial:
        base['spatial_train'] = spatial
    args = harness.default_args(algo_name, **base)
    mesh = (parallel.make_mesh_2d(spatial) if spatial
            else parallel.make_mesh())
    algo = harness.build_algorithm(args, mesh=mesh)
    return args, mesh, algo


def test_suponly_gspmd_tracks_data_parallel():
    """ssl_null fixed-batch overfit: the GSPMD (2 data × 4 spatial) loss
    trajectory matches 8-way DP shard_map step for step. First-step loss
    is bit-comparable (identical forward); later steps agree to within
    the BN-backward fp32 noise documented above."""
    n_steps = 12
    args_dp, mesh_dp, algo_dp = _build('ssl_null', spatial=0)
    args_sp, mesh_sp, algo_sp = _build('ssl_null', spatial=4)

    # identical init (same seed → same param tree)
    p_dp = jax.tree.leaves(algo_dp.state['model']['params'])
    p_sp = jax.tree.leaves(algo_sp.state['model']['params'])
    for a, b in zip(p_dp, p_sp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    batch_dp = harness.synthetic_batch(args_dp, mesh_dp, seed=3)
    batch_sp = harness.synthetic_batch(args_sp, mesh_sp, seed=3)
    np.testing.assert_array_equal(np.asarray(batch_dp['inp'][0]),
                                  np.asarray(batch_sp['inp'][0]))

    s_dp, s_sp = algo_dp.state, algo_sp.state
    losses_dp, losses_sp = [], []
    for _ in range(n_steps):
        s_dp, m_dp = algo_dp._train_step(s_dp, batch_dp)
        s_sp, m_sp = algo_sp._train_step(s_sp, batch_sp)
        losses_dp.append(float(np.asarray(m_dp['task_loss'])))
        losses_sp.append(float(np.asarray(m_sp['task_loss'])))

    # same forward on the same init → first loss essentially identical
    assert abs(losses_dp[0] - losses_sp[0]) < 1e-5, (losses_dp[0], losses_sp[0])
    # Trajectories agree step for step — but the early steps are the
    # fresh-BN transient (CLAUDE.md: loss spikes ~10-30 steps on random
    # init), a chaotic regime that amplifies the layouts' differing fp32
    # rounding. Measured profile (this host, AVX2-pinned XLA:CPU): rel
    # diff ≤2.5% at every step EXCEPT a single ~17% excursion at the
    # transient trough (step 9), after which tracking returns to ~1%.
    # So: per-step bound 30% (a wrong batch order / halo bug produces
    # O(100%) immediately), PLUS a 5% bound on the median rel diff —
    # tight where it is meaningful, immune to one chaotic step. The f64
    # test above is the proof the underlying math is identical.
    rel = []
    for i, (a, b) in enumerate(zip(losses_dp, losses_sp)):
        assert np.isfinite(a) and np.isfinite(b)
        r = abs(a - b) / max(1.0, abs(a))
        rel.append(r)
        assert r < 0.30, (i, a, b)
    assert float(np.median(rel)) < 0.05, rel


def test_mt_two_stream_spatial_runs():
    """Mean Teacher (two-stream batch, EMA, noise) under (4 data × 2
    spatial): two steps execute, losses finite, params move, step counts."""
    args, mesh, algo = _build(
        'ssl_mt', spatial=2,
        batch_size=8, unlabeled_batch_size=4, ignore_unlabeled=False,
        cons_scale=1.0, cons_rampup_epochs=1, ema_decay=0.99,
        gaussian_noise_std=0.1)
    assert mesh.shape == {'data': 4, 'spatial': 2}
    batch = harness.synthetic_batch(args, mesh, seed=1)
    p0 = np.asarray(jax.tree.leaves(algo.state['model']['params'])[0]).copy()
    state, metrics = algo._train_step(algo.state, batch)
    state, metrics = algo._train_step(state, batch)
    assert int(np.asarray(state['step'])) == 2
    for k in ('s_task_loss', 'cons_loss', 't_task_loss'):
        assert np.isfinite(float(np.asarray(metrics[k]))), k
    p1 = np.asarray(jax.tree.leaves(state['model']['params'])[0])
    assert not np.allclose(p0, p1)


def test_adv_spatial_train_runs():
    """AdvSSL's multi-optimizer GAN step under the 2-D (4 data × 2
    spatial) mesh — also guards the discriminator-lr × data-axis scaling
    (ctx.n_dev must be the data axis, not the raw device count).  This
    case used to run inside the driver's dryrun_multichip gate; it lives
    here so the gate fits a cold-compile budget (round-2 verdict #1)."""
    args, mesh, algo = _build(
        'ssl_adv', spatial=2,
        batch_size=8, unlabeled_batch_size=4, ignore_unlabeled=False,
        adv_for_labeled=True, labeled_adv_scale=0.01,
        unlabeled_adv_scale=0.001)
    assert mesh.shape == {'data': 4, 'spatial': 2}
    assert algo.ctx.n_dev == 4, algo.ctx.n_dev
    batch = harness.synthetic_batch(args, mesh, seed=3)
    state, metrics = algo._train_step(algo.state, batch)
    for k in ('task_loss', 'labeled_adv_loss', 'unlabeled_adv_loss',
              'fake_d_loss', 'real_d_loss'):
        v = float(np.asarray(metrics[k]))
        assert np.isfinite(v) and v > 0.0, (k, v)


def test_s4l_aux_head_spatial_runs():
    """S4L's in-step rotation doubling + aux BN head under GSPMD (the aux
    module must pick up ctx.axis_name=None, not the shard_map axis)."""
    args, mesh, algo = _build(
        'ssl_s4l', spatial=2,
        batch_size=8, unlabeled_batch_size=4, ignore_unlabeled=False,
        rotated_sup_scale=0.1, rotation_scale=0.1)
    batch = harness.synthetic_batch(args, mesh, seed=2)
    state, metrics = algo._train_step(algo.state, batch)
    loss_key = next(k for k in metrics if 'loss' in k)
    assert np.isfinite(float(np.asarray(metrics[loss_key])))


def test_make_mesh_2d_validates():
    with pytest.raises(ValueError):
        parallel.make_mesh_2d(3)  # 3 does not divide 8


def test_ctx_n_dev_is_data_axis_under_spatial_mesh():
    """TaskContext.n_dev drives the reference's lr x gpu-count scalings
    (AdvSSL discriminator_lr, GCT fd_lr — reference ssl_adv.py:72,
    ssl_gct.py:107). Under a ('data','spatial') mesh only the data axis
    multiplies the global batch, so n_dev must be the data-axis size, not
    the raw device count."""
    _, mesh, algo = _build('ssl_mt', 2, unlabeled_batch_size=4,
                           ignore_unlabeled=False, cons_scale=1.0,
                           cons_rampup_epochs=1, ema_decay=0.99,
                           gaussian_noise_std=0.1)
    assert mesh.devices.size == 8 and dict(mesh.shape)['spatial'] == 2
    assert algo.ctx.n_dev == 4
    _, mesh_dp, algo_dp = _build('ssl_mt', 0, unlabeled_batch_size=4,
                                 ignore_unlabeled=False, cons_scale=1.0,
                                 cons_rampup_epochs=1, ema_decay=0.99,
                                 gaussian_noise_std=0.1)
    assert algo_dp.ctx.n_dev == mesh_dp.devices.size == 8
