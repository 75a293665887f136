"""Harness-level algorithm step tests (no proxy/datasets): each SSL
algorithm's fused train step runs on the 8-device mesh with tiny shapes
and produces finite losses + updated state."""

import numpy as np
import pytest

import jax

from pixelssl_tpu import harness, parallel


def _run_steps(algo_name, n_steps=2, positive=(), **flags):
    mesh = parallel.make_mesh()
    n = mesh.devices.size
    base = dict(backbone='resnet10', im_size=32, num_classes=5,
                batch_size=2 * n, unlabeled_batch_size=1 * n,
                ignore_unlabeled=False, lr=0.01, momentum=0.9, epochs=1)
    base.update(flags)
    args = harness.default_args(algo_name, **base)
    algo = harness.build_algorithm(args, mesh=mesh)
    batch = harness.synthetic_batch(args, mesh)
    state = algo.state
    for _ in range(n_steps):
        state, metrics = algo._train_step(state, batch)
    metrics = jax.device_get(metrics)
    for k, v in metrics.items():
        assert np.isfinite(float(np.asarray(v))), 'metric {0} not finite'.format(k)
    # strictly-positive where the SSL math guarantees it at init — a
    # silently-zeroed consistency/adversarial/rotation loss must FAIL
    # (round-2 verdict item #3)
    for k in positive:
        v = float(np.asarray(metrics[k]))
        assert v > 0.0, 'metric {0} must be > 0 at init, got {1!r}'.format(k, v)
    assert int(np.asarray(state['step'])) == n_steps
    return algo, state, metrics


def test_ssl_null_step():
    _run_steps('ssl_null', unlabeled_batch_size=0, ignore_unlabeled=True)


def test_ssl_mt_step():
    algo, state, metrics = _run_steps(
        'ssl_mt', cons_scale=1.0, cons_rampup_epochs=1,
        ema_decay=0.99, gaussian_noise_std=0.1,
        positive=('s_task_loss', 't_task_loss', 'cons_loss'))


def test_ssl_cutmix_step():
    mesh = parallel.make_mesh()
    n = mesh.devices.size
    algo, state, metrics = _run_steps(
        'ssl_cutmix', batch_size=4 * n, unlabeled_batch_size=2 * n,
        cons_scale=1.0, cons_rampup_epochs=1, cons_threshold=0.1,
        ema_decay=0.99,
        positive=('task_loss', 'cons_loss'))
    # teacher params differ from student after EMA warm steps
    s = jax.tree.leaves(state['model']['params'])[0]
    t = jax.tree.leaves(state['teacher']['params'])[0]
    assert not np.allclose(np.asarray(s), np.asarray(t))


def test_box_masks_properties():
    from pixelssl_tpu.ops.boxmask import box_masks
    rng = jax.random.PRNGKey(0)
    m = np.asarray(box_masks(rng, 16, (64, 64), (0.5, 0.5)))
    assert m.shape == (16, 64, 64, 1)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    # area proportion ≈ 0.5 (rounding slack)
    areas = m.mean(axis=(1, 2, 3))
    assert np.all(areas > 0.3) and np.all(areas < 0.7)


def test_dryrun_multichip_entry():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        'graft_entry', os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), '__graft_entry__.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_ssl_adv_step():
    _run_steps('ssl_adv', adv_for_labeled=True, labeled_adv_scale=0.01,
               unlabeled_adv_scale=0.001, unlabeled_for_discriminator=True,
               positive=('task_loss', 'labeled_adv_loss',
                         'unlabeled_adv_loss', 'fake_d_loss', 'real_d_loss'))


def test_ssl_s4l_step():
    algo, state, metrics = _run_steps(
        'ssl_s4l', rotated_sup_scale=0.5, rotation_scale=1.0,
        positive=('unrotated_task_loss', 'rotated_task_loss',
                  'rotation_loss'))
    assert 0.0 <= metrics['rotation_acc'] <= 100.0


def test_s4l_rotation_matches_reference_recipe():
    """rotate_batch must reproduce torch transpose/flip recipes
    (reference ssl_s4l.py:352-360)."""
    torch = pytest.importorskip('torch')
    from pixelssl_tpu.ssl_algorithm.ssl_s4l import rotate_batch
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 6, 6, 2)).astype(np.float32)  # NHWC
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW

    def torch_rot(t, angle_idx):
        if angle_idx == 1:
            return t.transpose(1, 2).flip(2)
        if angle_idx == 2:
            return t.flip(2).flip(1)
        if angle_idx == 3:
            return t.transpose(1, 2).flip(1)
        return t

    import jax.numpy as jnp
    for angle in range(4):
        ours = np.asarray(rotate_batch(jnp.asarray(x),
                                       jnp.full((3,), angle, jnp.int32)))
        theirs = np.stack([torch_rot(xt[i], angle).numpy() for i in range(3)])
        theirs = np.transpose(theirs, (0, 2, 3, 1))
        np.testing.assert_allclose(ours, theirs, atol=0,
                                   err_msg='angle={0}'.format(angle))


def test_ssl_gct_step():
    algo, state, metrics = _run_steps(
        'ssl_gct', im_size=64, ssl_mode='gct', fc_ssl_scale=1.0,
        dc_ssl_scale=1.0, dc_threshold=0.4, dc_rampup_epochs=1,
        mu=0.5, nu=1, fd_scale=1.0,
        positive=('l_task_loss', 'r_task_loss', 'l_fd_loss', 'r_fd_loss'))


def test_ssl_cct_step():
    algo, state, metrics = _run_steps(
        'ssl_cct', im_size=64, cons_scale=1.0, cons_rampup_epochs=1,
        ad_lr_scale=10.0, vat_dec_num=1, drop_dec_num=1, cut_dec_num=1,
        context_dec_num=1, object_dec_num=1, fd_dec_num=1, fn_dec_num=1,
        positive=('task_loss', 'cons_loss'))


def test_multi_step_dispatch_matches_single_step():
    """n steps via the fused lax.scan dispatch must equal n single-step
    dispatches (same RNG schedule, same BN chaining)."""
    import jax.numpy as jnp
    from pixelssl_tpu import parallel

    mesh = parallel.make_mesh()
    n = mesh.devices.size
    # fp32 + small lr: keeps losses tame so fp-reassociation between the
    # scanned and straight-line compiles stays below the tolerance
    args = harness.default_args(
        'ssl_mt', backbone='resnet10', im_size=32, num_classes=5,
        batch_size=2 * n, unlabeled_batch_size=1 * n, ignore_unlabeled=False,
        cons_scale=1.0, cons_rampup_epochs=1, ema_decay=0.99,
        lr=1e-4, momentum=0.9, epochs=1, bf16=False)
    algo = harness.build_algorithm(args, mesh=mesh)
    b0 = harness.synthetic_batch(args, mesh, seed=0)
    b1 = harness.synthetic_batch(args, mesh, seed=1)

    # path A: two single-step dispatches
    sA = algo.state
    sA, _ = algo._train_step(sA, b0)
    sA, mA = algo._train_step(sA, b1)

    # path B: one fused dispatch over both batches
    algo2 = harness.build_algorithm(args, mesh=mesh)
    multi = parallel.parallel_multi_step(algo2._step_fn, mesh, 2)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), b0, b1)
    sB, mB = multi(algo2.state, stacked)

    pa = jax.tree.leaves(sA['model']['params'])
    pb = jax.tree.leaves(sB['model']['params'])
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    assert float(np.asarray(mA['s_task_loss'])) == pytest.approx(
        float(np.asarray(mB['s_task_loss'])), rel=1e-4)
    assert int(np.asarray(sB['step'])) == 2


def test_ssl_gct_fc_and_dc_modes():
    """ssl-mode fc / dc variants (reference ssl_gct.py:39 choices)."""
    for mode in ('fc', 'dc'):
        algo, state, metrics = _run_steps(
            'ssl_gct', n_steps=1, im_size=64, ssl_mode=mode,
            fc_ssl_scale=1.0, dc_ssl_scale=1.0, dc_threshold=0.4,
            dc_rampup_epochs=1, mu=0.5, nu=1, fd_scale=1.0)
        if mode == 'fc':
            assert float(np.asarray(metrics['l_dc_loss'])) == 0.0
            assert float(np.asarray(metrics['l_fc_loss'])) != 0.0
        else:
            assert float(np.asarray(metrics['l_fc_loss'])) == 0.0


def test_ssl_gct_two_model_dict():
    """2-key component dicts: different architectures for l/r models
    (reference ssl_gct.py:69-77)."""
    mesh = parallel.make_mesh()
    n = mesh.devices.size
    args = harness.default_args(
        'ssl_gct', backbone='resnet10', im_size=64, num_classes=5,
        batch_size=2 * n, unlabeled_batch_size=1 * n, ignore_unlabeled=False,
        ssl_mode='gct', fc_ssl_scale=1.0, dc_ssl_scale=1.0, dc_threshold=0.4,
        dc_rampup_epochs=1, mu=0.5, nu=1, fd_scale=1.0,
        lr=0.001, momentum=0.9, epochs=1, output_stride=8)
    args.models = {'lmodel': 'deeplabv2', 'rmodel': 'pspnet'}
    args.optimizers = {'lmodel': 'sgd', 'rmodel': 'sgd'}
    args.lrers = {'lmodel': 'polynomiallr', 'rmodel': 'polynomiallr'}
    args.criterions = {'lmodel': 'sseg_criterion', 'rmodel': 'sseg_criterion'}
    algo = harness.build_algorithm(args, mesh=mesh)
    batch = harness.synthetic_batch(args, mesh)
    state, metrics = algo._train_step(algo.state, batch)
    for k in ('l_task_loss', 'r_task_loss', 'l_fd_loss', 'r_fd_loss'):
        assert np.isfinite(float(np.asarray(metrics[k])))


# ---------------------------------------------------------------------------
# SSL term efficacy: for every algorithm, one train step with the SSL
# scales ON must move the task-model parameters differently than the same
# step with the scales zeroed — i.e. the SSL gradient actually reaches the
# weights (round-2 verdict item #3: a regression that silently detaches or
# zeroes an SSL term must fail, not just keep losses finite).
# ---------------------------------------------------------------------------

_SSL_AB = [
    # (algo, common flags, on flags, off flags, task-model state key)
    ('ssl_mt',
     dict(cons_rampup_epochs=0, ema_decay=0.99, gaussian_noise_std=0.1),
     dict(cons_scale=1.0), dict(cons_scale=0.0), 'model'),
    ('ssl_adv',
     dict(adv_for_labeled=True, unlabeled_for_discriminator=True),
     dict(labeled_adv_scale=0.05, unlabeled_adv_scale=0.05),
     dict(labeled_adv_scale=0.0, unlabeled_adv_scale=0.0), 'model'),
    ('ssl_s4l',
     dict(),
     dict(rotated_sup_scale=0.5, rotation_scale=1.0),
     dict(rotated_sup_scale=0.0, rotation_scale=0.0), 'model'),
    ('ssl_cutmix',
     dict(cons_rampup_epochs=0, cons_threshold=0.05, ema_decay=0.99),
     dict(cons_scale=1.0), dict(cons_scale=0.0), 'model'),
    # im 96: below that the flaw detector collapses to a 1x1 pre-upsample
    # map and the fc/dc constraints are structurally zero (see
    # test_gct_torch_parity.py header)
    ('ssl_gct',
     dict(im_size=96, ssl_mode='gct', dc_threshold=0.5, dc_rampup_epochs=0,
          mu=0.5, nu=1, fd_scale=1.0),
     dict(fc_ssl_scale=1.0, dc_ssl_scale=1.0),
     dict(fc_ssl_scale=0.0, dc_ssl_scale=0.0), 'l_model'),
    ('ssl_cct',
     dict(im_size=64, cons_rampup_epochs=0, ad_lr_scale=10.0,
          drop_dec_num=1, fn_dec_num=1),
     dict(cons_scale=1.0), dict(cons_scale=0.0), 'model'),
]


def _one_step_params(algo_name, key, **flags):
    base = dict(backbone='resnet10', im_size=32, num_classes=5,
                batch_size=4, unlabeled_batch_size=2,
                ignore_unlabeled=False, lr=0.01, momentum=0.9, epochs=1,
                seed=0)
    base.update(flags)
    args = harness.default_args(algo_name, **base)
    mesh = parallel.make_mesh(1)  # efficacy, not sharding — keep it cheap
    algo = harness.build_algorithm(args, mesh=mesh)
    batch = harness.synthetic_batch(args, mesh, seed=0)
    state, _ = algo._train_step(algo.state, batch)
    return np.asarray(jax.tree.leaves(
        jax.device_get(state[key]['params']))[0])


@pytest.mark.parametrize(
    'algo_name,common,on,off,key', _SSL_AB,
    ids=[row[0] for row in _SSL_AB])
def test_ssl_term_moves_task_params(algo_name, common, on, off, key):
    p_on = _one_step_params(algo_name, key, **dict(common, **on))
    p_off = _one_step_params(algo_name, key, **dict(common, **off))
    assert not np.allclose(p_on, p_off), (
        '%s: zeroing the SSL scales did not change the task-model update '
        '-> the SSL gradient never reached the weights' % algo_name)
