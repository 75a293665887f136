"""Unit tests for the nn foundation layer (rampup, splits, optimizers,
lr schedules, two-stream sampler)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelssl_tpu.nn import data as nndata
from pixelssl_tpu.nn import func as nnfunc
from pixelssl_tpu.nn import lrer as nnlrer
from pixelssl_tpu.nn import optimizer as nnopt


class Args(object):
    """Minimal argparse-like namespace with -1 sentinels."""

    def __init__(self, **kw):
        defaults = dict(lr=0.1, momentum=-1, dampening=-1, nesterov=False,
                        weight_decay=-1, alpha=-1, centered=False, eps=-1,
                        beta1=-1, beta2=-1, amsgrad=False,
                        last_epoch=-1, step_size=-1, milestones=[], gamma=-1,
                        T_max=-1, eta_min=-1, power=-1)
        defaults.update(kw)
        for k, v in defaults.items():
            setattr(self, k, v)


def test_sigmoid_rampup():
    assert nnfunc.sigmoid_rampup(0, 10) == pytest.approx(np.exp(-5.0))
    assert nnfunc.sigmoid_rampup(10, 10) == pytest.approx(1.0)
    assert nnfunc.sigmoid_rampup(20, 10) == pytest.approx(1.0)  # clipped
    assert nnfunc.sigmoid_rampup(5, 0) == 1.0
    # traced variant agrees
    j = jax.jit(lambda c: nnfunc.sigmoid_rampup(c, 10.0))(jnp.asarray(5.0))
    assert float(j) == pytest.approx(nnfunc.sigmoid_rampup(5.0, 10.0), rel=1e-6)


def test_split_tensor_tuple():
    t = (jnp.arange(12).reshape(6, 2), jnp.arange(6))
    lab = nnfunc.split_tensor_tuple(t, 0, 4)
    unl = nnfunc.split_tensor_tuple(t, 4, 6, detach=True)
    assert lab[0].shape == (4, 2) and lab[1].shape == (4,)
    assert unl[0].shape == (2, 2)
    np.testing.assert_array_equal(np.asarray(unl[1]), [4, 5])


def test_sgd_matches_manual_momentum_wd():
    """torch SGD semantics: wd added to grad before momentum buffer."""
    args = Args(lr=0.1, momentum=0.9, weight_decay=0.01)
    fac = nnopt.sgd(args)
    tx = fac.make(lambda step: 0.1)
    p = jnp.asarray([1.0, -2.0])
    g = jnp.asarray([0.5, 0.25])
    state = tx.init(p)
    upd, state = tx.update(g, state, p)
    # manual: g' = g + wd*p ; buf = g' ; update = -lr*buf
    g2 = g + 0.01 * p
    np.testing.assert_allclose(np.asarray(upd), np.asarray(-0.1 * g2), rtol=1e-6)
    # second step uses momentum
    upd2, state = tx.update(g, state, p)
    buf2 = 0.9 * g2 + g2
    np.testing.assert_allclose(np.asarray(upd2), np.asarray(-0.1 * buf2), rtol=1e-6)


def test_clip_grad_norm_bounds_update():
    """--clip-grad-norm: grads are clipped to the global L2 norm BEFORE
    the optimizer transform (TPU build addition; no reference analog)."""
    args = Args(lr=1.0, momentum=0.0, weight_decay=0.0, clip_grad_norm=1.0)
    tx = nnopt.sgd(args).make(lambda step: 1.0)
    p = jnp.asarray([0.0, 0.0])
    g = jnp.asarray([30.0, 40.0])  # ||g|| = 50 -> scaled by 1/50
    state = tx.init(p)
    upd, _ = tx.update(g, state, p)
    np.testing.assert_allclose(np.asarray(upd), [-0.6, -0.8], rtol=1e-6)

    # sentinel -1 (unset) leaves gradients untouched
    args = Args(lr=1.0, momentum=0.0, weight_decay=0.0, clip_grad_norm=-1)
    tx = nnopt.sgd(args).make(lambda step: 1.0)
    upd, _ = tx.update(g, tx.init(p), p)
    np.testing.assert_allclose(np.asarray(upd), [-30.0, -40.0], rtol=1e-6)


def test_wdadam_decoupled_decay():
    args = Args(lr=0.01, weight_decay=0.1)
    tx = nnopt.wdadam(args).make(lambda s: 0.01)
    p = jnp.asarray([2.0])
    g = jnp.asarray([0.0])  # zero grad isolates the decay term
    state = tx.init(p)
    upd, _ = tx.update(g, state, p)
    # adam update of zero grad is 0 → only decay: -lr * wd * p
    np.testing.assert_allclose(np.asarray(upd), [-0.01 * 0.1 * 2.0], atol=1e-8)


def test_lr_mult_tree_applied():
    args = Args(lr=1.0)
    fac = nnopt.sgd(args)
    mult = {'a': jnp.asarray(1.0), 'b': jnp.asarray(10.0)}
    tx = fac.make(lambda s: 1.0, lr_mult=mult)
    p = {'a': jnp.asarray([1.0]), 'b': jnp.asarray([1.0])}
    g = {'a': jnp.asarray([1.0]), 'b': jnp.asarray([1.0])}
    upd, _ = tx.update(g, tx.init(p), p)
    assert float(upd['b'][0]) == pytest.approx(10 * float(upd['a'][0]))


def test_polynomial_lr():
    args = Args(power=0.9)
    fac = nnlrer.polynomiallr(args)
    assert not fac.is_epoch_lrer
    sched = fac.make(base_lr=1.0, iters_per_epoch=10, total_epochs=10)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(50)) == pytest.approx(0.5 ** 0.9, rel=1e-5)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-6)


def test_epoch_lrers_quantize_to_epochs():
    args = Args(step_size=2, gamma=0.1)
    sched = nnlrer.steplr(args).make(1.0, iters_per_epoch=5, total_epochs=10)
    # within epoch 0-1 → lr 1.0; epochs 2-3 → 0.1
    assert float(sched(9)) == pytest.approx(1.0)
    assert float(sched(10)) == pytest.approx(0.1)
    args = Args(milestones=[2, 4], gamma=0.5)
    sched = nnlrer.multisteplr(args).make(1.0, 5, 10)
    assert float(sched(5)) == pytest.approx(1.0)
    assert float(sched(10)) == pytest.approx(0.5)
    assert float(sched(20)) == pytest.approx(0.25)


class _ListDataset(object):
    def __init__(self, names):
        self.sample_list = list(names)
        self.idxs = list(range(len(names)))
        self.num_labeled = None

    def set_num_labeled(self, n):
        self.num_labeled = n

    def __len__(self):
        return len(self.sample_list)

    def __getitem__(self, idx):
        return ((np.asarray([idx], np.float32),), (np.asarray([idx], np.float32),))


def test_split_unlabeled_wrapper():
    ds = _ListDataset(['a1', 'b1', 'a2', 'c1', 'a3'])
    w = nndata.SplitUnlabeledWrapper(ds, ['a'], ignore_unlabeled=False)
    assert ds.sample_list == ['a1', 'a2', 'a3', 'b1', 'c1']
    assert w.labeled_idxs == [0, 1, 2]
    assert w.unlabeled_idxs == [3, 4]
    assert ds.num_labeled == 3


def test_two_stream_sampler_epoch_semantics():
    labeled = list(range(4))          # 4 labeled, lbs=2 → 2 batches
    unlabeled = list(range(4, 16))    # 12 unlabeled, ubs=2 → 6 batches
    s = nndata.TwoStreamBatchSampler(labeled, unlabeled, 2, 2, seed=0)
    batches = list(iter(s))
    assert len(batches) == 6  # longer stream defines the epoch
    for b in batches:
        assert len(b) == 4
        assert all(i < 4 for i in b[:2])     # labeled first
        assert all(i >= 4 for i in b[2:])
    # unlabeled stream (the longer one) is iterated exactly once
    seen_unlabeled = sorted(i for b in batches for i in b[2:])
    assert seen_unlabeled == list(range(4, 16))


def test_joint_datasets_wrapper():
    l1, l2 = _ListDataset(['x', 'y']), _ListDataset(['z'])
    u1 = _ListDataset(['u', 'v'])
    w = nndata.JointDatasetsWrapper([l1, l2], [u1])
    assert len(w) == 5
    assert w.labeled_idxs == [0, 1, 2]
    assert w.unlabeled_idxs == [3, 4]
    # index resolution across dataset boundaries
    assert float(w[2][0][0][0]) == 0   # l2[0]
    assert float(w[4][0][0][0]) == 1   # u1[1]


def test_voc_augment_deterministic_across_thread_orders():
    """Per-index access counters: augmentation streams must not depend on
    loader-thread interleaving (same seed → same batches)."""
    import types
    from pixelssl_tpu.tasks.sseg import data as sdata

    args = types.SimpleNamespace(
        trainset={'pascal_voc_aug': ['/tmp/minivoc/VOC2012']}, valset={},
        im_size=32, train_base_size=48, seed=3, num_classes=4,
        val_rescaling=False, native_augment=False)
    try:
        ds1 = sdata.PascalVocAugDataset(args, is_train=True)
    except SystemExit:
        pytest.skip('mini VOC fixture not present')
    ds2 = sdata.PascalVocAugDataset(args, is_train=True)

    # simulate different thread interleavings: idx order 0,1,2 vs 2,1,0
    a = {i: ds1[i] for i in (0, 1, 2)}
    b = {i: ds2[i] for i in (2, 1, 0)}
    for i in (0, 1, 2):
        np.testing.assert_array_equal(np.asarray(a[i][0][0]),
                                      np.asarray(b[i][0][0]))
