"""Model forward-shape and SyncBN tests on the fake 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from pixelssl_tpu import parallel
from pixelssl_tpu.models.deeplab_v2 import DeepLabV2
from pixelssl_tpu.models.layers import SyncBatchNorm
from pixelssl_tpu.models.pspnet import PSPNet
from pixelssl_tpu.models.resnet import ResNet


def test_resnet_output_stride():
    net = ResNet(layers=(1, 1, 1, 1), output_stride=16)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = net.init(jax.random.PRNGKey(0), x, train=False)
    y = net.apply(vars_, x, train=False)
    assert y.shape == (1, 4, 4, 2048)
    net8 = ResNet(layers=(1, 1, 1, 1), output_stride=8)
    vars8 = net8.init(jax.random.PRNGKey(0), x, train=False)
    assert net8.apply(vars8, x, train=False).shape == (1, 8, 8, 2048)


def test_deeplabv2_forward():
    net = DeepLabV2(backbone='resnet50', output_stride=16, num_classes=21)
    x = jnp.zeros((2, 65, 65, 3))
    vars_ = net.init(jax.random.PRNGKey(0), x, train=False)
    logits, latent = net.apply(vars_, x, train=False)
    assert logits.shape == (2, 65, 65, 21)
    assert latent.shape[-1] == 2048


def test_pspnet_forward():
    net = PSPNet(backbone='resnet50', output_stride=8, num_classes=21)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = net.init(jax.random.PRNGKey(0), x, train=False)
    logits, latent = net.apply(vars_, x, train=False)
    assert logits.shape == (1, 64, 64, 21)
    assert latent.shape == (1, 8, 8, 512)


def test_sync_batchnorm_cross_replica_stats():
    """BN stats under shard_map must equal global-batch stats."""
    mesh = parallel.make_mesh()
    n = mesh.devices.size
    assert n == 8
    bn = SyncBatchNorm(axis_name='data')
    x_global = np.random.default_rng(0).standard_normal((16, 4, 4, 3)).astype(np.float32)
    vars_ = bn.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 4, 3)), train=True)

    def fwd(v, x):
        y, mut = bn.apply(v, x, train=True, mutable=['batch_stats'])
        return y, mut['batch_stats']

    y, stats = jax.jit(shard_map(fwd, mesh=mesh,
                                 in_specs=(P(), P('data')),
                                 out_specs=(P('data'), P()),
                                 check_vma=False))(vars_, x_global)
    # global-batch statistics
    gm = x_global.mean(axis=(0, 1, 2))
    gv = x_global.var(axis=(0, 1, 2))
    count = x_global.size / 3
    unbiased = gv * count / (count - 1)
    np.testing.assert_allclose(np.asarray(stats['mean']), 0.1 * gm, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats['var']),
                               0.9 * 1.0 + 0.1 * unbiased, rtol=1e-4)
    # normalized output has ~zero mean / unit var
    assert abs(float(np.asarray(y).mean())) < 1e-4
    assert float(np.asarray(y).std()) == pytest.approx(1.0, rel=1e-2)


def test_sync_batchnorm_eval_uses_running_stats():
    bn = SyncBatchNorm()
    x = jnp.ones((2, 4, 4, 3)) * 5.0
    vars_ = bn.init(jax.random.PRNGKey(0), x, train=False)
    y = bn.apply(vars_, x, train=False)
    # running stats are (0, 1) at init → output = x (scale 1, bias 0)
    np.testing.assert_allclose(np.asarray(y), 5.0 / np.sqrt(1 + 1e-5), rtol=1e-5)


def test_remat_backbone_matches_no_remat():
    """remat must not change forward numerics."""
    from pixelssl_tpu.models.resnet import ResNet
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 32, 32, 3)).astype(np.float32))
    a = ResNet(layers=(1, 1, 1, 1), output_stride=16, remat=False)
    b = ResNet(layers=(1, 1, 1, 1), output_stride=16, remat=True)
    va = a.init(jax.random.PRNGKey(0), x, train=False)
    ya = a.apply(va, x, train=False)
    yb = b.apply(va, x, train=False)  # same params work for both
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-6)


def test_sync_batchnorm_sample_weight_excludes_padding():
    """Masked-stats BN: padded rows must not affect statistics."""
    bn = SyncBatchNorm()
    rng = np.random.default_rng(0)
    x_real = rng.standard_normal((4, 4, 4, 3)).astype(np.float32)
    x_padded = np.concatenate([x_real, np.zeros((2, 4, 4, 3), np.float32)])
    w = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)
    vars_ = bn.init(jax.random.PRNGKey(0), jnp.asarray(x_real), train=False)

    y_ref, st_ref = bn.apply(vars_, jnp.asarray(x_real), train=True,
                             mutable=['batch_stats'])
    y_pad, st_pad = bn.apply(vars_, jnp.asarray(x_padded), train=True,
                             sample_weight=w, mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(y_pad)[:4], np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st_pad['batch_stats']['mean']),
        np.asarray(st_ref['batch_stats']['mean']), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(st_pad['batch_stats']['var']),
        np.asarray(st_ref['batch_stats']['var']), rtol=1e-5, atol=1e-7)
