"""Tests for device ops: confusion matrix, gaussian blur/noise, resizes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelssl_tpu.models import layers
from pixelssl_tpu.nn.module import gaussian_blur, gaussian_kernel_1d, gaussian_noise
from pixelssl_tpu.ops import confusion_matrix, scores_from_confusion


def _np_confusion(pred, gt, C):
    mask = (gt >= 0) & (gt < C)
    label = C * gt[mask].astype(int) + pred[mask]
    return np.bincount(label, minlength=C * C).reshape(C, C)


def test_confusion_matrix_matches_numpy():
    rng = np.random.default_rng(0)
    C = 5
    gt = rng.integers(0, C, (2, 16, 16)).astype(np.int32)
    gt[0, :3] = 255  # ignore region
    pred = rng.integers(0, C, (2, 16, 16)).astype(np.int32)
    cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt), C))
    np.testing.assert_array_equal(cm, _np_confusion(pred, gt, C))


def test_scores_perfect_prediction():
    C = 4
    gt = np.random.default_rng(1).integers(0, C, (1, 32, 32)).astype(np.int32)
    cm = np.asarray(confusion_matrix(jnp.asarray(gt), jnp.asarray(gt), C))
    s = scores_from_confusion(cm)
    assert s['acc'] == pytest.approx(1.0)
    assert s['mIoU'] == pytest.approx(1.0)


def test_gaussian_kernel_matches_scipy():
    scipy = pytest.importorskip('scipy')
    import scipy.ndimage
    for k in (3, 5, 9, 41):
        sigma = 0.3 * ((k - 1) * 0.5 - 1) + 0.8
        n = np.zeros((k, k))
        n[k // 2, k // 2] = 1
        ref = scipy.ndimage.gaussian_filter(n, sigma)
        g = gaussian_kernel_1d(k)
        ours = np.outer(g, g)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_gaussian_blur_preserves_constant():
    x = jnp.ones((2, 16, 16, 3))
    y = gaussian_blur(x, 5)
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-5)


def test_gaussian_blur_reflect_padding():
    """Impulse at corner: reflect padding keeps total mass ≈ kernel mass."""
    x = jnp.zeros((1, 9, 9, 1)).at[0, 4, 4, 0].set(1.0)
    y = gaussian_blur(x, 5)
    assert float(jnp.sum(y)) == pytest.approx(1.0, rel=1e-5)


def test_gaussian_noise_bounds_and_identity():
    x = jnp.asarray(np.random.default_rng(0).normal(2.0, 1.0, (2, 8, 8, 3)),
                    jnp.float32)
    assert gaussian_noise(jax.random.PRNGKey(0), x, None) is x
    y = gaussian_noise(jax.random.PRNGKey(0), x, 0.5)
    # output stays within the per-sample min/max envelope (clip in [0,1] norm)
    assert float(jnp.max(y)) <= float(jnp.max(x)) + 1e-4
    assert float(jnp.min(y)) >= float(jnp.min(x)) - 1e-4
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_resize_bilinear_matches_torch():
    torch = pytest.importorskip('torch')
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, 9, 3)).astype(np.float32)
    for align in (True, False):
        for size in ((14, 18), (21, 27), (4, 5)):
            ours = np.asarray(layers.resize_bilinear(jnp.asarray(x), size, align))
            theirs = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                                   size=size, mode='bilinear',
                                   align_corners=align)
            theirs = theirs.permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(ours, theirs, atol=1e-5,
                                       err_msg='align={0} size={1}'.format(align, size))


def test_adaptive_avg_pool_matches_torch():
    torch = pytest.importorskip('torch')
    import torch.nn.functional as F
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 13, 17, 4)).astype(np.float32)
    for out in (1, 2, 3, 6):
        ours = np.asarray(layers.adaptive_avg_pool(jnp.asarray(x), out))
        theirs = F.adaptive_avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), out)
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip('torch')
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4, 5, 12)).astype(np.float32)  # C=3, r=2
    ours = np.asarray(layers.pixel_shuffle(jnp.asarray(x), 2))
    theirs = torch.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_fused_blur_matches_conv_blur():
    from pixelssl_tpu.ops.blur_pallas import gaussian_blur_fused
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 33, 33, 1)).astype(np.float32))
    for k in (5, 9):
        a = np.asarray(gaussian_blur(x, k))
        b = np.asarray(gaussian_blur_fused(x, k, use_pallas=False))
        np.testing.assert_allclose(a, b, atol=1e-4)
