"""Loss-numerics parity against torch (the reference's compute substrate)."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp

from pixelssl_tpu.models.discriminator import fc_discriminator_criterion
from pixelssl_tpu.tasks.sseg.criterion import cross_entropy_per_sample


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((3, 8, 8, 5)).astype(np.float32)
    gt = rng.integers(0, 5, (3, 8, 8)).astype(np.int64)
    gt[0, :2] = 255  # ignore region

    ours = np.asarray(cross_entropy_per_sample(
        jnp.asarray(logits), jnp.asarray(gt), ignore_index=255))

    t_logits = torch.from_numpy(logits).permute(0, 3, 1, 2)
    ce = torch.nn.CrossEntropyLoss(ignore_index=255, reduction='none')
    loss = ce(t_logits, torch.from_numpy(gt))
    theirs = torch.mean(loss, dim=(1, 2)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_bce_with_logits_matches_torch():
    rng = np.random.default_rng(1)
    pred = rng.standard_normal((2, 8, 8, 1)).astype(np.float32) * 5
    gt = rng.integers(0, 2, (2, 8, 8, 1)).astype(np.float32)
    ours = np.asarray(fc_discriminator_criterion(jnp.asarray(pred),
                                                 jnp.asarray(gt)))
    loss = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(pred), torch.from_numpy(gt), reduction='none')
    theirs = torch.mean(loss, dim=(1, 2, 3)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_gaussian_blur_matches_torch_reference_module():
    """Full blur pipeline (reflect pad + depthwise conv with the scipy
    kernel) vs a torch replica of the reference GaussianBlurLayer."""
    scipy = pytest.importorskip('scipy')
    import scipy.ndimage
    from pixelssl_tpu.nn.module import gaussian_blur

    k = 9
    sigma = 0.3 * ((k - 1) * 0.5 - 1) + 0.8
    n = np.zeros((k, k))
    n[k // 2, k // 2] = 1
    kernel2d = scipy.ndimage.gaussian_filter(n, sigma).astype(np.float32)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 20, 20, 3)).astype(np.float32)

    conv = torch.nn.Conv2d(3, 3, k, padding=0, bias=False, groups=3)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(
            np.tile(kernel2d[None, None], (3, 1, 1, 1))))
    pad = torch.nn.ReflectionPad2d(k // 2)
    with torch.no_grad():
        theirs = conv(pad(torch.from_numpy(x).permute(0, 3, 1, 2)))
    theirs = theirs.permute(0, 2, 3, 1).numpy()

    ours = np.asarray(gaussian_blur(jnp.asarray(x), k))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
