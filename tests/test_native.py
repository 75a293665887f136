"""Native augmentation library: numerics vs the PIL/numpy reference path."""

import numpy as np
import pytest

from pixelssl_tpu.nn import native


@pytest.mark.skipif(not native.available(),
                    reason='native library not built (make -C pixelssl_tpu/native)')
def test_native_augment_matches_reference_math():
    rng = np.random.default_rng(0)
    h, w = 37, 53
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    lbl = rng.integers(0, 21, (h, w)).astype(np.int32)

    crop = 32
    rh, rw = 64, 80
    cy, cx = 10, 20

    out_img, out_lbl = native.augment_batch(
        [img], [lbl], [(rh, rw)], [(cy, cx)], [False], [255], crop)

    # reference math: bilinear resize (half-pixel), crop, normalize
    from PIL import Image
    pim = Image.fromarray(img).resize((rw, rh), Image.BILINEAR)
    ref = np.asarray(pim, np.float32)[cy:cy + crop, cx:cx + crop] / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    ref = (ref - mean) / std
    # PIL's bilinear uses an antialias-off triangle filter ≈ the same
    # half-pixel convention; allow small tolerance
    np.testing.assert_allclose(out_img[0], ref, atol=0.35)
    # the bulk must match tightly
    frac_close = np.mean(np.abs(out_img[0] - ref) < 0.05)
    assert frac_close > 0.95

    # nearest label resize matches
    plb = Image.fromarray(lbl.astype(np.uint8)).resize((rw, rh), Image.NEAREST)
    ref_lbl = np.asarray(plb, np.int32)[cy:cy + crop, cx:cx + crop]
    assert np.mean(out_lbl[0] == ref_lbl) > 0.9  # convention differences at edges


@pytest.mark.skipif(not native.available(), reason='native library not built')
def test_native_augment_padding_and_flip():
    img = np.full((16, 16, 3), 128, np.uint8)
    img[:, :8] = 0  # left half black
    lbl = np.zeros((16, 16), np.int32)

    # negative crop origin → padding rows/cols; flip mirrors the output
    out_img, out_lbl = native.augment_batch(
        [img, img], [lbl, None], [(16, 16), (16, 16)],
        [(-4, -4), (0, 0)], [False, True], [255, -1], 16)
    # padded region: normalized zero pixels + ignore label
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    np.testing.assert_allclose(out_img[0][0, 0], (0 - mean) / std, atol=1e-5)
    assert out_lbl[0][0, 0] == 255
    # unlabeled sample gets fill everywhere
    assert np.all(out_lbl[1] == -1)
    # flip: black half should now be on the right
    assert out_img[1][8, -1].mean() < out_img[1][8, 0].mean()
