"""Bound the CCT guided-cutout deviation (VERDICT r1 weak #6): our
device-friendly one-box-per-sample cutout (models/cct_decoders.py
guided_cutout_mask) vs a numpy port of the reference's per-contour cv2
logic (reference ssl_cct.py:623-646) — erase-area statistics must match
on single-object masks, and stay comparable on multi-object masks."""

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

import jax
import jax.numpy as jnp

from pixelssl_tpu.models.cct_decoders import guided_cutout_mask


def reference_guided_cutout(masks, erase, rng):
    """Numpy port of the reference's guided_cutout inner loop
    (ssl_cct.py:623-646): per external contour with >50 polygon points,
    erase a random (bb*erase)-sized box inside the contour bbox."""
    out = []
    for mask in masks:
        mask_np = np.uint8(mask)
        mask_ones = np.ones_like(mask_np)
        contours, _ = cv2.findContours(mask_np, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        polys = [c.reshape(c.shape[0], c.shape[-1])
                 for c in contours if c.shape[0] > 50]
        for poly in polys:
            min_w, max_w = poly[:, 0].min(), poly[:, 0].max()
            min_h, max_h = poly[:, 1].min(), poly[:, 1].max()
            bb_w, bb_h = max_w - min_w, max_h - min_h
            rnd_start_w = rng.integers(0, int(bb_w * (1 - erase)) + 1)
            rnd_start_h = rng.integers(0, int(bb_h * (1 - erase)) + 1)
            h0, h1 = min_h + rnd_start_h, min_h + rnd_start_h + int(bb_h * erase)
            w0, w1 = min_w + rnd_start_w, min_w + rnd_start_w + int(bb_w * erase)
            mask_ones[h0:h1, w0:w1] = 0
        out.append(mask_ones)
    return np.stack(out)


def _blob_mask(h, w, centers, radius):
    """Clean discrete disks: one external contour each, with >50 polygon
    points (diagonal boundary steps are not compressed by
    CHAIN_APPROX_SIMPLE)."""
    yy, xx = np.mgrid[0:h, 0:w]
    m = np.zeros((h, w), bool)
    for cy, cx in centers:
        m |= ((yy - cy) ** 2 + (xx - cx) ** 2) < radius ** 2
    return m.astype(np.float32)


def _erase_fractions_ours(masks, erase, n_draws=64):
    """Mean erased-fraction (inside the foreground) of guided_cutout_mask."""
    h, w = masks.shape[1:]
    # feed the argmax-3D path: mask>0 means foreground class
    pred = masks  # [B,H,W] — 3-D path: (pred > 0)
    fracs = []
    for s in range(n_draws):
        cut = guided_cutout_mask(jnp.asarray(pred), jax.random.PRNGKey(s),
                                 erase, (h, w))
        cut = np.asarray(cut)[..., 0]
        fracs.append((cut == 0).sum(axis=(1, 2)) / (h * w))
    return np.mean(fracs, axis=0)


def _erase_fractions_ref(masks, erase, n_draws=64):
    h, w = masks.shape[1:]
    rng = np.random.default_rng(0)
    fracs = []
    for _ in range(n_draws):
        cut = reference_guided_cutout(masks, erase, rng)
        fracs.append((cut == 0).sum(axis=(1, 2)) / (h * w))
    return np.mean(fracs, axis=0)


def test_single_object_erase_area_matches_reference():
    masks = np.stack([_blob_mask(96, 96, [(48, 48)], 30),
                      _blob_mask(96, 96, [(40, 56)], 24)])
    ours = _erase_fractions_ours(masks, erase=0.4)
    ref = _erase_fractions_ref(masks, erase=0.4)
    # same bbox, same box-size law → mean erased fraction within 15% rel.
    np.testing.assert_allclose(ours, ref, rtol=0.15)
    assert np.all(ref > 0.01)  # non-vacuous: something was erased


def test_multi_object_erase_area_comparable():
    """Two separate blobs: the reference erases one box per contour, ours
    one box over the union bbox — document the measured ratio and bound it."""
    masks = np.stack([_blob_mask(128, 128, [(32, 32), (96, 96)], 22)])
    ours = float(_erase_fractions_ours(masks, erase=0.4)[0])
    ref = float(_erase_fractions_ref(masks, erase=0.4)[0])
    print('multi-object erase fraction: ours={0:.4f} ref={1:.4f}'.format(
        ours, ref))
    # union bbox is larger than per-contour bboxes, so ours erases more;
    # must stay within the same order of magnitude (measured ~2-4x)
    assert 0.5 * ref <= ours <= 6.0 * ref


def test_empty_foreground_erases_nothing():
    masks = np.zeros((1, 64, 64), np.float32)
    cut = np.asarray(guided_cutout_mask(jnp.asarray(masks),
                                        jax.random.PRNGKey(0), 0.4, (64, 64)))
    assert np.all(cut == 1.0)
