"""Bound the CCT guided-cutout deviation (VERDICT r1 weak #6, r2 item #4):
guided_cutout_mask (models/cct_decoders.py) vs a numpy port of the
reference's per-contour cv2 logic (reference ssl_cct.py:623-646).

The default path now labels foreground components on device
(ops/components.py) and erases one independent random box per large
component (top-2 by area) — reference-exact semantics for <=2-object
images, so erase-area statistics must match TIGHTLY single- and
multi-object. The legacy union-bbox variant (n_components=0) keeps its
documented ~3x-stronger bound."""

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


def _erase_fractions_ours(masks, erase, n_draws=64, n_components=2):
    """Mean erased-fraction (inside the foreground) of guided_cutout_mask."""
    h, w = masks.shape[1:]
    # feed the argmax-3D path: mask>0 means foreground class
    pred = masks  # [B,H,W] — 3-D path: (pred > 0)
    fn = jax.jit(lambda p, k: guided_cutout_mask(
        p, k, erase, (h, w), n_components=n_components))
    fracs = []
    for s in range(n_draws):
        cut = np.asarray(fn(jnp.asarray(pred), jax.random.PRNGKey(s)))[..., 0]
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


def test_multi_object_erase_area_matches_reference():
    """Two separate blobs: one independent erase box per component on both
    sides -> erase-area statistics must now match tightly (this bound was
    0.5x..6x for the old union-bbox variant)."""
    masks = np.stack([_blob_mask(128, 128, [(32, 32), (96, 96)], 22)])
    ours = float(_erase_fractions_ours(masks, erase=0.4)[0])
    ref = float(_erase_fractions_ref(masks, erase=0.4)[0])
    print('multi-object erase fraction: ours={0:.4f} ref={1:.4f}'.format(
        ours, ref))
    np.testing.assert_allclose(ours, ref, rtol=0.15)


def test_legacy_union_bbox_variant_documented_ratio():
    """--cut-dec-components 0 keeps the round-1 union-bbox behavior:
    stronger cutout on multi-object masks, same order of magnitude."""
    masks = np.stack([_blob_mask(128, 128, [(32, 32), (96, 96)], 22)])
    ours = float(_erase_fractions_ours(masks, erase=0.4,
                                       n_components=0)[0])
    ref = float(_erase_fractions_ref(masks, erase=0.4)[0])
    assert 0.5 * ref <= ours <= 6.0 * ref


def test_label_components_matches_cv2():
    """Device labeling == cv2.connectedComponents (4-connectivity) as a
    partition, on structured and random masks."""
    from pixelssl_tpu.ops.components import label_components

    rng = np.random.default_rng(3)
    blobs = _blob_mask(96, 96, [(20, 20), (70, 70), (20, 70)], 14)
    # random blobby mask: threshold smoothed noise
    noise = rng.standard_normal((96, 96))
    k = np.ones((7, 7)) / 49.0
    sm = cv2.filter2D(noise, -1, k)
    rand_mask = (sm > 0.12).astype(np.float32)
    masks = np.stack([blobs, rand_mask])

    ours = np.asarray(label_components(jnp.asarray(masks > 0)))
    for i in range(masks.shape[0]):
        n_cv, lab_cv = cv2.connectedComponents(
            np.uint8(masks[i]), connectivity=4)
        # same partition: our label is constant exactly on each cv2
        # component, distinct across components
        seen = {}
        for cv_id in range(1, n_cv):
            vals = np.unique(ours[i][lab_cv == cv_id])
            assert len(vals) == 1, (i, cv_id, vals)
            assert vals[0] not in seen, (i, cv_id)
            seen[vals[0]] = cv_id
        assert np.all(ours[i][lab_cv == 0] == 96 * 96)


def test_three_objects_top2_erases_less_than_reference():
    """K=2 skips the smallest of 3 objects: ours erases less than the
    reference (which erases in all 3) but more than a single-object
    erase — the approximation direction is known and bounded."""
    masks = np.stack([_blob_mask(160, 160, [(30, 30), (30, 120), (120, 75)],
                                 20)])
    ours = float(_erase_fractions_ours(masks, erase=0.4)[0])
    ref = float(_erase_fractions_ref(masks, erase=0.4)[0])
    assert ours <= ref * 1.05
    assert ours >= ref * (2.0 / 3.0) * 0.85


def test_empty_foreground_erases_nothing():
    masks = np.zeros((1, 64, 64), np.float32)
    cut = np.asarray(guided_cutout_mask(jnp.asarray(masks),
                                        jax.random.PRNGKey(0), 0.4, (64, 64)))
    assert np.all(cut == 1.0)
