"""Connected-component labeling as a fused on-device op (NHW bool masks).

The reference's CCT guided cutout calls ``cv2.findContours`` per sample on
the host and erases a random box inside every large contour's bbox
(reference pixelssl/ssl_algorithm/ssl_cct.py:610-646) — a data-dependent
CPU op that cannot trace into a TPU step. This module provides the
device-side primitive that replaces it: min-label propagation with
SEGMENTED associative scans.

Algorithm: every foreground pixel starts labeled with its flat index;
one sweep runs a segmented cummin along rows (both directions) and
columns (both directions), where background pixels are segment barriers,
so labels flood along contiguous foreground runs. Each extra sweep lets
the minimum turn one more corner; ``n_sweeps`` bounds the number of
direction alternations a component's geodesic may need. For natural
object masks a handful of sweeps reaches the exact 4-connected labeling
(verified against cv2.connectedComponents in
tests/test_cct_cutout_parity.py); pathological spirals may split into
several labels, which downstream treats as separate objects — a benign
over-segmentation.

TPU notes: an associative scan is log-depth on the VPU; one sweep is 4
scans + elementwise mins, all fusible, with no host round-trip. This is
the idiomatic replacement for the reference's per-image OpenCV loop.
"""

import jax
import jax.numpy as jnp


def _seg_min(a, b):
    """Segmented-min combine: (barrier, value) pairs, left-to-right."""
    af, av = a
    bf, bv = b
    return af | bf, jnp.where(bf, bv, jnp.minimum(av, bv))


def label_components(mask, n_sweeps=6):
    """Approximate 4-connected component labels of a [B,H,W] bool mask.

    Returns int32 [B,H,W]: the minimum flat index (h*W+w) in the pixel's
    component for foreground pixels, H*W for background. Exact when every
    component's internal geodesics need <= n_sweeps direction changes.
    """
    b, h, w = mask.shape
    big = jnp.int32(h * w)
    idx = (jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1) * w +
           jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2))
    labels = jnp.where(mask, idx, big)
    barrier = ~mask

    def one_direction(labels, axis, rev):
        lab = jnp.flip(labels, axis) if rev else labels
        bar = jnp.flip(barrier, axis) if rev else barrier
        _, v = jax.lax.associative_scan(_seg_min, (bar, lab), axis=axis)
        if rev:
            v = jnp.flip(v, axis)
        return jnp.minimum(labels, jnp.where(mask, v, big))

    def sweep(labels, _):
        for axis in (2, 1):
            for rev in (False, True):
                labels = one_direction(labels, axis, rev)
        return labels, None

    labels, _ = jax.lax.scan(sweep, labels, None, length=n_sweeps)
    return labels


def top_k_components(labels, k, min_size=0):
    """Top-k components by area from ``label_components`` output.

    Returns (masks [B,k,H,W] bool, sizes [B,k] int32); slots whose
    component has size <= min_size are all-False with size 0.
    """
    b, h, w = labels.shape
    hw = h * w
    flat = labels.reshape(b, hw)
    # scatter-add areas; slot hw collects the background
    sizes = jnp.zeros((b, hw + 1), jnp.int32).at[
        jnp.arange(b)[:, None], flat].add(1)
    sizes = sizes[:, :hw]
    top_sizes, top_labels = jax.lax.top_k(sizes, k)
    valid = top_sizes > min_size
    masks = (labels[:, None, :, :] == top_labels[:, :, None, None]) & \
        valid[:, :, None, None]
    return masks, jnp.where(valid, top_sizes, 0)
