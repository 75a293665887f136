"""CCT auxiliary-decoder perturbations (reference:
pixelssl/ssl_algorithm/ssl_cct.py:542-745, adapted upstream from
yassouali/CCT).

Every auxiliary decoder = a perturbation of the encoder latent (or of the
decoder input guided by the main prediction) followed by the shared
``upsample`` head (1x1 conv + ICNR PixelShuffle stages — reused from
models/pspnet.UpsampleDecoder). The perturbations here are pure functions
taking an explicit PRNG key so the whole decoder bank traces into the fused
CCT train step.

TPU-specific replacement: the reference's CutOutDecoder extracts per-object
contours with cv2.findContours on the host (ssl_cct.py:623-646) — a
data-dependent CPU op that cannot trace. ``guided_cutout_mask`` replaces it
with the device-friendly equivalent: the bounding box of the foreground
mask per sample via iota reductions, with a random erase-box inside it
(the SURVEY-planned "box-from-mask bounding via reductions").
"""

import jax
import jax.numpy as jnp

from .layers import resize_nearest


def l2_normalize_per_sample(d):
    """Per-sample global L2 normalization (reference ssl_cct.py:578-582)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(d), axis=tuple(range(1, d.ndim)),
                            keepdims=True))
    return d / (norm + 1e-8)


def vat_perturbation(dec_apply, x, rng, xi, eps, iterations=1):
    """VAT adversarial latent perturbation (reference ssl_cct.py:555-576).

    ``dec_apply(x) -> logits`` is the decoder closed over its params; the
    inner gradient is w.r.t. the perturbation only (the reference zeroes
    decoder grads afterwards).
    """
    x_d = jax.lax.stop_gradient(x)
    pred = jax.nn.softmax(dec_apply(x_d).astype(jnp.float32), axis=-1)
    pred = jax.lax.stop_gradient(pred)

    d = jax.random.uniform(rng, x.shape, dtype=jnp.float32) - 0.5
    d = l2_normalize_per_sample(d)

    def kl_fn(d):
        logp_hat = jax.nn.log_softmax(
            dec_apply(x_d + xi * d.astype(x.dtype)).astype(jnp.float32),
            axis=-1)
        # F.kl_div(logp_hat, pred, 'batchmean') with 0·log0 → 0
        plogp = jnp.where(pred > 0, pred * jnp.log(pred), 0.0)
        return jnp.sum(plogp - pred * logp_hat) / x.shape[0]

    for _ in range(iterations):
        d = l2_normalize_per_sample(jax.grad(kl_fn)(d))
    return jax.lax.stop_gradient(d * eps).astype(x.dtype)


def spatial_dropout(x, rng, rate):
    """nn.Dropout2d: drop whole channels per sample (NHWC → mask [B,1,1,C])."""
    keep = jax.random.bernoulli(rng, 1.0 - rate,
                                (x.shape[0], 1, 1, x.shape[-1]))
    return x * keep.astype(x.dtype) / (1.0 - rate)


def element_dropout(x, rng, rate):
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return x * keep.astype(x.dtype) / (1.0 - rate)


def _foreground_mask(main_pred):
    """(argmax over classes > 0) float mask [B,H,W,1]
    (reference ssl_cct.py:610-614,663-666)."""
    if main_pred.ndim == 3:
        masks = (main_pred > 0)
    else:
        masks = (jnp.argmax(main_pred, axis=-1) > 0)
    return masks.astype(jnp.float32)[..., None]


def guided_cutout_mask(main_pred, rng, erase, resize):
    """Erase a random box inside the foreground bounding box per sample.

    Device-friendly stand-in for the reference's per-contour cv2 version
    (ssl_cct.py:623-646): one bounding box per sample from mask extents.
    Measured deviation (tests/test_cct_cutout_parity.py): single-object
    masks match the reference's mean erase area within 15%; multi-object
    masks erase ~3x more (union bbox vs per-contour bboxes) — same
    augmentation family, stronger cutout.
    """
    masks = _foreground_mask(main_pred)[..., 0]  # [B,H,W]
    b, h, w = masks.shape
    rows = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    big = jnp.asarray(1e9, jnp.float32)
    any_fg = jnp.sum(masks, axis=(1, 2)) > 50  # contour size>50 analog
    min_h = jnp.min(jnp.where(masks > 0, rows, big), axis=(1, 2))
    max_h = jnp.max(jnp.where(masks > 0, rows, -big), axis=(1, 2))
    min_w = jnp.min(jnp.where(masks > 0, cols, big), axis=(1, 2))
    max_w = jnp.max(jnp.where(masks > 0, cols, -big), axis=(1, 2))
    bb_h = jnp.maximum(max_h - min_h, 0.0)
    bb_w = jnp.maximum(max_w - min_w, 0.0)

    k1, k2 = jax.random.split(rng)
    u_h = jax.random.uniform(k1, (b,))
    u_w = jax.random.uniform(k2, (b,))
    start_h = min_h + jnp.floor(u_h * (bb_h * (1 - erase) + 1.0))
    start_w = min_w + jnp.floor(u_w * (bb_w * (1 - erase) + 1.0))
    end_h = start_h + jnp.floor(bb_h * erase)
    end_w = start_w + jnp.floor(bb_w * erase)

    inside = ((rows >= start_h[:, None, None]) & (rows < end_h[:, None, None]) &
              (cols >= start_w[:, None, None]) & (cols < end_w[:, None, None]))
    mask_ones = jnp.where(inside & any_fg[:, None, None], 0.0, 1.0)
    return resize_nearest(mask_ones[..., None], resize)


def guided_masking(x, main_pred, return_context):
    """Context/Object masking (reference ssl_cct.py:675-690)."""
    masks_context = _foreground_mask(main_pred)
    masks_context = resize_nearest(masks_context, x.shape[1:3])
    if return_context:
        return masks_context.astype(x.dtype) * x
    return (1.0 - masks_context).astype(x.dtype) * x


def feature_dropout(x, rng):
    """Attention-threshold feature drop (reference ssl_cct.py:712-728)."""
    attention = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    max_val = jnp.max(attention, axis=(1, 2, 3), keepdims=True)
    u = jax.random.uniform(rng, (x.shape[0], 1, 1, 1),
                           minval=0.7, maxval=0.9)
    threshold = max_val * u
    drop_mask = (attention < threshold).astype(x.dtype)
    return x * drop_mask


def feature_noise(x, rng, uniform_range):
    """Multiplicative uniform noise shared across the batch
    (reference ssl_cct.py:731-745: noise sampled with shape x.shape[1:])."""
    noise = jax.random.uniform(rng, x.shape[1:], minval=-uniform_range,
                               maxval=uniform_range)
    return x * (1.0 + noise[None].astype(x.dtype))
