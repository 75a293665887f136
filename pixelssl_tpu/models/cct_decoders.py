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


def guided_cutout_mask(main_pred, rng, erase, resize, n_components=2):
    """Erase a random box inside each large foreground object's bbox.

    Device-native version of the reference's per-contour cv2 cutout
    (ssl_cct.py:623-646): connected components come from segmented-scan
    label propagation (ops/components.py), the ``n_components`` largest
    ones each get an independent random (bb*erase)-sized erase box inside
    their bbox, and components with area <= 50 are skipped (the
    reference's contour-size>50 analog). Exact reference semantics for
    images with <= n_components objects; further objects are left
    unerased (the old union-bbox stand-in erased ~3x too much on
    multi-object masks — tests/test_cct_cutout_parity.py quantifies
    both). ``n_components=0`` selects that legacy union-bbox variant.
    """
    masks = _foreground_mask(main_pred)[..., 0] > 0  # [B,H,W] bool
    b, h, w = masks.shape
    rows = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    big = jnp.asarray(1e9, jnp.float32)

    if n_components and n_components > 0:
        from ..ops.components import label_components, top_k_components
        labels = label_components(masks)
        comp, _ = top_k_components(labels, n_components, min_size=50)
    else:
        any_fg = jnp.sum(masks, axis=(1, 2)) > 50
        comp = (masks & any_fg[:, None, None])[:, None, :, :]

    k = comp.shape[1]
    rows_k, cols_k = rows[:, None], cols[:, None]  # [B,1,H,W]
    min_h = jnp.min(jnp.where(comp, rows_k, big), axis=(2, 3))   # [B,k]
    max_h = jnp.max(jnp.where(comp, rows_k, -big), axis=(2, 3))
    min_w = jnp.min(jnp.where(comp, cols_k, big), axis=(2, 3))
    max_w = jnp.max(jnp.where(comp, cols_k, -big), axis=(2, 3))
    bb_h = jnp.maximum(max_h - min_h, 0.0)
    bb_w = jnp.maximum(max_w - min_w, 0.0)

    k1, k2 = jax.random.split(rng)
    u_h = jax.random.uniform(k1, (b, k))
    u_w = jax.random.uniform(k2, (b, k))
    # randint(0, int(bb*(1-erase))) inclusive == floor(u * (that+1))
    start_h = min_h + jnp.floor(u_h * (jnp.floor(bb_h * (1 - erase)) + 1.0))
    start_w = min_w + jnp.floor(u_w * (jnp.floor(bb_w * (1 - erase)) + 1.0))
    end_h = start_h + jnp.floor(bb_h * erase)
    end_w = start_w + jnp.floor(bb_w * erase)

    present = jnp.any(comp, axis=(2, 3))  # [B,k]
    inside = ((rows_k >= start_h[:, :, None, None]) &
              (rows_k < end_h[:, :, None, None]) &
              (cols_k >= start_w[:, :, None, None]) &
              (cols_k < end_w[:, :, None, None]) &
              present[:, :, None, None])
    mask_ones = jnp.where(jnp.any(inside, axis=1), 0.0, 1.0)
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
