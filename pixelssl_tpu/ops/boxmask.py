"""On-device CutMix box-mask generation.

Re-design of the reference's CPU-numpy ``BoxMaskGenerator``
(reference: pixelssl/ssl_algorithm/ssl_cutmix.py:470-547, adapted upstream
from Britefury/cutmix-semisup-seg): per-mask area proportion drawn from
``prop_range``, random aspect ratio via a log-uniform split (y_prop =
exp(U·log(p)), x_prop = p/y_prop), boxes placed within bounds, inverted
(mask=1 inside the box). TPU-first: the boxes are drawn with jax RNG and
rasterized with broadcasted iota comparisons — the mask never exists on the
host and the whole thing traces into the fused CutMix train step (the
reference synthesized masks on CPU and shipped them to GPU every iteration,
ssl_cutmix.py:419-421).

Only the configuration the reference actually uses is implemented:
boxes_num=1, random_aspect_ratio=True, area_prop=True, within_bounds=True,
invert=True (ssl_cutmix.py:126-128).
"""

import jax
import jax.numpy as jnp


def box_masks(rng, n, shape, prop_range, invert=True):
    """Generate ``n`` box masks of spatial ``shape`` → [n, H, W, 1] float32."""
    h, w = shape
    k_prop, k_aspect, k_pos = jax.random.split(rng, 3)
    p0, p1 = float(prop_range[0]), float(prop_range[1])

    props = jax.random.uniform(k_prop, (n,), minval=p0, maxval=p1)
    safe = jnp.maximum(props, 1e-12)
    u = jax.random.uniform(k_aspect, (n,))
    y_props = jnp.exp(u * jnp.log(safe))
    x_props = safe / y_props
    zero = props == 0.0
    y_props = jnp.where(zero, 0.0, y_props)
    x_props = jnp.where(zero, 0.0, x_props)

    sizes_y = jnp.round(y_props * h)
    sizes_x = jnp.round(x_props * w)
    uy = jax.random.uniform(k_pos, (n, 2))
    y0 = jnp.round((h - sizes_y) * uy[:, 0])
    x0 = jnp.round((w - sizes_x) * uy[:, 1])
    y1, x1 = y0 + sizes_y, x0 + sizes_x

    rows = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2)
    inside = ((rows >= y0[:, None, None]) & (rows < y1[:, None, None]) &
              (cols >= x0[:, None, None]) & (cols < x1[:, None, None]))
    mask = inside.astype(jnp.float32)
    if not invert:
        mask = 1.0 - mask
    return mask[..., None]
