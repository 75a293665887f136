"""Fixed-kernel Gaussian blur as a pure function (NHWC).

Re-design of the reference's ``GaussianBlurLayer`` depthwise-conv module
(reference: pixelssl/nn/module/gaussian_blur.py:11-64). TPU-first choices:

* separable 1-D passes instead of a dense k×k depthwise conv — O(2k) taps
  per pixel instead of O(k²); both passes lower to XLA convolutions that
  fuse with surrounding elementwise work (GCT's flawmap pipelines chain
  several blurs over [B,1,H,W] maps, reference ssl_gct.py:641-657,714-728);
* the kernel is reproduced bit-for-bit from the reference recipe
  (σ = 0.3·((k−1)·0.5−1)+0.8, scipy-style truncated discrete Gaussian of an
  impulse, gaussian_blur.py:56-64) without the scipy dependency;
* reflect padding matches nn.ReflectionPad2d.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _reflect_idx(i, n):
    """scipy 'reflect' boundary: (d c b a | a b c d | d c b a)."""
    while i < 0 or i >= n:
        if i < 0:
            i = -i - 1
        if i >= n:
            i = 2 * n - i - 1
    return i


@functools.lru_cache(maxsize=None)
def gaussian_kernel_1d(kernel_size, truncate=4.0):
    """1-D response of scipy.ndimage.gaussian_filter to an impulse at the
    center of a length-k window, INCLUDING scipy's reflect-boundary folding
    (the reference bakes this folded kernel into its conv weights,
    reference gaussian_blur.py:56-64; for small k the truncated Gaussian is
    wider than the window and the reflected tails matter)."""
    assert kernel_size % 2 == 1
    sigma = 0.3 * ((kernel_size - 1) * 0.5 - 1) + 0.8
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    center = kernel_size // 2
    w = np.zeros(kernel_size, dtype=np.float64)
    for i in range(kernel_size):
        for d in range(-radius, radius + 1):
            if _reflect_idx(i + d, kernel_size) == center:
                w[i] += g[d + radius]
    return w.astype(np.float32)


def _blur_axis(x, kernel, axis):
    """Reflect-pad + 1-D depthwise convolution along a spatial axis of NHWC."""
    k = kernel.shape[0]
    half = k // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (half, half)
    xp = jnp.pad(x, pad, mode='reflect')
    # dimension_numbers for NHWC depthwise conv
    c = x.shape[-1]
    if axis == 1:
        rhs = jnp.asarray(kernel).reshape(k, 1, 1, 1)
        window = (k, 1)
    else:
        rhs = jnp.asarray(kernel).reshape(1, k, 1, 1)
        window = (1, k)
    rhs = jnp.tile(rhs, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        xp, rhs, window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=c)


def gaussian_blur(x, kernel_size):
    """Blur a [N,H,W,C] tensor per-channel with the reference's fixed kernel."""
    if x.ndim != 4:
        raise ValueError('gaussian_blur requires a 4D NHWC tensor')
    kernel = jnp.asarray(gaussian_kernel_1d(int(kernel_size)))
    dtype = x.dtype
    x = x.astype(jnp.float32)
    x = _blur_axis(x, kernel, axis=1)
    x = _blur_axis(x, kernel, axis=2)
    return x.astype(dtype)
