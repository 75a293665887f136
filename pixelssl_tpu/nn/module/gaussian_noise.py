"""Input-perturbation Gaussian noise as a pure function (NHWC).

Re-design of the reference's stateful ``GaussianNoiseLayer``
(reference: pixelssl/nn/module/gaussian_noise.py:7-40) used by Mean Teacher
to perturb the student input (reference ssl_mt.py:120,337-357). Semantics
preserved: a per-call noise std is drawn uniformly from [0, std]; the input
is min-max normalized to [0,1] per-sample, noised, clipped, denormalized.
TPU-first: randomness comes from an explicit jax PRNG key so the whole
perturbation traces into the fused train step (the reference ran it through
DataParallel as a separate module forward).
"""

import jax
import jax.numpy as jnp


def gaussian_noise(rng, x, std):
    """Apply MT-style Gaussian noise to a [N,H,W,C] batch.

    ``std`` may be None / <=0 → identity (reference gaussian_noise.py:15-19).
    """
    if std is None or std <= 0:
        return x
    k_std, k_noise = jax.random.split(rng)
    call_std = jax.random.uniform(k_std, (), minval=0.0, maxval=std)
    noise = call_std * jax.random.normal(k_noise, x.shape, dtype=jnp.float32)

    imax = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    imin = jnp.min(x, axis=(1, 2, 3), keepdims=True)
    scale = imax - imin + 1e-9

    y = (x - imin) / scale
    y = jnp.clip(y + noise.astype(x.dtype), 0.0, 1.0)
    return y * scale + imin
