"""Shared tensor utilities (reference: pixelssl/nn/func.py:12-62).

The reference's ``create_model`` (DataParallel + .cuda()) has no analog here:
parallelism is handled by the mesh layer (pixelssl_tpu/parallel) around pure
jitted train steps, not by wrapping modules. ``sigmoid_rampup`` and
``split_tensor_tuple`` keep their exact semantics so SSL algorithms can split
labeled/unlabeled slices of the two-stream batch.
"""

import jax
import jax.numpy as jnp
import numpy as np


def sigmoid_rampup(current, rampup_length):
    """Exponential ramp-up e^{-5(1-t)^2} (reference nn/func.py:12-21).

    Works on python floats and traced jnp scalars alike.
    """
    if isinstance(rampup_length, (int, float)):
        if rampup_length == 0:
            return 1.0
        if isinstance(current, (int, float)):
            current = float(np.clip(current, 0.0, rampup_length))
            phase = 1.0 - current / rampup_length
            return float(np.exp(-5.0 * phase * phase))
    # traced path: guard rampup_length == 0 with a select
    length = jnp.maximum(jnp.asarray(rampup_length, jnp.float32), 1e-9)
    current = jnp.clip(jnp.asarray(current, jnp.float32), 0.0, length)
    phase = 1.0 - current / length
    value = jnp.exp(-5.0 * phase * phase)
    return jnp.where(jnp.asarray(rampup_length) == 0, 1.0, value)


def split_tensor_tuple(ttuple, start, end, detach=False, reduce_dim=False):
    """Slice each array of a tuple along the batch dim (nn/func.py:24-51).

    Used everywhere to split the two-stream batch (labeled-first ordering)
    into labeled / unlabeled sub-batches. ``start``/``end`` must be static
    under jit (they come from the static batch-size config).
    ``reduce_dim`` drops the batch dim when the slice is one sample
    (reference parity; used by visualization call sites).
    """
    result = []
    for t in ttuple:
        t = t[start:end]
        if detach:
            t = jax.lax.stop_gradient(t)
        if reduce_dim:
            t = t[0]
        result.append(t)
    return tuple(result)


def count_params(params):
    """Total number of scalar parameters in a pytree (for model_str logs)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def model_str(name, params):
    """Human-readable parameter summary (reference nn/func.py:65-82)."""
    lines = ['Model `{0}`: {1:,} parameters'.format(name, count_params(params))]
    return '\n'.join(lines)
