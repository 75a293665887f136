"""Spatial (height-axis) sharding for very large images.

SURVEY.md §5: the reference has no sequence-parallelism analog — its only
scaling axis is spatial resolution (--im-size), never sharded (each GPU
sees whole images). The TPU-native equivalent is GSPMD spatial
partitioning: annotate the image's H axis with a mesh axis and let the XLA
partitioner insert halo exchanges for every convolution/pooling window
automatically — no hand-written ring transfers.

This module provides the eval-side utility (score images too large for one
chip's HBM) and the building block for spatially-sharded training: under
``jit`` with these shardings, reductions over the sharded H axis (BN
statistics, losses, confusion matrices) become cross-device collectives
automatically, so the same pure step functions work unchanged.
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def spatial_image_sharding(mesh, axis_name=DATA_AXIS):
    """Sharding for [N, H, W, C] images: H split across the mesh."""
    return NamedSharding(mesh, P(None, axis_name, None, None))


def spatial_forward(apply_fn, mesh, axis_name=DATA_AXIS):
    """Jit ``apply_fn(variables, image) -> outputs`` with the image's H axis
    sharded over the mesh. XLA inserts conv halo exchanges; outputs come
    back sharded the same way (fetch or reshard as needed)."""
    rep = NamedSharding(mesh, P())
    shd = spatial_image_sharding(mesh, axis_name)
    return jax.jit(apply_fn, in_shardings=(rep, shd))


def pad_height_to(mesh, x, multiple=None):
    """Pad H to a multiple of the mesh size (shard-evenness requirement)."""
    import numpy as np
    n = multiple or mesh.devices.size
    h = x.shape[1]
    pad = (-h) % n
    if pad == 0:
        return x, h
    widths = [(0, 0)] * x.ndim
    widths[1] = (0, pad)
    return np.pad(np.asarray(x), widths), h
