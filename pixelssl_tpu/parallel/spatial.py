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
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

SPATIAL_AXIS = 'spatial'


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


# ----------------------------------------------------------------------
# Spatially-sharded TRAINING (--spatial-train): 2-D ('data','spatial') mesh
# ----------------------------------------------------------------------
#
# The train step functions (ssl_algorithm/*._step_fn) are pure and, with
# ctx.axis_name=None, collective-free: losses are plain means over the
# batch they see and BN statistics come from SyncBatchNorm's local
# reduction (models/layers.py:77-85). Handing that SAME function the
# GLOBAL batch under ``jit`` with the inputs committed to a 2-D mesh —
# batch dim on 'data', image H on 'spatial' — makes the XLA partitioner
# derive every collective itself: conv halo exchanges along H, BN-stat
# and loss AllReduces, gradient reduction into the replicated parameter
# update. Functionally identical to the shard_map data path (SyncBN psum
# == global batch statistics; pmean(grad) == grad of the global mean),
# but activations are 1/n_spatial per device, which is what lets
# high-resolution training (513px+ PSPNet) scale past one chip's HBM
# without shrinking the batch. The reference has no analog — its only
# answer to activation memory is a smaller per-GPU batch.


def make_mesh_2d(n_spatial, devices=None):
    """('data', 'spatial') mesh: n_devices/n_spatial × n_spatial."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices).reshape(-1)
    n = devices.size
    if n_spatial < 1 or n % n_spatial != 0:
        raise ValueError('spatial axis size {0} must divide the device '
                         'count {1}'.format(n_spatial, n))
    return Mesh(devices.reshape(n // n_spatial, n_spatial),
                (DATA_AXIS, SPATIAL_AXIS))


def is_spatial_mesh(mesh):
    return SPATIAL_AXIS in mesh.axis_names


def data_axis_size(mesh):
    """Devices along 'data' — the batch-scaling factor under spatial
    training (the proxy's ×n_devices batch/lr scaling uses this, not the
    total device count: spatial shards split work, not batch)."""
    return mesh.shape[DATA_AXIS] if is_spatial_mesh(mesh) else mesh.devices.size


def train_leaf_sharding(mesh, leaf):
    """[N,H,...] leaves shard batch on 'data' and H on 'spatial'; [N]/[N,k]
    leaves shard batch only; scalars replicate."""
    if leaf.ndim >= 3:
        spec = P(DATA_AXIS, SPATIAL_AXIS, *([None] * (leaf.ndim - 2)))
    elif leaf.ndim >= 1:
        spec = P(DATA_AXIS)
    else:
        spec = P()
    return NamedSharding(mesh, spec)


def shard_train_batch(tree, mesh):
    """Place a GLOBAL (labeled-first, un-reordered) batch pytree on the 2-D
    mesh. No ``reorder_two_stream``: the step slices the global labeled
    block ``[0:lbs]`` itself and XLA rebalances the sliced operand."""
    return jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), train_leaf_sharding(mesh, np.asarray(x))),
        tree)


def chunk_train_leaf_sharding(mesh, leaf):
    """``train_leaf_sharding`` for leaves carrying a leading [n_steps]
    scan axis (chunked multi-step dispatch): the scan axis replicates,
    batch shards on 'data', H on 'spatial'."""
    if leaf.ndim >= 4:
        spec = P(None, DATA_AXIS, SPATIAL_AXIS, *([None] * (leaf.ndim - 3)))
    elif leaf.ndim >= 2:
        spec = P(None, DATA_AXIS)
    else:
        spec = P()
    return NamedSharding(mesh, spec)


def shard_train_chunk(tree, mesh):
    """shard_train_batch for a whole [n_steps, batch, ...] dispatch chunk
    — one host→device transfer per multi-step dispatch."""
    return jax.tree.map(
        lambda x: jax.device_put(
            np.asarray(x), chunk_train_leaf_sharding(mesh, np.asarray(x))),
        tree)


def gspmd_train_step(step_fn, mesh, donate_state=True):
    """Jit ``step_fn(state, batch) -> (state, metrics)`` (written with
    ctx.axis_name=None) for the 2-D mesh. Inputs arrive committed
    (shard_train_batch / replicated state); outputs are replicated."""
    rep = NamedSharding(mesh, P())
    donate = (0,) if donate_state else ()
    return jax.jit(step_fn, out_shardings=(rep, rep), donate_argnums=donate)


def gspmd_multi_step(step_fn, mesh, n_steps, donate_state=True):
    """lax.scan fusion of n_steps global-batch steps (mesh.parallel_multi_step
    semantics under GSPMD): batch leaves carry a leading [n_steps] scan axis."""
    rep = NamedSharding(mesh, P())

    def scanned(state, batches):
        def body(s, b):
            s2, m = step_fn(s, b)
            return s2, m
        state, metrics = jax.lax.scan(body, state, batches)
        return state, jax.tree.map(lambda x: x[-1], metrics)

    donate = (0,) if donate_state else ()
    return jax.jit(scanned, out_shardings=(rep, rep), donate_argnums=donate)


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
