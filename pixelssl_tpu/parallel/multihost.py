"""Multi-host (TPU pod) data parallelism.

The reference is strictly single-process multi-GPU (`nn.DataParallel`,
reference pixelssl/nn/func.py:54-62) — multi-node training does not exist
there (SURVEY.md §2.5). This module extends the mesh data-parallel layer
(parallel/mesh.py) across hosts, the TPU-native way:

* ONE global 1-D ``Mesh`` over ``jax.devices()`` (all chips of the pod);
  the jitted train step and its ``pmean``/``psum`` collectives are
  unchanged — XLA routes them over ICI within a slice and DCN across
  slices automatically.
* Each host's loader only decodes/augments the samples destined for its
  OWN chips: the sampler's global two-stream index batch is sliced by
  mesh position (``process_batch_indices``), preserving the per-device
  labeled-first block layout that ``reorder_two_stream`` produces in the
  single-host path.
* The sliced host-local numpy batch becomes a global sharded array with
  ``jax.make_array_from_process_local_data`` (``put_local_batch``) — no
  host ever materializes the full global batch.

Determinism across hosts: every process seeds the identical sampler, so
all hosts walk the same global index sequence and slice disjoint parts of
it — no cross-host coordination in the input pipeline at all.

Launch: run the same experiment script on every pod worker with
``('distributed', True)`` in the config (or ``--distributed``); this calls
``jax.distributed.initialize()``, which auto-discovers the coordinator on
TPU pods.
"""

import jax
import numpy as np

from .mesh import DATA_AXIS, batch_sharding


def initialize(args=None):
    """Call jax.distributed.initialize() once, if requested/needed.

    Safe to call in single-process runs (no-op). On TPU pods
    jax.distributed.initialize() discovers coordinator/process_id from the
    TPU environment without arguments.

    MUST run before anything that initializes the XLA backend — even
    ``jax.process_count()``/``jax.devices()`` counts: once the backend is
    up, ``jax.distributed.initialize()`` raises and the pod silently
    degrades to N independent single-process runs. Hence the
    ``is_initialized()`` probe (backend-free) rather than a
    ``process_count()`` check here.
    """
    if args is not None and not getattr(args, 'distributed', False):
        return
    if jax.distributed.is_initialized():
        return  # a launcher / test harness already formed the backend
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError) as exc:
        if args is not None:
            # --distributed was explicitly requested: misconfiguration
            # (e.g. backend already up, or no coordinator reachable) must
            # fail fast, not silently train one independent copy per host
            from ..utils import logger
            logger.log_err(
                '--distributed was set but jax.distributed.initialize() '
                'failed: {0}\n  Launch the same script on every pod '
                'worker and make sure no JAX computation runs before the '
                'proxy is constructed.'.format(exc))
        # bare probe (args=None): single-process environment — run locally


def is_multihost():
    return jax.process_count() > 1


def local_device_positions(mesh):
    """Mesh-order positions of THIS process's devices in the 1-D mesh."""
    pid = jax.process_index()
    return [i for i, dev in enumerate(mesh.devices.flat)
            if dev.process_index == pid]


def process_batch_indices(idx_batch, lbs, ubs, positions, n_dev):
    """Slice a global two-stream index batch down to one process.

    ``idx_batch`` is the sampler's global batch: ``lbs`` labeled indices
    followed by ``ubs`` unlabeled (nn/data.py TwoStreamBatchSampler
    contract). Device at mesh position ``d`` owns labeled chunk ``d`` and
    unlabeled chunk ``d`` — the same assignment reorder_two_stream
    (parallel/mesh.py) makes on a single host. The returned list is the
    concatenation of [labeled_chunk_d ++ unlabeled_chunk_d] for this
    process's ``positions``, i.e. already in per-device labeled-first
    order: the loaded array is exactly this process's shard of the global
    sharded batch, no further reordering needed.
    """
    idx_batch = list(idx_batch)
    assert len(idx_batch) == lbs + ubs, (len(idx_batch), lbs, ubs)
    assert lbs % n_dev == 0 and ubs % n_dev == 0, (
        'labeled/unlabeled batch sizes must divide the mesh size '
        '(lbs={0}, ubs={1}, n_dev={2})'.format(lbs, ubs, n_dev))
    lbs_l, ubs_l = lbs // n_dev, ubs // n_dev
    out = []
    for d in positions:
        out.extend(idx_batch[d * lbs_l:(d + 1) * lbs_l])
        out.extend(idx_batch[lbs + d * ubs_l:lbs + (d + 1) * ubs_l])
    return out


class ProcessShardedSampler(object):
    """Wrap a (two-stream) batch sampler so each process yields only the
    index slice destined for its own devices. len() is unchanged — every
    process sees the same number of (smaller) batches."""

    def __init__(self, sampler, lbs, ubs, positions, n_dev):
        self.sampler = sampler
        self.lbs, self.ubs = lbs, ubs
        self.positions = positions
        self.n_dev = n_dev

    def __len__(self):
        return len(self.sampler)

    def __iter__(self):
        for idx_batch in self.sampler:
            yield process_batch_indices(idx_batch, self.lbs, self.ubs,
                                        self.positions, self.n_dev)


def put_local_batch(tree, mesh, axis_name=DATA_AXIS):
    """Host-local numpy batch -> global array sharded over the mesh axis.

    Single-host this is exactly ``shard_batch``; multi-host it assembles
    the global array from each process's local rows without replicating
    the global batch on any host.
    """
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.ascontiguousarray(x)), tree)
