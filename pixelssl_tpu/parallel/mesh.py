"""Device-mesh data parallelism: the DataParallel+SyncBN replacement.

The reference parallelizes by wrapping every module in
``torch.nn.DataParallel`` and rendezvousing BN statistics through a
master/slave thread queue (reference: pixelssl/nn/func.py:54-62,
pixelssl/nn/module/third_party/sync_batchnorm/comm.py:56-129). Here the
entire train step is ONE pure jitted function ``shard_map``-ped over a
``jax.sharding.Mesh`` axis ``'data'``:

* the global two-stream batch is sharded over the mesh axis (each device
  receives its own labeled-first sub-batch, see ``reorder_two_stream``);
* gradients are all-reduced with ``lax.pmean`` over ICI (one fused XLA
  collective per step, vs DataParallel's per-forward scatter/gather);
* BN statistics sync with a ``psum`` of (sum, ssum, count) inside the BN
  layer (models/layers.py) — functionally the reference SyncBN
  (batchnorm.py:59-68) without host threads.

The lr/batch "GPU scaling" of the reference proxy (proxy.py:252-261) maps to
global-batch semantics here: config batch sizes are per-device, the global
batch is config × n_devices.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

DATA_AXIS = 'data'


def make_mesh(n_devices=None, devices=None, axis_name=DATA_AXIS):
    """Build a 1-D data-parallel mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicate_sharding(mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh, axis_name=DATA_AXIS):
    return NamedSharding(mesh, P(axis_name))


def replicate(tree, mesh):
    """Place a pytree fully-replicated on the mesh."""
    sh = replicate_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_batch(tree, mesh, axis_name=DATA_AXIS):
    """Shard every leaf of a batch pytree along its leading dim."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def reorder_two_stream(arr, lbs, ubs, n_dev):
    """Re-block a global two-stream batch for contiguous sharding.

    The host batch is ordered [L0..L_{lbs-1}, U0..U_{ubs-1}] (sampler
    contract, nn/data.py). Contiguous sharding over dim 0 would give device
    0 only labeled samples; instead each device must see a local
    labeled-first batch of (lbs/n, ubs/n). This reorders to
    ``concat_d [L_chunk_d ++ U_chunk_d]`` so a plain P('data') shard yields
    exactly that. Numpy, host-side, O(batch) copy folded into the device_put.
    """
    assert lbs % n_dev == 0 and ubs % n_dev == 0, (
        'labeled/unlabeled batch sizes must divide the mesh size '
        '(lbs={0}, ubs={1}, n_dev={2})'.format(lbs, ubs, n_dev))
    lbs_l, ubs_l = lbs // n_dev, ubs // n_dev
    labeled = arr[:lbs]
    unlabeled = arr[lbs:lbs + ubs]
    chunks = []
    for d in range(n_dev):
        chunks.append(labeled[d * lbs_l:(d + 1) * lbs_l])
        chunks.append(unlabeled[d * ubs_l:(d + 1) * ubs_l])
    return np.concatenate(chunks, axis=0)


def reorder_two_stream_steps(arr, lbs, ubs, n_dev):
    """``reorder_two_stream`` applied along axis 1 of a
    ``[n_steps, global_batch, ...]`` multi-step dispatch chunk (the
    chunked loader path, nn/loader.DataLoader chunk mode)."""
    assert lbs % n_dev == 0 and ubs % n_dev == 0, (
        'labeled/unlabeled batch sizes must divide the mesh size '
        '(lbs={0}, ubs={1}, n_dev={2})'.format(lbs, ubs, n_dev))
    lbs_l, ubs_l = lbs // n_dev, ubs // n_dev
    labeled = arr[:, :lbs]
    unlabeled = arr[:, lbs:lbs + ubs]
    chunks = []
    for d in range(n_dev):
        chunks.append(labeled[:, d * lbs_l:(d + 1) * lbs_l])
        chunks.append(unlabeled[:, d * ubs_l:(d + 1) * ubs_l])
    return np.concatenate(chunks, axis=1)


def shard_step_chunk(tree, mesh, axis_name=DATA_AXIS):
    """Place a [n_steps, global_batch, ...] chunk: scan axis replicated,
    batch axis sharded — one transfer per multi-step dispatch."""
    sh = NamedSharding(mesh, P(None, axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


_TOUCH_FN = None


def touch_tree(tree):
    """Force lazy host→device transfers to materialize NOW, and block.

    On the tunnel-attached runtime ``device_put`` is lazy: the bytes move
    when a compiled program first CONSUMES the buffer (~30-50 MB/s
    effective), not at put time — measured in BASELINE.md's ingest probes
    (``tools/dispatch_overhead_probe.py`` variants A-E). Left alone, that
    serializes the whole transfer into the next train dispatch. Running a
    trivial consuming reduction here — from the loader thread, right
    after the put — moves the materialization into the loader thread,
    where it overlaps the previous dispatch's device compute.

    On runtimes with eager puts (PCIe-attached hosts, CPU) this is one
    cheap extra scalar-per-leaf dispatch. Returns ``tree`` unchanged.
    """
    global _TOUCH_FN
    if _TOUCH_FN is None:
        # sum-reduce every leaf to a scalar: guarantees the full buffer is
        # consumed (a single-element slice might legally fetch less), and
        # is negligible device work at any batch size
        _TOUCH_FN = jax.jit(
            lambda leaves: [l.astype(jax.numpy.float32).sum()
                            for l in leaves])
    jax.block_until_ready(_TOUCH_FN(jax.tree.leaves(tree)))
    return tree


def pmean_if_parallel(tree, axis_name):
    if axis_name is None:
        return tree
    return jax.lax.pmean(tree, axis_name)


def psum_if_parallel(tree, axis_name):
    if axis_name is None:
        return tree
    return jax.lax.psum(tree, axis_name)


def fold_rng(rng, axis_name):
    """Derive a per-device RNG key inside shard_map."""
    if axis_name is None:
        return rng
    return jax.random.fold_in(rng, jax.lax.axis_index(axis_name))


def parallel_step(step_fn, mesh, axis_name=DATA_AXIS, donate_state=True):
    """Wrap ``step_fn(state, batch) -> (state, metrics)`` for the mesh.

    ``step_fn`` must already be written against ``axis_name`` (grads/metrics
    pmean'd inside; per-step RNG lives in the state and is folded with the
    step counter and axis index). State is replicated, the batch is sharded
    on dim 0, outputs are replicated. The result is jitted once; XLA lays
    the pmean collectives on ICI.
    """
    mapped = shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False)
    donate = (0,) if donate_state else ()
    return jax.jit(mapped, donate_argnums=donate)


def parallel_multi_step(step_fn, mesh, n_steps, axis_name=DATA_AXIS,
                        donate_state=True):
    """Fuse ``n_steps`` train steps into one dispatch with ``lax.scan``.

    The batch argument carries a leading scan axis: every leaf is
    [n_steps, global_batch, ...]. One host→device dispatch then runs
    n_steps full iterations back-to-back on device — the standard TPU
    technique for hiding host/dispatch latency (the reference pays ≥1
    Python dispatch plus DataParallel scatter/gather per iteration).
    Returns (state, last_step_metrics).
    """
    import jax as _jax

    def scanned(state, batches):
        def body(s, b):
            s2, m = step_fn(s, b)
            return s2, m
        state, metrics = _jax.lax.scan(body, state, batches)
        last = _jax.tree.map(lambda x: x[-1], metrics)
        return state, last

    mapped = shard_map(
        scanned, mesh=mesh,
        in_specs=(P(), P(None, axis_name)),
        out_specs=(P(), P()),
        check_vma=False)
    donate = (0,) if donate_state else ()
    return jax.jit(mapped, donate_argnums=donate)


def parallel_eval_step(step_fn, mesh, axis_name=DATA_AXIS):
    """Same for ``eval_fn(state, batch) -> outputs`` (outputs sharded)."""
    mapped = shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False)
    return jax.jit(mapped)
