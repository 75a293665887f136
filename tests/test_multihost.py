"""Multi-host input-pipeline sharding (parallel/multihost.py).

The slicing contract is pure math, so it is fully verifiable in one
process: the concatenation of every process's sliced index batch, in mesh
order, must equal the single-host reorder_two_stream layout — i.e. the
global sharded array assembled from per-host loads is bit-identical to
the single-host path's.
"""

import numpy as np

import jax

from pixelssl_tpu import parallel
from pixelssl_tpu.parallel import multihost


def test_process_batch_indices_partitions_reorder_two_stream():
    lbs, ubs, n_dev = 8, 4, 4
    idx_batch = list(range(100, 100 + lbs)) + list(range(500, 500 + ubs))

    # single-host reference layout: reorder_two_stream on the index vector
    ref = parallel.reorder_two_stream(np.asarray(idx_batch), lbs, ubs, n_dev)

    # simulate 2 hosts owning mesh positions [0,1] and [2,3]
    got = []
    for positions in ([0, 1], [2, 3]):
        got.extend(multihost.process_batch_indices(
            idx_batch, lbs, ubs, positions, n_dev))
    np.testing.assert_array_equal(np.asarray(got), ref)

    # ubs=0 (SupOnly / one-stream) degenerates cleanly: no unlabeled
    # stream → per-device chunks in original order
    one = list(range(8))
    got = []
    for positions in ([0], [1], [2], [3]):
        got.extend(multihost.process_batch_indices(one, 8, 0, positions, 4))
    assert got == one


def test_process_sharded_sampler_wraps_batches():
    class FakeSampler(object):
        def __len__(self):
            return 2

        def __iter__(self):
            yield list(range(12))       # 8 labeled + 4 unlabeled
            yield list(range(20, 32))

    s = multihost.ProcessShardedSampler(FakeSampler(), 8, 4,
                                        positions=[1, 3], n_dev=4)
    batches = list(s)
    assert len(s) == 2 and len(batches) == 2
    # position 1 → labeled [2:4] + unlabeled [8+1:8+2]; position 3 →
    # labeled [6:8] + unlabeled [8+3:8+4]
    assert batches[0] == [2, 3, 9, 6, 7, 11]


def test_put_local_batch_matches_shard_batch_single_process():
    mesh = parallel.make_mesh()
    n = mesh.devices.size
    batch = {'inp': (np.arange(n * 6, dtype=np.float32).reshape(n, 3, 2),),
             'gt': (np.arange(n * 2, dtype=np.int32).reshape(n, 2),)}
    a = multihost.put_local_batch(batch, mesh)
    b = parallel.shard_batch(batch, mesh)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert x.sharding == y.sharding


def test_local_device_positions_single_process_is_all():
    mesh = parallel.make_mesh()
    assert multihost.local_device_positions(mesh) == list(
        range(mesh.devices.size))


def test_initialize_is_noop_single_process():
    multihost.initialize(args=None)  # must not raise
    assert not multihost.is_multihost()


def test_initialize_skips_when_backend_already_distributed(monkeypatch):
    """A launcher/test harness that already called
    jax.distributed.initialize() must not be re-initialized (the e2e
    worker pre-initializes, tests/_multihost_worker.py)."""
    calls = []
    monkeypatch.setattr(jax.distributed, 'is_initialized', lambda: True)
    monkeypatch.setattr(jax.distributed, 'initialize',
                        lambda *a, **k: calls.append(1))
    import argparse
    multihost.initialize(argparse.Namespace(distributed=True))
    assert calls == []


def test_initialize_fails_fast_when_distributed_requested(monkeypatch):
    """--distributed with an unusable coordinator must fail loudly, not
    silently train one independent copy per host (the pre-fix failure
    mode: the backend was initialized by the guard's own process_count()
    probe, jax.distributed.initialize() raised, and the except swallowed
    it)."""
    import argparse
    import pytest

    def boom(*a, **k):
        raise RuntimeError('coordinator unreachable')

    monkeypatch.setattr(jax.distributed, 'is_initialized', lambda: False)
    monkeypatch.setattr(jax.distributed, 'initialize', boom)
    with pytest.raises(SystemExit):
        multihost.initialize(argparse.Namespace(distributed=True))
    # bare probe (args=None) still degrades gracefully
    multihost.initialize(args=None)


def test_gather_for_host_replicates_sharded_tree():
    """ssl_base._gather_for_host: a P('data')-sharded tree comes back
    fully replicated (the multi-host validate path's collective gather)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = parallel.make_mesh()
    n = mesh.devices.size
    x = np.arange(n * 4, dtype=np.float32).reshape(n, 4)
    sharded = jax.device_put(x, NamedSharding(mesh, P(parallel.DATA_AXIS)))

    class _Ctx(object):
        pass

    class _Algo(object):
        ctx = _Ctx()
    _Algo.ctx.mesh = mesh

    from pixelssl_tpu.ssl_algorithm.ssl_base import SSLBase
    gathered = SSLBase._gather_for_host(_Algo(), {'a': sharded})
    assert gathered['a'].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(gathered['a']), x)
