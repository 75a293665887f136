"""Host-side batch loader with worker threads and device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=...,
pin_memory=True)`` (reference pixelssl/task_template/proxy.py:374-380).
TPU-first design:

* sample decode/augment runs in a thread pool (PIL/numpy release the GIL on
  IO and C-level transforms), batches are stacked into contiguous numpy
  arrays;
* a bounded prefetch queue keeps N batches in flight so host preprocessing
  overlaps device compute;
* optional ``device_put_fn`` transfers the *next* batch to device (sharded
  over the mesh) while the current one trains — the classic double-buffered
  input pipeline, so the TPU never waits on PCIe/host.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _stack_samples(samples):
    """Stack [(inp_tuple, gt_tuple), ...] into (inp_tuple, gt_tuple) of
    batched arrays."""
    inp_tuples = [s[0] for s in samples]
    gt_tuples = [s[1] for s in samples]
    inp = tuple(np.stack([t[i] for t in inp_tuples], axis=0)
                for i in range(len(inp_tuples[0])))
    gt = tuple(np.stack([t[i] for t in gt_tuples], axis=0)
               for i in range(len(gt_tuples[0])))
    return inp, gt


class DataLoader(object):
    """Iterate (inp_tuple, gt_tuple) numpy batches from dataset + sampler.

    With ``chunk_steps > 1`` the producer assembles whole multi-step
    dispatch chunks instead: it loads ``chunk_steps`` consecutive step
    batches in one pool pass, writes every sample straight into ONE
    preallocated ``[n_steps, batch, ...]`` array per leaf, and calls
    ``chunk_put_fn`` once — a single host→device transfer per dispatch.
    The per-batch path (8 small stacks, 8 device_puts, plus an on-device
    jnp.stack re-dispatch in the train loop) measured 2.4 s/dispatch on a
    1-core TPU host against ~0.4 s for the same work assembled this way;
    every eliminated call is a tunnel RPC or a redundant 105 MB copy.
    In chunk mode the iterator yields ``('chunk', batch)`` for full
    dispatch chunks and ``('single', batch)`` for the leftover tail
    batches (and for any group with ragged batch sizes).

    Memory note: each prefetch-queue slot then holds a whole dispatch
    chunk (``chunk_steps`` x batch samples), so host/device memory scales
    ``prefetch x chunk_steps x batch``; the iterator therefore divides the
    requested prefetch depth by ``chunk_steps`` (floor 1) — one chunk
    ahead plus the one being assembled is already a double buffer.
    """

    def __init__(self, dataset, batch_sampler, num_workers=0,
                 prefetch=2, device_put_fn=None,
                 chunk_steps=1, chunk_put_fn=None):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self.device_put_fn = device_put_fn
        self.chunk_steps = max(1, chunk_steps)
        self.chunk_put_fn = chunk_put_fn
        # chunk mode without a sharded transfer fn would hand raw numpy
        # ('chunk', ...) payloads to the train loop, which feeds them
        # unsharded to the multi-step dispatch — a silent wrong-layout
        # path; the proxy always pairs the two, enforce it here too
        assert self.chunk_steps == 1 or chunk_put_fn is not None, (
            'DataLoader(chunk_steps=%d) requires chunk_put_fn' % chunk_steps)

    def __len__(self):
        return len(self.batch_sampler)

    def _load_batch(self, idx_batch, pool):
        if pool is not None:
            samples = list(pool.map(self.dataset.__getitem__, idx_batch))
        else:
            samples = [self.dataset[i] for i in idx_batch]
        batch = _stack_samples(samples)
        if self.device_put_fn is not None:
            batch = self.device_put_fn(batch)
        return batch

    def _load_chunk(self, idx_batches, pool):
        """Load ``len(idx_batches)`` equal-size step batches into one
        [n_steps, batch, ...] numpy array per leaf (no intermediate
        per-batch stacks), then transfer once via chunk_put_fn."""
        flat = [i for b in idx_batches for i in b]
        if pool is not None:
            samples = list(pool.map(self.dataset.__getitem__, flat))
        else:
            samples = [self.dataset[i] for i in flat]
        n, bsz = len(idx_batches), len(idx_batches[0])
        first_inp, first_gt = samples[0]
        inp = tuple(np.empty((n, bsz) + a.shape, np.asarray(a).dtype)
                    for a in first_inp)
        gt = tuple(np.empty((n, bsz) + a.shape, np.asarray(a).dtype)
                   for a in first_gt)
        k = 0
        for s in range(n):
            for b in range(bsz):
                si, sg = samples[k]
                k += 1
                for t, a in enumerate(si):
                    inp[t][s, b] = a
                for t, a in enumerate(sg):
                    gt[t][s, b] = a
        batch = (inp, gt)
        if self.chunk_put_fn is not None:
            batch = self.chunk_put_fn(batch)
        return batch

    def __iter__(self):
        pool = (ThreadPoolExecutor(max_workers=self.num_workers)
                if self.num_workers > 0 else None)
        # in chunk mode a slot is chunk_steps batches — scale the queue
        # depth down so memory stays ~prefetch batches either way
        depth = max(1, self.prefetch // self.chunk_steps)
        out_q = queue.Queue(maxsize=depth)
        _END = object()
        error = []
        stop = threading.Event()

        def _put(item):
            # bounded put that gives up if the consumer abandoned the
            # iterator (exception/interrupt mid-epoch) — otherwise the
            # producer would block forever on the full queue and leak the
            # thread + pool every abandoned epoch
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                if self.chunk_steps > 1:
                    pending = []
                    for idx_batch in self.batch_sampler:
                        pending.append(idx_batch)
                        if len(pending) < self.chunk_steps:
                            continue
                        if all(len(b) == len(pending[0]) for b in pending):
                            item = ('chunk', self._load_chunk(pending, pool))
                            if not _put(item):
                                return
                        else:  # ragged batch sizes: step-batch fallback
                            for ib in pending:
                                if not _put(('single',
                                             self._load_batch(ib, pool))):
                                    return
                        pending = []
                    for idx_batch in pending:  # leftover tail (< one chunk)
                        item = ('single', self._load_batch(idx_batch, pool))
                        if not _put(item):
                            return
                else:
                    for idx_batch in self.batch_sampler:
                        if not _put(self._load_batch(idx_batch, pool)):
                            return
            except BaseException as e:  # surfaced in consumer
                error.append(e)
            finally:
                _put(_END)
                if pool is not None:
                    pool.shutdown(wait=False)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is _END:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            stop.set()
