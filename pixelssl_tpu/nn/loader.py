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
    """Iterate (inp_tuple, gt_tuple) numpy batches from dataset + sampler."""

    def __init__(self, dataset, batch_sampler, num_workers=0,
                 prefetch=2, device_put_fn=None):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self.device_put_fn = device_put_fn

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

    def __iter__(self):
        pool = (ThreadPoolExecutor(max_workers=self.num_workers)
                if self.num_workers > 0 else None)
        out_q = queue.Queue(maxsize=self.prefetch)
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
