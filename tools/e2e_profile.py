"""Phase-level breakdown of the real-input e2e training loop.

tools/e2e_tpu_bench.py measures ~0.25 s/step on this host while the
known costs (augment 0.32 s + transfer 0.08 s + compute 0.13 s +
dispatch RPC ~0.1 s per 8-step chunk) only add to ~0.7 s of the
observed ~2 s/dispatch — this tool finds the rest. It rebuilds the
proxy's exact input path (two-stream sampler -> chunk-mode DataLoader ->
shard_step_chunk) and times each phase separately:

  load     - dataset decode+augment for one chunk, pool only (no device)
  assemble - _load_chunk minus the device put (numpy packing)
  put      - chunk_put_fn (host->device transfer, blocked)
  step     - _multi_step dispatch + block_until_ready
  loop     - the real consumer loop wait per chunk (everything overlapped)

Prints one JSON line. Run it on the real chip.
"""

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, '..'))

import numpy as np

from loader_bench import make_fixture


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--labeled', type=int, default=256)
    p.add_argument('--unlabeled-images', type=int, default=128)
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--unlabeled', type=int, default=4)
    p.add_argument('--im', type=int, default=321)
    p.add_argument('--backbone', default='resnet101')
    p.add_argument('--workers', type=int, default=4)
    p.add_argument('--dispatch', type=int, default=8)
    p.add_argument('--u8', type=int, default=0)
    p.add_argument('--chunks', type=int, default=6,
                   help='measured chunks per phase')
    opts = p.parse_args()

    import tempfile

    import jax

    from pixelssl_tpu import harness, parallel
    from pixelssl_tpu.nn import loader as nnloader
    from pixelssl_tpu.nn.data import SplitUnlabeledWrapper, TwoStreamBatchSampler
    from pixelssl_tpu.tasks.sseg import data as sseg_data
    from pixelssl_tpu.utils import env as _env

    _env.enable_compile_cache(os.path.join(_HERE, '..', '.jax_cache'))

    root = tempfile.mkdtemp(prefix='e2e_profile_')
    n_images = opts.labeled + opts.unlabeled_images
    names = make_fixture(root, n_images)

    mesh = parallel.make_mesh()
    n_dev = mesh.devices.size
    lbs = (opts.batch - opts.unlabeled) * n_dev
    ubs = opts.unlabeled * n_dev

    args = harness.default_args(
        'ssl_mt', backbone=opts.backbone, im_size=opts.im, num_classes=21,
        batch_size=opts.batch * n_dev, unlabeled_batch_size=ubs,
        ignore_unlabeled=False, steps_per_dispatch=opts.dispatch,
        cons_scale=1.0, cons_rampup_epochs=3, ema_decay=0.99,
        lr=0.00025, momentum=0.9, weight_decay=0.0005, epochs=20,
        trainset={'pascalvoc': [root]}, valset={'pascalvoc': [root]},
        train_base_size=400, val_rescaling=False, native_augment=True,
        u8_transfer=bool(opts.u8), seed=1)
    algo = harness.build_algorithm(args, mesh=mesh, iters_per_epoch=100)

    ds = sseg_data.PascalVocAugDataset(args, is_train=True)
    trainset = SplitUnlabeledWrapper(ds, names[:opts.labeled])
    sampler = TwoStreamBatchSampler(
        trainset.labeled_idxs, trainset.unlabeled_idxs, lbs, ubs, seed=1)

    def chunk_put(np_chunk):
        inp, gt = np_chunk
        if ubs > 0 and n_dev > 1:
            inp = tuple(parallel.reorder_two_stream_steps(a, lbs, ubs, n_dev)
                        for a in inp)
            gt = tuple(parallel.reorder_two_stream_steps(a, lbs, ubs, n_dev)
                       for a in gt)
        return parallel.shard_step_chunk({'inp': inp, 'gt': gt}, mesh)

    dl = nnloader.DataLoader(trainset, sampler, num_workers=opts.workers,
                             chunk_steps=opts.dispatch, chunk_put_fn=chunk_put)

    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=opts.workers)
    idx_batches = [b for _, b in zip(range(opts.dispatch * opts.chunks),
                                     iter(sampler))]
    chunks = [idx_batches[i:i + opts.dispatch]
              for i in range(0, len(idx_batches), opts.dispatch)]

    # phase: load (decode+augment only, via the pool like the loader does)
    for b in chunks[0]:
        list(pool.map(trainset.__getitem__, b))  # warm
    t0 = time.perf_counter()
    for ch in chunks:
        flat = [i for b in ch for i in b]
        list(pool.map(trainset.__getitem__, flat))
    t_load = (time.perf_counter() - t0) / len(chunks)

    # phase: assemble (numpy packing, no put) — _load_chunk includes
    # chunk_put, so time it with the put stripped and subtract the load
    orig_put, dl.chunk_put_fn = dl.chunk_put_fn, None
    try:
        t0 = time.perf_counter()
        payloads = [dl._load_chunk(ch, pool) for ch in chunks]
        t_asm = (time.perf_counter() - t0) / len(chunks)
    finally:
        dl.chunk_put_fn = orig_put
    t_asm_only = max(0.0, t_asm - t_load)

    print('load_s=%.3f assemble_extra_s=%.3f' % (t_load, t_asm_only),
          flush=True)

    # phase: put (host->device, blocked). One chunk at a time — keeping
    # every chunk alive on device while timing skews allocator behavior.
    dev = chunk_put(payloads[0])
    jax.block_until_ready(dev)
    del dev
    t0 = time.perf_counter()
    for pl in payloads:
        dev = chunk_put(pl)
        jax.block_until_ready(dev)
        del dev
    t_put = (time.perf_counter() - t0) / len(payloads)
    print('put_s=%.3f' % t_put, flush=True)

    # phase: step (dispatch + block; fresh put per step like production)
    state = algo.state
    dev = chunk_put(payloads[0])
    state, metrics = algo._multi_step(state, dev)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for pl in payloads:
        dev = chunk_put(pl)
        state, metrics = algo._multi_step(state, dev)
        jax.block_until_ready(metrics)
    t_steppute = (time.perf_counter() - t0) / len(payloads)
    t_step = max(0.0, t_steppute - t_put)
    print('step_s=%.3f (put+step=%.3f)' % (t_step, t_steppute), flush=True)
    del payloads, dev

    # phase: loop (the real overlapped consumer loop)
    n_loop = 0
    metrics = None
    t0 = time.perf_counter()
    for item in dl:
        tag, payload = item
        if tag != 'chunk':
            continue
        state, metrics = algo._multi_step(state, payload)
        n_loop += 1
        if n_loop >= opts.chunks * 2:
            break
    if metrics is not None:
        jax.block_until_ready(metrics)
    t_loop = (time.perf_counter() - t0) / max(1, n_loop)

    print(json.dumps({
        'metric': 'e2e_phase_breakdown_per_dispatch_chunk',
        'config': '%s@%d b%d+%d x%d steps u8=%d workers=%d' % (
            opts.backbone, opts.im, opts.batch, opts.unlabeled,
            opts.dispatch, opts.u8, opts.workers),
        'load_s': round(t_load, 3),
        'assemble_extra_s': round(t_asm_only, 3),
        'put_s': round(t_put, 3),
        'step_s': round(t_step, 3),
        'sum_s': round(t_load + t_asm_only + t_put + t_step, 3),
        'loop_s': round(t_loop, 3),
        'loop_steps_per_s': round(opts.dispatch / t_loop, 2),
        'loop_samples_per_s': round(
            opts.dispatch * opts.batch * n_dev / t_loop, 1),
    }), flush=True)

    import shutil
    shutil.rmtree(root, ignore_errors=True)


if __name__ == '__main__':
    main()
