"""Host input-pipeline throughput bench: images/s through the two-stream
train loader (decode + scale-crop-flip-normalize + batch stacking).

The device side of the flagship config consumes
``steps_per_sec_per_chip * samples_per_step`` images per second per chip
(BASELINE.md round-2 rows: 62 steps/s x 12 samples = ~745 img/s/chip for
Mean Teacher at per-chip batch 8+4), so the host loader must sustain that
rate x mesh size or the TPU starves. This tool measures the loader alone
on a synthetic VOC-scale fixture (500x375 JPEGs — the PASCAL VOC modal
size; reference pipeline: task/sseg/data.py:223-256 + torch DataLoader,
proxy.py:374-380).

Usage::

    python tools/loader_bench.py [--n-images 96] [--batch 8] [--unlabeled 4]
        [--workers 1 2 4 8] [--native 0 1] [--epochs 3]

Prints one JSON line per (workers, native) combination.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))


def make_fixture(root, n_images, h=375, w=500, seed=0):
    from PIL import Image
    img_dir = os.path.join(root, 'JPEGImages')
    lbl_dir = os.path.join(root, 'SegmentationClassAug')
    set_dir = os.path.join(root, 'ImageSets', 'Segmentation')
    for d in (img_dir, lbl_dir, set_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    names = []
    for i in range(n_images):
        name = 'img_{0:06d}'.format(i)
        names.append(name)
        # smooth-ish content so JPEG size/decode cost is photo-like rather
        # than worst-case noise
        base = rng.integers(0, 255, (h // 25, w // 25, 3), np.uint8)
        img = np.asarray(Image.fromarray(base).resize((w, h), Image.BILINEAR))
        Image.fromarray(img).save(os.path.join(img_dir, name + '.jpg'),
                                  quality=90)
        lbl = rng.integers(0, 21, (h, w)).astype(np.uint8)
        Image.fromarray(lbl, mode='L').save(os.path.join(lbl_dir, name + '.png'))
    listing = '\n'.join(names) + '\n'
    with open(os.path.join(set_dir, 'train_aug.txt'), 'w') as f:
        f.write(listing)
    with open(os.path.join(set_dir, 'val.txt'), 'w') as f:
        f.write(listing)
    return names


def bench(root, names, batch, unlabeled, workers, native, epochs, im_size):
    import argparse as ap
    from pixelssl_tpu.tasks.sseg import data as sseg_data
    from pixelssl_tpu.nn.data import (SplitUnlabeledWrapper,
                                      TwoStreamBatchSampler)
    from pixelssl_tpu.nn.loader import DataLoader

    args = ap.Namespace(
        trainset={'pascalvoc': root}, valset={'pascalvoc': root},
        im_size=im_size, train_base_size=400, val_rescaling=False,
        native_augment=bool(native), seed=1, ignore_index=255,
        num_classes=21)
    ds = sseg_data.PascalVocAugDataset(args, is_train=True)

    n_lab = max(batch - unlabeled, 1)
    lab_prefix = names[:len(names) // 2]
    wrapper = SplitUnlabeledWrapper(ds, lab_prefix)
    sampler = TwoStreamBatchSampler(
        wrapper.labeled_idxs, wrapper.unlabeled_idxs, n_lab, unlabeled,
        seed=1)
    loader = DataLoader(wrapper, sampler, num_workers=workers)

    # warmup epoch (thread pool spinup, page cache)
    for _ in loader:
        pass
    t0 = time.perf_counter()
    n = 0
    for _ in range(epochs):
        for b in loader:
            n += b[0][0].shape[0]
    dt = time.perf_counter() - t0
    return n / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n-images', type=int, default=96)
    p.add_argument('--batch', type=int, default=8, help='labeled+unlabeled')
    p.add_argument('--unlabeled', type=int, default=4)
    p.add_argument('--im-size', type=int, default=321)
    p.add_argument('--workers', type=int, nargs='+', default=[1, 4, 8])
    p.add_argument('--native', type=int, nargs='+', default=[0, 1])
    p.add_argument('--epochs', type=int, default=3)
    p.add_argument('--keep-dir', default='')
    opts = p.parse_args()

    root = opts.keep_dir or tempfile.mkdtemp(prefix='loader_bench_')
    try:
        names = make_fixture(root, opts.n_images)
        for native in opts.native:
            for w in opts.workers:
                ips = bench(root, names, opts.batch, opts.unlabeled, w,
                            native, opts.epochs, opts.im_size)
                print(json.dumps({
                    'workers': w, 'native_augment': bool(native),
                    'crop': opts.im_size,
                    'images_per_sec': round(ips, 1),
                }), flush=True)
    finally:
        if not opts.keep_dir:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == '__main__':
    main()
