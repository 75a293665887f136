"""SSL-gain benchmark: does SSL beat supervised-only on held-out data?

The reference's headline claim is its benchmark table — each SSL
algorithm's val mIoU vs the SupOnly baseline at a labeled subset
(/root/reference/task/sseg/README.md:18-25,34-40). Real VOC and the
COCO-pretrained backbone are unreachable here (zero egress), so this
tool provides the strongest accuracy-direction evidence available
(round-3 verdict item #2): a SYNTHETIC but genuinely learnable
segmentation task with held-out validation, few labels + a large
unlabeled pool, trained from scratch at a matched step budget per
algorithm on the real TPU chip.

Task design — "shapes": each scene is a textured background with 3-6
geometric shapes. The CLASS is the shape's geometry (circle / square /
triangle / cross / bar); fill color, size, rotation, position,
illumination, and sensor noise are nuisance variables. A small labeled
set underdetermines geometry-vs-color invariances, which is exactly the
regime consistency-based SSL targets — and per-pixel class needs shape
context, so the task exercises the real segmentation machinery (the
framework's augmentation pipeline, two-stream sampler, DeepLab head).

Usage:
  python tools/ssl_gain_bench.py gen  --root DIR [--train 512 --val 64]
  python tools/ssl_gain_bench.py run  ALGO --root DIR [--labeled 64]
        [--steps 1500] [--lr 0.007] [--results tools/ssl_gain_results.jsonl]
  python tools/ssl_gain_bench.py report [--results ...]

`run` executes ONE algorithm per process (fresh TPU client; results are
appended incrementally so a crashed run loses nothing) and records the
best and final held-out mIoU. `report` renders the table.
"""

import argparse
import collections
import json
import math
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, '..'))

CLASS_NAMES = ('background', 'circle', 'square', 'triangle', 'cross', 'bar')
NUM_CLASSES = len(CLASS_NAMES)


# ---------------------------------------------------------------------------
# dataset generator
# ---------------------------------------------------------------------------

def _shape_points(cls, r, theta, rng):
    """Polygon vertices (unit center) for shape class `cls` with
    circumradius r, rotated by theta. All shapes are polygons so image
    and label rasterize identically."""
    if cls == 1:      # circle
        ang = np.linspace(0, 2 * np.pi, 28, endpoint=False)
        pts = np.stack([r * np.cos(ang), r * np.sin(ang)], 1)
    elif cls == 2:    # square
        ang = theta + np.array([0.25, 0.75, 1.25, 1.75]) * np.pi
        pts = np.stack([r * np.cos(ang), r * np.sin(ang)], 1)
        theta = 0.0
    elif cls == 3:    # triangle
        ang = theta + np.array([0.5, 0.5 + 2 / 3, 0.5 + 4 / 3]) * np.pi
        pts = np.stack([r * np.cos(ang), r * np.sin(ang)], 1)
        theta = 0.0
    elif cls == 4:    # cross (plus sign)
        w = 0.34 * r
        pts = np.array([
            (-w, -r), (w, -r), (w, -w), (r, -w), (r, w), (w, w),
            (w, r), (-w, r), (-w, w), (-r, w), (-r, -w), (-w, -w)],
            np.float64)
    else:             # bar: eccentric ellipse (vs the circle, geometry
        b = r * float(rng.uniform(0.28, 0.42))
        ang = np.linspace(0, 2 * np.pi, 28, endpoint=False)
        pts = np.stack([r * np.cos(ang), b * np.sin(ang)], 1)
    if theta:
        c, s = np.cos(theta), np.sin(theta)
        pts = pts @ np.array([[c, -s], [s, c]])
    return pts


def _class_color(cls, rng):
    """Class-correlated but AMBIGUOUS color: each class owns a hue band
    centered at (cls-1)/5 with jitter wide enough that neighboring bands
    overlap (band spacing 0.2, jitter +-0.13). Color alone classifies
    most pixels but systematically confuses neighbor classes; geometry
    resolves the overlap zone. That split — an easy cue that saturates
    and a hard cue that needs more data — is the regime where
    consistency SSL has headroom over few-label supervised training."""
    import colorsys
    hue = ((cls - 1) / 5.0 + float(rng.uniform(-0.13, 0.13))) % 1.0
    sat = float(rng.uniform(0.55, 1.0))
    val = float(rng.uniform(0.55, 1.0))
    return np.array(colorsys.hsv_to_rgb(hue, sat, val), np.float32) * 255.0


def _make_scene(rng, size):
    """One (image float, label uint8) scene.

    Earlier designs failed two ways (measured, /tmp/gain_pilot.jsonl):
    fully class-independent shape colors made geometry the ONLY class
    cue, and 5-9 mutually overlapping shapes occluded that geometry —
    from-scratch runs plateaued at the marginal-distribution loss (~1.4)
    and collapsed to all-background mIoU. Now shapes are non-overlapping
    (rejection-sampled placement), fully in bounds, and hue-banded per
    class (see _class_color); the background is desaturated so
    figure-ground is locally learnable."""
    from PIL import Image, ImageDraw

    # low-frequency DESATURATED background: gray base + small color wobble
    base = rng.uniform(60, 180)
    grid = np.clip(base + rng.uniform(-35, 35, (6, 6, 3)), 0, 255)
    bg = Image.fromarray(grid.astype(np.uint8)).resize(
        (size, size), Image.BILINEAR)
    img = np.asarray(bg, np.float32).copy()
    lbl = np.zeros((size, size), np.uint8)

    occupied = np.zeros((size, size), bool)
    placed = 0
    for _attempt in range(40):
        if placed >= 6:
            break
        cls = int(rng.integers(1, NUM_CLASSES))
        r = float(rng.uniform(0.09, 0.17)) * size
        # fully in bounds so the class geometry is never clipped at birth
        cx = float(rng.uniform(r * 1.05, size - r * 1.05))
        cy = float(rng.uniform(r * 1.05, size - r * 1.05))
        theta = float(rng.uniform(0, 2 * np.pi))
        pts = _shape_points(cls, r, theta, rng) + np.array([cx, cy])
        canvas = Image.new('L', (size, size), 0)
        ImageDraw.Draw(canvas).polygon([tuple(p) for p in pts], fill=1)
        m = np.asarray(canvas, bool)
        if not m.any() or (m & occupied).any():
            continue  # rejection sampling: shapes never occlude each other
        color = _class_color(cls, rng)
        # mild linear shading so shapes are not flat color blobs
        yy = (np.arange(size, dtype=np.float32)[:, None] - cy) / max(r, 1.0)
        shade = np.broadcast_to(1.0 + 0.15 * np.clip(yy, -1.5, 1.5),
                                (size, size))
        img[m] = color[None, :] * shade[m][:, None]
        lbl[m] = cls
        occupied |= m
        placed += 1

    gain = float(rng.uniform(0.8, 1.2))
    bias = float(rng.uniform(-12.0, 12.0))
    img = img * gain + bias + rng.normal(0.0, 6.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8), lbl


def generate(root, n_train, n_val, seed, size):
    from PIL import Image
    img_dir = os.path.join(root, 'JPEGImages')
    lbl_dir = os.path.join(root, 'SegmentationClassAug')
    set_dir = os.path.join(root, 'ImageSets', 'Segmentation')
    for d in (img_dir, lbl_dir, set_dir):
        os.makedirs(d, exist_ok=True)

    names = {'train': [], 'val': []}
    for split_id, (split, n) in enumerate((('train', n_train),
                                           ('val', n_val))):
        for i in range(n):
            name = '{0}_{1:06d}'.format(split, i)
            rng = np.random.default_rng((seed, split_id, i))
            img, lbl = _make_scene(rng, size)
            Image.fromarray(img).save(
                os.path.join(img_dir, name + '.jpg'), quality=88)
            Image.fromarray(lbl, mode='L').save(
                os.path.join(lbl_dir, name + '.png'))
            names[split].append(name)

    with open(os.path.join(set_dir, 'train_aug.txt'), 'w') as f:
        f.write('\n'.join(names['train']) + '\n')
    with open(os.path.join(set_dir, 'val.txt'), 'w') as f:
        f.write('\n'.join(names['val']) + '\n')
    # fixed-width ids: name A startswith name B iff A == B, so exact-name
    # sublabeled files are safe prefix lists (nn/data.SplitUnlabeledWrapper)
    for n_lab in (16, 32, 64, 128, 256):
        if n_lab <= n_train:
            with open(os.path.join(root, 'sublabeled_{0}.txt'.format(n_lab)),
                      'w') as f:
                f.write('\n'.join(names['train'][:n_lab]) + '\n')
    print('generated {0} train + {1} val scenes under {2}'.format(
        n_train, n_val, root))


# ---------------------------------------------------------------------------
# matched-budget runs
# ---------------------------------------------------------------------------

# Hyperparameters adapted from the reference benchmark scripts
# (scripts/deeplabv2_pascalvoc_1-8_ssl*.py / pspnet_*_sslc*.py); rampups
# are computed as a fraction of the run's epochs since the step budget is
# far shorter than the reference's 20-45 VOC epochs.
ALGO_DELTAS = {
    'ssl_null': dict(),
    'ssl_mt': dict(cons_for_labeled=False, cons_scale=1.0,
                   ema_decay=0.99, gaussian_noise_std=0.1),
    'ssl_cutmix': dict(cons_type='mse', cons_scale=20.0,
                       cons_threshold=0.97, ema_decay=0.99,
                       mask_prop_range=(0.5, 0.5), cons_rampup_epochs=0),
    'ssl_adv': dict(adv_for_labeled=True, labeled_adv_scale=0.01,
                    unlabeled_adv_scale=0.001, discriminator_lr=1e-4,
                    unlabeled_for_discriminator=True),
    'ssl_s4l': dict(rotated_sup_scale=0.1, rotation_scale=0.1),
    'ssl_gct': dict(ssl_mode='gct', fc_ssl_scale=1.0, dc_ssl_scale=100.0,
                    dc_threshold=0.6, fd_lr=1e-4, fd_scale=10.0,
                    mu=0.5, nu=1),
    'ssl_cct': dict(cons_scale=30.0, ad_lr_scale=10.0, vat_dec_num=1,
                    drop_dec_num=2, cut_dec_num=2, context_dec_num=1,
                    object_dec_num=1, fn_dec_num=2, fd_dec_num=2),
}
_RAMPUP_KEY = {'ssl_mt': 'cons_rampup_epochs', 'ssl_gct': 'dc_rampup_epochs',
               'ssl_cct': 'cons_rampup_epochs'}


def _epoch_math(algo, n_train, n_labeled, batch, unlabeled, steps):
    """iters/epoch under the framework's sampler semantics
    (nn/data.py: the longer stream is walked once per epoch)."""
    if algo == 'ssl_null':
        iters = n_labeled // batch                       # OneStream
    else:
        lb = batch - unlabeled
        iters = max(n_labeled // lb, (n_train - n_labeled) // unlabeled)
    epochs = max(1, int(math.ceil(steps / float(iters))))
    return iters, epochs


def run_one(opts):
    algo = opts.algo
    assert algo in ALGO_DELTAS, sorted(ALGO_DELTAS)
    import pixelssl_tpu
    from pixelssl_tpu.tasks import sseg
    from pixelssl_tpu.utils import env as _env
    _env.enable_compile_cache(os.path.join(_HERE, '..', '.jax_cache'))

    root = os.path.abspath(opts.root)
    sub = os.path.join(root, 'sublabeled_{0}.txt'.format(opts.labeled))
    assert os.path.exists(sub), 'missing %s — run `gen` first' % sub
    with open(os.path.join(root, 'ImageSets', 'Segmentation',
                           'train_aug.txt')) as f:
        n_train = len([l for l in f.read().splitlines() if l.strip()])

    batch = opts.batch
    unlabeled = 0 if algo == 'ssl_null' else opts.unlabeled
    iters, epochs = _epoch_math(algo, n_train, opts.labeled, batch,
                                unlabeled, opts.steps)
    val_freq = max(1, int(round(epochs / float(opts.vals))))
    tag = 'gain_{0}{1}_l{2}'.format(
        algo, '_' + opts.tag if opts.tag else '', opts.labeled)

    config = collections.OrderedDict([
        ('exp_id', tag),
        ('ssl_algorithm', algo),
        ('resume', ''),
        ('validation', False),
        ('out_path', opts.out or os.path.join(root, 'result')),
        ('visualize', False),
        ('debug', False),
        ('val_freq', val_freq),
        ('checkpoint_freq', 100000),      # A/B probe: no checkpoints
        ('log_freq', 50),
        ('trainset', {'pascal_voc_aug': [root]}),
        ('valset', {'pascal_voc_aug': [root]}),
        ('sublabeled_path', sub),
        ('num_workers', opts.workers),
        ('native_augment', True),
        ('decoded_cache', bool(opts.cache)),
        ('u8_transfer', bool(opts.u8)),
        ('steps_per_dispatch', opts.dispatch),
        ('models', {'model': 'deeplabv2'}),
        ('optimizers', {'model': 'sgd'}),
        ('lrers', {'model': 'polynomiallr'}),
        ('criterions', {'model': 'sseg_criterion'}),
        ('lr', opts.lr),
        ('momentum', 0.9),
        ('weight_decay', 0.0005),
        ('output_stride', opts.os),
        ('backbone', opts.backbone),
        ('im_size', opts.im),
        ('train_base_size', opts.scene),
        ('val_rescaling', True),
        ('num_classes', NUM_CLASSES),
        ('epochs', epochs),
        ('batch_size', batch),
        ('unlabeled_batch_size', unlabeled),
        ('ignore_unlabeled', algo == 'ssl_null'),
        ('seed', opts.seed),
    ])
    deltas = dict(ALGO_DELTAS[algo])
    if algo in _RAMPUP_KEY:
        deltas.setdefault(_RAMPUP_KEY[algo],
                          max(1, int(round(0.3 * epochs))))
    # --delta k=v pairs override the per-algorithm defaults (tuning runs;
    # values parsed as python literals so floats/bools/tuples work)
    import ast
    for kv in opts.delta or ():
        k, _, v = kv.partition('=')
        try:
            deltas[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            deltas[k] = v
    config.update(deltas)

    t0 = time.time()
    pixelssl_tpu.run_script(config, sseg, sseg.SemanticSegmentationProxy,
                            cli_override=False)  # this tool has its own CLI
    wall = time.time() - t0

    # harvest held-out mIoU from the run's metrics.jsonl
    jsonl = None
    out_root = str(config['out_path'])
    for dirpath, _dirs, files in os.walk(out_root):
        if 'metrics.jsonl' in files and tag in dirpath:
            jsonl = os.path.join(dirpath, 'metrics.jsonl')
    assert jsonl, 'no metrics.jsonl for %s under %s' % (tag, out_root)
    curve = []
    with open(jsonl) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get('phase') != 'val':
                continue
            mious = {k: v for k, v in rec.items() if k.endswith('_mIoU')}
            if mious:
                curve.append(dict(epoch=rec.get('epoch'), **{
                    k: round(float(v), 5) for k, v in mious.items()}))
    assert curve, 'no val mIoU records in %s' % jsonl

    def best_of(rec):
        return max(v for k, v in rec.items() if k.endswith('_mIoU'))

    best = max(best_of(r) for r in curve)
    final = best_of(curve[-1])
    result = dict(
        algo=algo + ('/' + opts.tag if opts.tag else ''),
        labeled=opts.labeled, n_train=n_train,
        steps_budget=opts.steps, iters_per_epoch=iters, epochs=epochs,
        batch=batch, unlabeled_batch=unlabeled, lr=opts.lr,
        backbone=opts.backbone, im=opts.im, seed=opts.seed,
        best_val_miou=round(float(best), 5),
        final_val_miou=round(float(final), 5),
        wall_s=round(wall, 1), deltas=deltas, val_curve=curve)
    with open(opts.results, 'a') as f:
        f.write(json.dumps(result) + '\n')
    print(json.dumps({k: v for k, v in result.items() if k != 'val_curve'}))


# ---------------------------------------------------------------------------
# report
# ---------------------------------------------------------------------------

def report(results_path):
    rows = []
    with open(results_path) as f:
        for line in f:
            rows.append(json.loads(line))
    # last result per (algo, labeled, seed) wins
    table = collections.OrderedDict()
    for r in rows:
        table[(r['labeled'], r['algo'], r.get('seed', 0))] = r
    base = {}
    for (lab, algo, seed), r in table.items():
        name, _, tag = algo.partition('/')
        if name == 'ssl_null':
            base[(lab, seed, tag)] = r['best_val_miou']
    print('| labeled | algorithm | best val mIoU | final | vs SupOnly |')
    print('|---|---|---|---|---|')
    for (lab, algo, seed), r in sorted(table.items()):
        name, _, tag = algo.partition('/')
        # tuned/tagged variants compare against the same-tag SupOnly run
        # when one exists, else the untagged baseline at this (lab, seed)
        b = base.get((lab, seed, tag), base.get((lab, seed, '')))
        delta = ('{0:+.2f}'.format(100 * (r['best_val_miou'] - b))
                 if b is not None and name != 'ssl_null' else '—')
        print('| {0} | {1} (seed {2}) | {3:.2f} | {4:.2f} | {5} |'.format(
            lab, algo, seed, 100 * r['best_val_miou'],
            100 * r['final_val_miou'], delta))

    # seed-aggregate view: paired same-seed deltas vs SupOnly, mean +- sd
    # when an algorithm has been replicated — the per-seed rows above are
    # single draws from +-2-3 mIoU run noise (BASELINE.md seed study) and
    # must not be read as effects on their own
    agg = collections.defaultdict(list)
    for (lab, algo, seed), r in sorted(table.items()):
        name, _, tag = algo.partition('/')
        b = base.get((lab, seed, tag), base.get((lab, seed, '')))
        if b is not None and name != 'ssl_null':
            agg[(lab, algo)].append(100 * (r['best_val_miou'] - b))
    multi = {k: v for k, v in agg.items() if len(v) > 1}
    if multi:
        print()
        print('Paired vs-SupOnly deltas across seeds (n>1 only):')
        print('| labeled | algorithm | n seeds | mean Δ | sd |')
        print('|---|---|---|---|---|')
        for (lab, algo), ds in sorted(multi.items()):
            mean = sum(ds) / len(ds)
            sd = (sum((d - mean) ** 2 for d in ds)
                  / (len(ds) - 1)) ** 0.5
            print('| {0} | {1} | {2} | {3:+.2f} | {4:.2f} |'.format(
                lab, algo, len(ds), mean, sd))


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest='cmd', required=True)

    g = sub.add_parser('gen')
    g.add_argument('--root', required=True)
    g.add_argument('--train', type=int, default=512)
    g.add_argument('--val', type=int, default=64)
    g.add_argument('--seed', type=int, default=0)
    g.add_argument('--scene', type=int, default=256,
                   help='generated scene resolution')

    r = sub.add_parser('run')
    r.add_argument('algo')
    r.add_argument('--root', required=True)
    r.add_argument('--labeled', type=int, default=64)
    r.add_argument('--steps', type=int, default=1500)
    r.add_argument('--batch', type=int, default=8)
    r.add_argument('--unlabeled', type=int, default=4)
    r.add_argument('--lr', type=float, default=0.007)
    r.add_argument('--im', type=int, default=128)
    r.add_argument('--scene', type=int, default=256,
                   help='train_base_size (the generated scene size)')
    r.add_argument('--backbone', default='resnet50')
    r.add_argument('--os', type=int, default=16,
                   help='output stride: 8 keeps a usable ASPP grid at '
                        'small im sizes (an 8x8 OS16 map at im 128 '
                        'starves the dilation-24 branch)')
    r.add_argument('--workers', type=int, default=4)
    r.add_argument('--u8', type=int, default=1,
                   help='--u8-transfer wire format (semantics-equal, '
                        'tests/test_u8_transfer.py; the tunnel host is '
                        'ingest-byte-bound, BASELINE.md)')
    r.add_argument('--cache', type=int, default=1,
                   help='--decoded-cache (decode once, augment per access)')
    r.add_argument('--dispatch', type=int, default=8)
    r.add_argument('--vals', type=int, default=10,
                   help='target number of validation passes')
    r.add_argument('--seed', type=int, default=1)
    r.add_argument('--delta', action='append', default=[],
                   help='override an ALGO_DELTAS entry, e.g. '
                        '--delta ema_decay=0.95 (repeatable)')
    r.add_argument('--tag', default='',
                   help='suffix for the report row (tuned variants)')
    r.add_argument('--out', default='')
    r.add_argument('--results',
                   default=os.path.join(_HERE, 'ssl_gain_results.jsonl'))

    q = sub.add_parser('report')
    q.add_argument('--results',
                   default=os.path.join(_HERE, 'ssl_gain_results.jsonl'))

    return p


def main():
    opts = build_parser().parse_args()
    if opts.cmd == 'gen':
        generate(os.path.abspath(opts.root), opts.train, opts.val,
                 opts.seed, opts.scene)
    elif opts.cmd == 'run':
        run_one(opts)
    else:
        report(opts.results)


if __name__ == '__main__':
    main()
