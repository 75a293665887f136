"""Quickstart: train Mean Teacher SSL on the built-in synthetic dataset.

No downloads, no checkpoints needed — this exercises the complete
pipeline (two-stream labeled/unlabeled batching, fused jitted train step,
SyncBN/grad collectives over the device mesh, validation metrics, orbax
checkpointing, validation-only rescoring) in a few minutes on whatever
devices are available.

Usage::

    python scripts/quickstart_synthetic.py                # default devices
    python scripts/quickstart_synthetic.py --cpu-mesh 8   # fake 8-device CPU mesh
    python scripts/quickstart_synthetic.py --rescore result/quickstart_mt/ckpt/checkpoint_2

The real benchmarks (PASCAL VOC + COCO-pretrained backbones) live in the
sibling ``scripts/*_pascalvoc_*.py`` configs — see docs/getting_started.md.
(Reference analog: the reference has no offline demo; its scripts require
the VOC download + pretrained checkpoints, task/sseg/README.md.)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cpu-mesh', type=int, default=0, metavar='N',
                    help='force an N-virtual-device CPU mesh (CI/laptop)')
    ap.add_argument('--out', default='result',
                    help='output root (logs/checkpoints/visualization)')
    ap.add_argument('--epochs', type=int, default=2)
    ap.add_argument('--rescore', default='',
                    help='checkpoint path: skip training, validate only')
    opts = ap.parse_args()
    # run_script's parser also reads sys.argv (CLI overrides of config
    # values, reference runner.py behavior); this script's own flags are
    # not framework flags, so hide them from it
    sys.argv = sys.argv[:1]

    if opts.cpu_mesh:
        from pixelssl_tpu.utils import env as _env
        _env.force_cpu_mesh(opts.cpu_mesh)

    from collections import OrderedDict

    import pixelssl_tpu
    from pixelssl_tpu.tasks import sseg

    # half of the synthetic samples are "labeled" — the other half flow
    # through the unlabeled stream exactly like a real sublabeled split
    sub_path = os.path.join(opts.out, 'quickstart_sublabeled.txt')
    os.makedirs(opts.out, exist_ok=True)
    with open(sub_path, 'w') as f:
        for i in range(0, 64, 2):
            f.write('synthetic_{0:05d}\n'.format(i))

    config = OrderedDict([
        ('exp_id', 'quickstart_mt'),
        ('out_path', opts.out),
        ('ssl_algorithm', 'ssl_mt'),
        ('trainset', "{'synthetic_sseg': ['/tmp']}"),
        ('valset', "{'synthetic_sseg': ['/tmp']}"),
        ('sublabeled_path', sub_path),
        ('ignore_unlabeled', False),
        ('models', "{'model': 'deeplabv2'}"),
        ('optimizers', "{'model': 'sgd'}"),
        ('lrers', "{'model': 'polynomiallr'}"),
        ('criterions', "{'model': 'sseg_criterion'}"),
        ('backbone', 'resnet10'),
        ('im_size', 32), ('num_classes', 4),
        ('batch_size', 2),            # per device; proxy scales by mesh
        ('unlabeled_batch_size', 1),  # per device
        ('epochs', opts.epochs),
        ('log_freq', 1), ('val_freq', 1), ('checkpoint_freq', 1),
        # gentle settings for random-init + random-label data: frozen BN
        # and a small lr keep the short demo numerically tame (see
        # docs/performance.md on the BN-transient of short runs)
        ('freeze_bn', True),
        ('lr', 0.0003), ('momentum', 0.9), ('weight_decay', 0.0005),
        ('cons_scale', 0.1), ('cons_rampup_epochs', 2), ('ema_decay', 0.99),
        ('num_workers', 0),
    ])
    if opts.rescore:
        config['validation'] = True
        config['resume'] = opts.rescore
    pixelssl_tpu.run_script(config, sseg, sseg.SemanticSegmentationProxy)


if __name__ == '__main__':
    main()
