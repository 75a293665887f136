"""Demo: Mean Teacher SSL on the pixel-wise REGRESSION task (tasks/sreg).

The reference framework declares two task types (REGRESSION and
CLASSIFICATION, pixelssl/utils/constant.py) but ships only a
classification task; this script runs the regression side end-to-end on
the built-in synthetic matting-style dataset — no downloads, no
checkpoints. Works on real devices or a fake CPU mesh::

    python scripts/sreg_synthetic_sslmt.py --cpu-mesh 8
    python scripts/sreg_synthetic_sslmt.py --algorithm ssl_gct
    python scripts/sreg_synthetic_sslmt.py --rescore result/sreg_demo/ckpt/checkpoint_4

Any regression-supporting algorithm works (--algorithm ssl_null / ssl_mt /
ssl_adv / ssl_gct / ssl_s4l); CCT and CutMix are classification-only and
are rejected by the task-type gate.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))

ALGO_FLAGS = {
    'ssl_null': {},
    'ssl_mt': {'cons_scale': 1.0, 'cons_rampup_epochs': 2,
               'ema_decay': 0.99, 'gaussian_noise_std': 0.05},
    'ssl_adv': {'adv_for_labeled': True, 'labeled_adv_scale': 0.01,
                'unlabeled_adv_scale': 0.001,
                'unlabeled_for_discriminator': True},
    'ssl_gct': {'ssl_mode': 'gct', 'fc_ssl_scale': 1.0, 'dc_ssl_scale': 1.0,
                'dc_threshold': 0.4, 'dc_rampup_epochs': 2, 'mu': 0.5,
                'nu': 1, 'fd_scale': 1.0},
    'ssl_s4l': {'rotated_sup_scale': 0.5, 'rotation_scale': 1.0},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cpu-mesh', type=int, default=0, metavar='N',
                    help='force an N-virtual-device CPU mesh (CI/laptop)')
    ap.add_argument('--algorithm', default='ssl_mt', choices=sorted(ALGO_FLAGS))
    ap.add_argument('--out', default='result')
    ap.add_argument('--epochs', type=int, default=4)
    ap.add_argument('--rescore', default='',
                    help='checkpoint path: skip training, validate only')
    opts = ap.parse_args()
    sys.argv = sys.argv[:1]  # hide demo flags from the framework parser

    if opts.cpu_mesh:
        from pixelssl_tpu.utils import env as _env
        _env.force_cpu_mesh(opts.cpu_mesh)

    from collections import OrderedDict

    import pixelssl_tpu
    from pixelssl_tpu.tasks import sreg

    config = OrderedDict([
        ('exp_id', 'sreg_demo'),
        ('out_path', opts.out),
        ('ssl_algorithm', opts.algorithm),
        ('trainset', "{'synthetic_sreg': ['/tmp']}"),
        ('valset', "{'synthetic_sreg': ['/tmp']}"),
        ('num_workers', 0),
        ('im_size', 64),
        ('synthetic_samples', 64),
        ('models', "{'model': 'unet_lite'}"),
        # adam + grad clipping: the proxy scales lr by the data-axis size
        # (reference parity), so momentum-SGD at a demo-friendly lr can
        # diverge on large meshes; adam stays stable across mesh sizes
        ('optimizers', "{'model': 'adam'}"),
        ('lrers', "{'model': 'polynomiallr'}"),
        ('criterions', "{'model': 'sreg_criterion'}"),
        ('base_channels', 32),
        ('batch_size', 2),            # per device; proxy scales by mesh
        ('unlabeled_batch_size', 0),
        ('epochs', opts.epochs),
        ('lr', 0.001), ('weight_decay', 0.0),
        ('clip_grad_norm', 5.0),
        ('log_freq', 4), ('val_freq', 1), ('checkpoint_freq', opts.epochs),
    ])
    if opts.algorithm != 'ssl_null':
        config['unlabeledset'] = "{'synthetic_sreg': ['/tmp/u']}"
        config['unlabeled_batch_size'] = 1
        config['ignore_unlabeled'] = False
    config.update(ALGO_FLAGS[opts.algorithm])
    if opts.rescore:
        config['validation'] = True
        config['resume'] = opts.rescore
    pixelssl_tpu.run_script(config, sreg, sreg.PixelRegressionProxy)


if __name__ == '__main__':
    main()
