"""Shared base config for the benchmark scripts.

The 17 experiment scripts reproduce the reference's benchmark
configurations (hyperparameters from task/sseg/script/*.py); each script
only states its deltas from this base. Like the reference, every script
defaults to VALIDATION mode against `pretrained/<exp_id>.ckpt`
(script/*.py:24-25); use scripts/rescore.py to convert a published torch
checkpoint into that path, or override ('validation', False),
('resume', '') in deltas to train from scratch.
"""

import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import pixelssl_tpu as pixelssl  # noqa: E402
from pixelssl_tpu.tasks import sseg  # noqa: E402

VOC = 'dataset/PascalVOC/VOCdevkit/VOC2012'


def base_config(script_file, model, ssl_algorithm, epochs,
                sublabeled_ratio=None, deltas=()):
    cfg = collections.OrderedDict([
        ('exp_id', os.path.basename(script_file).split('.')[0]),
        ('ssl_algorithm', ssl_algorithm),

        # exp — out-of-the-box the scripts RESCORE a pretrained checkpoint,
        # like the reference (task/sseg/script/*.py:24-25). Produce the
        # orbax checkpoint from a published torch .ckpt with
        # `python scripts/rescore.py <script> --torch-ckpt <file>`; override
        # ('validation', False), ('resume', '') in deltas to train.
        ('resume', 'pretrained/{0}.ckpt'.format(
            os.path.basename(script_file).split('.')[0])),
        ('validation', True),
        ('exact_val', True),
        ('out_path', 'result'),
        ('visualize', False),
        ('debug', False),
        ('val_freq', 1),
        ('log_freq', 50),
        ('visual_freq', 50),
        ('checkpoint_freq', 10),

        # data
        ('trainset', {'pascal_voc_aug': [VOC]}),
        ('valset', {'pascal_voc_aug': [VOC]}),
        ('num_workers', 2),

        # components
        ('models', {'model': model}),
        ('optimizers', {'model': 'sgd'}),
        ('lrers', {'model': 'polynomiallr'}),
        ('criterions', {'model': 'sseg_criterion'}),

        # optimizer / schedule (all reference benchmarks share these)
        ('lr', 0.00025),
        ('momentum', 0.9),
        ('weight_decay', 0.0005),

        # model
        ('output_stride', 16),
        ('backbone', 'resnet101-coco'),

        ('epochs', epochs),
        ('batch_size', 4),
        ('unlabeled_batch_size', 0 if ssl_algorithm == 'ssl_null' else 2),
        ('ignore_unlabeled', ssl_algorithm == 'ssl_null'),
    ])
    if model == 'deeplabv2':
        cfg.update([('im_size', 321), ('train_base_size', 400),
                    ('val_rescaling', True)])
    else:  # pspnet
        cfg.update([('im_size', 513), ('train_base_size', 513),
                    ('val_rescaling', False)])
    if sublabeled_ratio:
        cfg['sublabeled_path'] = (
            'dataset/PascalVOC/sublabeled_prefix/{0}/0.txt'.format(
                sublabeled_ratio))
    cfg.update(collections.OrderedDict(deltas))
    return cfg


def run(config):
    pixelssl.run_script(config, sseg, sseg.SemanticSegmentationProxy)
