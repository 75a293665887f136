"""Benchmark script (mirrors reference task/sseg/script/deeplabv2_pascalvoc_1-8_sslmt.py config).

Out of the box this trains from scratch; set ('resume', '<ckpt>') and
('validation', True) to rescore a checkpoint like the reference scripts do.
"""

import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import pixelssl_tpu as pixelssl
from pixelssl_tpu.tasks import sseg

config = collections.OrderedDict(
    [
        ('exp_id', os.path.basename(__file__).split(".")[0]),

        # arguments - SSL algorithm
        ('ssl_algorithm', 'ssl_mt'),

        ('cons_for_labeled', False),
        ('cons_scale', 1.0),
        ('cons_rampup_epochs', 3),
        ('ema_decay', 0.99),


        # arguments - exp
        ('resume', ''),
        ('validation', False),
        ('out_path', 'result'),
        ('visualize', False),
        ('debug', False),
        ('val_freq', 1),
        ('log_freq', 50),
        ('visual_freq', 50),
        ('checkpoint_freq', 10),

        # arguments - dataset / dataloader
        ('trainset', {'pascal_voc_aug': ['dataset/PascalVOC/VOCdevkit/VOC2012']}),
        ('valset', {'pascal_voc_aug': ['dataset/PascalVOC/VOCdevkit/VOC2012']}),
        ('num_workers', 2),
        ('im_size', 321),
        ('sublabeled_path', 'dataset/PascalVOC/sublabeled_prefix/1-8/0.txt'),

        ('ignore_unlabeled', False),

        # arguments - task specific components
        ('models', {'model': 'deeplabv2'}),
        ('optimizers', {'model': 'sgd'}),
        ('lrers', {'model': 'polynomiallr'}),
        ('criterions', {'model': 'sseg_criterion'}),

        # arguments - task specific optimizer / lr scheduler
        ('lr', 0.00025),
        ('momentum', 0.9),
        ('weight_decay', 0.0005),

        # arguments - task special model
        ('output_stride', 16),
        ('backbone', 'resnet101-coco'),

        # arguments - task special data
        ('val_rescaling', True),
        ('train_base_size', 400),

        # arguments - training details
        ('epochs', 20),
        ('batch_size', 4),
        ('unlabeled_batch_size', 2),
    ]
)


if __name__ == '__main__':
    pixelssl.run_script(config, sseg, sseg.SemanticSegmentationProxy)
