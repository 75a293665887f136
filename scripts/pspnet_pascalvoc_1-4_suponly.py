"""PSPNet / PASCAL VOC 1-4 / ssl_null (reference config: task/sseg/script/pspnet_pascalvoc_1-4_suponly.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import base_config, run

config = base_config(
    __file__, model='pspnet', ssl_algorithm='ssl_null', epochs=80,
    sublabeled_ratio='1-4',
    # reference: ImageNet backbone (not COCO) and no published checkpoint —
    # out-of-box TRAINING mode (resume/validation commented out upstream)
    deltas=[('backbone', 'resnet101'), ('resume', ''), ('validation', False)],
)

if __name__ == '__main__':
    run(config)
