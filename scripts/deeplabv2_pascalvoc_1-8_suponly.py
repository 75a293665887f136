"""DeepLab-v2 / PASCAL VOC 1-8 / ssl_null (reference config: task/sseg/script/deeplabv2_pascalvoc_1-8_suponly.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import base_config, run

config = base_config(
    __file__, model='deeplabv2', ssl_algorithm='ssl_null', epochs=40,
    sublabeled_ratio='1-8',
)

if __name__ == '__main__':
    run(config)
