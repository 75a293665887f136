"""PSPNet / PASCAL VOC full / ssl_null (reference config: task/sseg/script/pspnet_pascalvoc_full_suponly.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import base_config, run

config = base_config(
    __file__, model='pspnet', ssl_algorithm='ssl_null', epochs=80,
    sublabeled_ratio=None,
)

if __name__ == '__main__':
    run(config)
