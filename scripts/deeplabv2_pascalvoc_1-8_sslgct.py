"""DeepLab-v2 / PASCAL VOC 1-8 / ssl_gct (reference config: task/sseg/script/deeplabv2_pascalvoc_1-8_sslgct.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import base_config, run

config = base_config(
    __file__, model='deeplabv2', ssl_algorithm='ssl_gct', epochs=20,
    sublabeled_ratio='1-8',
    deltas=[('ssl_mode', 'gct'), ('fc_ssl_scale', 1.0), ('dc_ssl_scale', 100.0),
    ('dc_threshold', 0.6), ('dc_rampup_epochs', 3), ('fd_lr', 0.0001),
    ('fd_scale', 10.0), ('mu', 0.5), ('nu', 1)],
)

if __name__ == '__main__':
    run(config)
