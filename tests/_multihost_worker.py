"""Worker process for the 2-process multi-host e2e test
(tests/test_multihost_e2e.py). Each process owns 2 virtual CPU devices of
a 4-device global mesh and runs the full proxy loop with --distributed.

Run as: python tests/_multihost_worker.py <process_id> <coordinator_port> <out_dir>
"""

import json
import os
import sys

PROC_ID = int(sys.argv[1])
PORT = int(sys.argv[2])
OUT = sys.argv[3]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixelssl_tpu.utils import env as _env  # noqa: E402

# 2 virtual devices per process; force_cpu_mesh REPLACES the parent
# pytest process's device_count=8 inherited via XLA_FLAGS
_env.force_cpu_mesh(2)

import jax  # noqa: E402

jax.distributed.initialize(
    coordinator_address='127.0.0.1:{0}'.format(PORT),
    num_processes=2, process_id=PROC_ID,
    initialization_timeout=240)

from collections import OrderedDict  # noqa: E402

import numpy as np  # noqa: E402

import pixelssl_tpu  # noqa: E402
from pixelssl_tpu.tasks import sseg  # noqa: E402

SUB = os.path.join(OUT, 'sublabeled.txt')
if PROC_ID == 0:
    with open(SUB + '.tmp', 'w') as f:
        for i in range(0, 16, 2):
            f.write('synthetic_{0:05d}\n'.format(i))
    os.rename(SUB + '.tmp', SUB)
else:
    import time
    for _ in range(600):
        if os.path.exists(SUB):
            break
        time.sleep(0.1)

config = OrderedDict([
    ('exp_id', 'mh'),
    ('out_path', OUT),
    ('ssl_algorithm', 'ssl_mt'),
    ('distributed', True),
    ('trainset', "{'synthetic_sseg': ['/tmp']}"),
    ('valset', "{'synthetic_sseg': ['/tmp']}"),
    ('synthetic_samples', 16),
    ('sublabeled_path', SUB),
    ('ignore_unlabeled', False),
    ('num_workers', 0),
    ('models', "{'model': 'deeplabv2'}"),
    ('optimizers', "{'model': 'sgd'}"),
    ('lrers', "{'model': 'polynomiallr'}"),
    ('criterions', "{'model': 'sseg_criterion'}"),
    ('backbone', 'resnet10'),
    ('im_size', 32),
    ('num_classes', 4),
    ('batch_size', 2),            # per device; global = 8 over the 4-dev mesh
    ('unlabeled_batch_size', 1),  # per device; global = 4
    ('epochs', 1),
    ('lr', 0.001),
    ('momentum', 0.9),
    ('log_freq', 1),
    ('cons_scale', 1.0),
    ('cons_rampup_epochs', 1),
    ('ema_decay', 0.99),
])

proxy = pixelssl_tpu.run_script(config, sseg, sseg.SemanticSegmentationProxy)
algo = proxy.ssl_algorithm

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4 and jax.local_device_count() == 2

# every process reports its view: the replicated state step and the val
# mIoU meters must agree across processes (the test compares the files)
result = {
    'process': PROC_ID,
    'step': int(np.asarray(jax.device_get(algo.state['step']))),
    'miou': {k: float(np.asarray(v.avg)) for k, v in algo.meters.meters.items()
             if 'mIoU' in k},
}
with open(os.path.join(OUT, 'result_{0}.json'.format(PROC_ID)), 'w') as f:
    json.dump(result, f)
print('WORKER_OK', PROC_ID)
