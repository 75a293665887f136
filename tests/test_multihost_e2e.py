"""True multi-process multi-host e2e: 2 processes x 2 virtual CPU devices
each form a 4-device global mesh (gloo CPU collectives) and run the full
proxy loop with --distributed — per-host input sharding, cross-process
pmean/psum, the replicated validation gather, and process-0-only
checkpointing (parallel/multihost.py; the reference has no multi-node
path at all, SURVEY.md §2.5).

Slow (~2 compiles in parallel on one core); both workers are launched
together and polled with a generous deadline.
"""

import glob
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, 'tests', '_multihost_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_training(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)  # workers set their own (2 devices each)

    procs, logs = [], []
    for pid in (0, 1):
        log = open(str(tmp_path / 'worker_{0}.log'.format(pid)), 'w')
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), str(tmp_path)],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT))

    deadline = time.time() + 1400
    rcs = [None, None]
    while time.time() < deadline and any(rc is None for rc in rcs):
        for i, p in enumerate(procs):
            if rcs[i] is None:
                rcs[i] = p.poll()
        time.sleep(1.0)
    for i, p in enumerate(procs):
        if rcs[i] is None:
            p.kill()
    for log in logs:
        log.close()

    def tail(i):
        with open(str(tmp_path / 'worker_{0}.log'.format(i))) as f:
            return 'worker {0}:\n{1}'.format(i, f.read()[-3000:])

    assert rcs == [0, 0], tail(0) + '\n' + tail(1)

    results = []
    for pid in (0, 1):
        with open(str(tmp_path / 'result_{0}.json'.format(pid))) as f:
            results.append(json.load(f))

    # the state is replicated: every process saw the same number of steps
    # and scored the same validation mIoU for student and teacher
    assert results[0]['step'] == results[1]['step'] > 0
    assert results[0]['miou'] and results[0]['miou'] == results[1]['miou']

    # only process 0 wrote the checkpoint (no shared-FS races)
    ckpts = glob.glob(str(tmp_path / 'mh' / 'ckpt' / 'checkpoint_*'))
    assert len(ckpts) == 1, ckpts
