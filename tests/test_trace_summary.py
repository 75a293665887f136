"""tools/trace_summary.py: the hand-rolled xplane reader finds real ops
with plausible durations in a fresh jax.profiler trace."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_trace_summary_finds_ops(tmp_path):
    # trace in a subprocess: TSL trace sessions can CHECK-fail when started
    # late in a long test process (see tests/test_profiler.py)
    code = """
import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
f = jax.jit(lambda x: jnp.tanh(x @ x) @ x)
x = jnp.ones((128, 128))
f(x).block_until_ready()
with jax.profiler.trace(r'{d}'):
    for _ in range(3):
        f(x).block_until_ready()
""".format(d=str(tmp_path))
    subprocess.run([sys.executable, '-c', code], check=True,
                   cwd=REPO, timeout=240)

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'trace_summary.py'),
         str(tmp_path), '--top', '10'],
        check=True, capture_output=True, text=True, timeout=60)
    recs = [json.loads(l) for l in out.stdout.splitlines() if l.strip()]
    assert recs, 'no planes parsed'
    cpu = [r for r in recs if 'CPU' in r['plane']]
    assert cpu
    names = ' '.join(op['name'] for r in cpu for op in r['ops'])
    assert 'dot' in names  # the matmul must appear
    total = cpu[0]['total_ms']
    assert 0 < total < 60000
    assert all(op['ms'] <= total + 1e-6 for op in cpu[0]['ops'])
