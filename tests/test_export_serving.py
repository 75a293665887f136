"""tools/export_serving.py: StableHLO serving export round-trips.

Runs in a subprocess with a 1-device CPU platform (jax.export lowers for
the local backend; the conftest's 8-device mesh is irrelevant here and a
fresh process keeps platform state clean)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_export_serving_roundtrip(tmp_path):
    out = str(tmp_path / 'm.stablehlo')
    code = """
import os, sys
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
import jax
jax.config.update('jax_platforms', 'cpu')
sys.argv = ['export_serving.py', '--algo', 'ssl_null',
            '--backbone', 'resnet10', '--im-size', '64',
            '--num-classes', '5', '--out', r'{out}']
path = os.path.join(r'{repo}', 'tools', 'export_serving.py')
exec(compile(open(path).read(), path, 'exec'),
     {{'__file__': path, '__name__': '__main__'}})
""".format(out=out, repo=REPO)
    res = subprocess.run([sys.executable, '-c', code], cwd=REPO,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stdout + res.stderr
    assert 'round-trip' in res.stdout
    assert os.path.getsize(out) > 1e6  # weights are baked in
