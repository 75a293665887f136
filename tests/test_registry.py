"""SSL-algorithm registry: broken transitive imports must fail loudly
with the real ImportError, never surface later as "Unknown SSL algorithm"
(VERDICT round-1 weak #3)."""

import os
import subprocess
import sys

import pytest

from pixelssl_tpu import ssl_algorithm


def test_all_seven_registered():
    assert ssl_algorithm.SSL_ALGORITHMS == sorted([
        'ssl_null', 'ssl_mt', 'ssl_adv', 'ssl_s4l',
        'ssl_gct', 'ssl_cct', 'ssl_cutmix'])


def test_unknown_algorithm_message():
    with pytest.raises(SystemExit):
        ssl_algorithm.get_module('ssl_bogus')


def test_broken_transitive_import_fails_loudly(tmp_path):
    """Poison a transitive dependency of ssl_gct (the flaw detector) in a
    fresh interpreter; importing the registry must raise the real error."""
    probe = tmp_path / 'probe.py'
    probe.write_text('''
import sys

class _Poison:
    def find_spec(self, name, path=None, target=None):
        if name == 'pixelssl_tpu.models.flaw_detector':
            raise ImportError('POISONED_DEP: ' + name)

sys.meta_path.insert(0, _Poison())
try:
    import pixelssl_tpu.ssl_algorithm  # noqa: F401
except ImportError as e:
    print('GOT_IMPORT_ERROR:', e)
    sys.exit(0)
print('IMPORT SUCCEEDED — registry swallowed the broken dependency')
sys.exit(1)
''')
    env = dict(os.environ, PYTHONPATH='/root/repo')
    out = subprocess.run(
        [sys.executable, str(probe)], capture_output=True, text=True,
        cwd='/root/repo', env=env, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    assert 'GOT_IMPORT_ERROR' in out.stdout
    assert 'POISONED_DEP' in out.stdout
