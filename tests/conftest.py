"""Test harness: force an 8-virtual-device CPU platform before jax inits.

The reference could never test multi-device behavior without real GPUs
(SURVEY.md §4); here every sharding/collective path runs on a fake 8-chip
mesh in CI.
"""

import os
import sys

_FLAGS = [
    '--xla_force_host_platform_device_count=8',
    # On few-core hosts the 8 virtual devices' collective threads can
    # starve past XLA's default stuck-rendezvous terminate timeout and
    # SIGABRT a perfectly healthy run; make the detector patient so
    # oversubscribed CI goes slow instead of dying.
    '--xla_cpu_collective_call_warn_stuck_timeout_seconds=120',
    '--xla_cpu_collective_call_terminate_timeout_seconds=1200',
    '--xla_cpu_collective_timeout_seconds=1200',
]
for _flag in _FLAGS:
    if _flag.split('=')[0] not in os.environ.get('XLA_FLAGS', ''):
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '') + ' ' + _flag).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# persistent compile cache: repeat suite runs (and the per-file runner's
# fresh processes) skip recompiling unchanged test programs — the big
# cost on few-core hosts where test_algorithms alone compiles ~50 min
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
try:
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(_REPO, '.jax_cache_cpu'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
except Exception:
    pass

sys.path.insert(0, _REPO)
