"""Test harness: force an 8-virtual-device CPU platform before jax inits.

The reference could never test multi-device behavior without real GPUs
(SURVEY.md §4); here every sharding/collective path runs on a fake 8-chip
mesh in CI.
"""

import os
import sys

_FLAG = '--xla_force_host_platform_device_count=8'
if _FLAG not in os.environ.get('XLA_FLAGS', ''):
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') + ' ' + _FLAG).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
