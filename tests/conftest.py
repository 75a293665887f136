"""Test harness: force an 8-virtual-device CPU platform before jax inits.

The reference could never test multi-device behavior without real GPUs
(SURVEY.md §4); here every sharding/collective path runs on a fake 8-chip
mesh in CI.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# importing the package only imports jax — no jax op runs, so the
# platform/flag setup below still lands before backend initialization
from pixelssl_tpu.utils import env as _env  # noqa: E402

_env.force_cpu_mesh(8)
# persistent compile cache: repeat suite runs (and the per-file runner's
# fresh processes) skip recompiling unchanged test programs — the big
# cost on few-core hosts where test_algorithms alone compiles ~50 min.
# force_cpu_mesh pins --xla_cpu_max_isa=AVX2 so the cache is portable
# across x86-64 hosts (round-2: AMX-compiled AOT entries were rejected
# everywhere else). min_compile_secs=0.1 caches tiny programs too.
_env.enable_compile_cache(os.path.join(_REPO, '.jax_cache_cpu'),
                          min_compile_secs=0.1)
