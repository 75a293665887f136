"""Process-level platform setup shared by test / dryrun / bench entry
points.

The reference needs none of this — it requires real CUDA GPUs and has no
fake backend (docs/installation.md:14, proxy.py:253-255). The TPU build
tests every sharding/collective path on a fake N-device CPU mesh instead,
which needs two process-global knobs applied BEFORE the first jax
operation (importing jax is fine; running an op is not):

* ``XLA_FLAGS=--xla_force_host_platform_device_count=N`` plus patient
  stuck-collective timeouts — on few-core hosts the N virtual devices'
  collective threads can starve past XLA's default stuck-rendezvous
  terminate timeout and SIGABRT a perfectly healthy run.
* ``jax.config.update('jax_platforms', 'cpu')`` — the ``JAX_PLATFORMS``
  env var is overridden by this host's sitecustomize, so the platform
  must be pinned via jax.config (CLAUDE.md "Environment gotchas").

These few lines used to be copy-pasted across tests/conftest.py,
__graft_entry__.py, scripts/quickstart_synthetic.py and
tests/_multihost_worker.py; tune timeouts here, once.
"""

import os


def force_cpu_mesh(n_devices, warn_stuck_secs=120, terminate_secs=1200):
    """Fake ``n_devices``-device CPU platform. Call before the first jax
    operation. The requested values REPLACE any already-present settings
    of these flags — a child process asking for its own device count
    (tests/_multihost_worker.py under a conftest parent) must win, and
    the multi-chip dryrun asserts len(jax.devices()) == n_devices."""
    flags = [
        '--xla_force_host_platform_device_count={0}'.format(n_devices),
        '--xla_cpu_collective_call_warn_stuck_timeout_seconds={0}'.format(
            warn_stuck_secs),
        '--xla_cpu_collective_call_terminate_timeout_seconds={0}'.format(
            terminate_secs),
        '--xla_cpu_collective_timeout_seconds={0}'.format(terminate_secs),
        # Portable ISA cap: without it, XLA:CPU AOT-compiles for the full
        # feature set of the build host (AMX / AVX-512 here), and a
        # persistent-cache entry loaded on a lesser x86-64 host is
        # rejected (cpu_aot_loader: "machine feature ... not supported",
        # SIGILL risk) — every gate/test program then recompiles cold.
        # AVX2 runs everywhere we care about and keeps caches shareable.
        '--xla_cpu_max_isa=AVX2',
    ]
    prefixes = tuple(f.split('=')[0] + '=' for f in flags)
    kept = [tok for tok in os.environ.get('XLA_FLAGS', '').split()
            if not tok.startswith(prefixes)]
    os.environ['XLA_FLAGS'] = ' '.join(kept + flags)

    import jax
    jax.config.update('jax_platforms', 'cpu')


def enable_compile_cache(cache_dir, min_compile_secs=1.0):
    """Persistent XLA compile cache at ``cache_dir`` — repeat processes
    (per-file test runs, gate re-runs, warm benches) skip recompiling
    unchanged programs, the dominant cost on few-core hosts. Best-effort:
    old jax versions without the knobs are left alone."""
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          min_compile_secs)
    except Exception:
        pass


def repo_root():
    """Repository root (the directory holding ``pixelssl_tpu/``)."""
    return os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
