"""TPU-tunnel liveness guard: wait out a wedged tunnel from a clean host.

The axon tunnel can wedge on client churn — a client killed
mid-computation, or two clients starting in the same instant (CLAUDE.md
"Environment gotchas"). The wedge signature: ``jax.devices()`` still
enumerates, but EVERY computation hangs forever, and new clients queue
behind it. The measured recovery: keep the host at ZERO jax clients and
probe with a tiny matmul in a SUBPROCESS under a timeout every ~2 min;
recovery has taken 30 s to ~25 min of quiet.

Probing in a subprocess is the load-bearing detail — the waiting process
never initializes its own jax client, so when a probe finally passes the
real client starts clean.

Usage (CLI):
  python tools/tunnel_guard.py            # wait, exit 0 when healthy
  python tools/tunnel_guard.py --attempts 4 --quiet 60

Usage (library):
  from tunnel_guard import wait_for_tunnel
  wait_for_tunnel()   # call BEFORE the first jax op in this process
"""

import subprocess
import sys
import time

_PROBE = ("import jax, jax.numpy as jnp; "
          "x = jnp.ones((256, 256)); "
          "print((x @ x).block_until_ready()[0, 0])")


def probe_once(timeout=150):
    """One subprocess matmul probe. True = tunnel healthy."""
    try:
        subprocess.run([sys.executable, '-c', _PROBE], check=True,
                       timeout=timeout, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def wait_for_tunnel(max_attempts=8, probe_timeout=150, quiet_s=120,
                    log=None):
    """Probe until healthy; sleep ``quiet_s`` between failures.

    Returns True when a probe passed, False when attempts were exhausted
    (callers should proceed anyway — e.g. CPU-only environments never
    pass a TPU probe)."""
    emit = log or (lambda m: print(m, file=sys.stderr, flush=True))
    for attempt in range(1, max_attempts + 1):
        if probe_once(probe_timeout):
            if attempt > 1:
                emit('tunnel probe ok (attempt %d)' % attempt)
            return True
        emit('tunnel probe %d/%d failed; quiet %ds'
             % (attempt, max_attempts, quiet_s))
        time.sleep(quiet_s)
    emit('tunnel probes exhausted — proceeding anyway')
    return False


if __name__ == '__main__':
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--attempts', type=int, default=8)
    p.add_argument('--timeout', type=int, default=150)
    p.add_argument('--quiet', type=int, default=120)
    opts = p.parse_args()
    sys.exit(0 if wait_for_tunnel(opts.attempts, opts.timeout, opts.quiet)
             else 1)
