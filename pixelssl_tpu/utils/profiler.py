"""Profiling / tracing hooks.

The reference has no profiler — only wall-clock batch_time meters
(SURVEY.md §5; reference ssl_null.py:92,124-129). The TPU build adds
``jax.profiler`` trace capture around training windows: set
``--profile-dir`` (or call ``trace`` directly) to dump a TensorBoard-
compatible trace of the fused steps, collectives and host gaps.
"""

import contextlib
import time

import jax

from . import logger


@contextlib.contextmanager
def trace(log_dir, enabled=True):
    """Capture a jax.profiler trace for the enclosed block."""
    if not enabled or not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    logger.log_info('profiler: tracing to {0}'.format(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.log_info('profiler: trace saved to {0}'.format(log_dir))


class ProfileWindow(object):
    """Traces a window of training steps when ``--profile-dir`` is set.

    Skips the first step/dispatch (compile), then captures
    ``--profile-steps`` steps of epoch 0 and stops. ``tick`` is called
    with the step (or dispatch) index before each device call; ``close``
    guarantees the trace is finalized at epoch end.
    """

    def __init__(self, args, epoch):
        self.dir = getattr(args, 'profile_dir', '') or ''
        self.n = max(1, getattr(args, 'profile_steps', 10) or 10)
        self.enabled = bool(self.dir) and epoch == 0
        self.active = False

    def tick(self, idx, state):
        if not self.enabled:
            return
        if not self.active and idx == 1:
            jax.block_until_ready(state)
            jax.profiler.start_trace(self.dir)
            logger.log_info('profiler: tracing steps [1, {0}] to {1}'.format(
                self.n, self.dir))
            self.active = True
        elif self.active and idx == 1 + self.n:
            self._stop(state)

    def close(self, state):
        if self.active:
            self._stop(state)

    def _stop(self, state):
        jax.block_until_ready(state)
        jax.profiler.stop_trace()
        self.active = False
        self.enabled = False
        logger.log_info('profiler: trace saved to {0}'.format(self.dir))


class StepTimer(object):
    """Measures device-step wall time excluding host input time.

    Call ``host_done()`` when the batch is ready, ``step_done()`` after
    blocking on the step result. Keeps running means for logging.
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self._t = time.perf_counter()
        self.data_time = 0.0
        self.step_time = 0.0
        self.count = 0

    def host_done(self):
        now = time.perf_counter()
        self.data_time += now - self._t
        self._t = now

    def step_done(self):
        now = time.perf_counter()
        self.step_time += now - self._t
        self._t = now
        self.count += 1

    @property
    def mean_step(self):
        return self.step_time / max(1, self.count)

    @property
    def mean_data(self):
        return self.data_time / max(1, self.count)
