"""Debugging and profiling hooks.

The reference's observability gaps (SURVEY.md §5) filled TPU-natively:
  * ``enable_nan_debugging`` — the JAX equivalent of the reference's global
    ``torch.autograd.set_detect_anomaly(True)`` (drone_loss.py:6), opt-in
    because it forces synchronous re-execution on NaN;
  * ``trace`` — a jax.profiler context manager for step-level TPU traces
    (the reference only has commented-out wall-clock timers,
    train_base.py:189,212);
  * ``Timer`` — lightweight wall-clock + throughput counters used by the
    trainers' per-epoch logging.
"""

import contextlib
import time

import jax


def enable_nan_debugging(enable=True):
    """Raise on the first NaN produced by any jitted computation."""
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def trace(log_dir="/tmp/jax-trace"):
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer with an env-steps/s throughput readout."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()

    def elapsed(self):
        return time.perf_counter() - self._t0

    def throughput(self, n_env_steps):
        dt = self.elapsed()
        return n_env_steps / dt if dt > 0 else float("inf")
