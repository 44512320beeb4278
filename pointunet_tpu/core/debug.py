"""Debug/observability hooks.

Replaces the reference's ad-hoc aids:
  * NaN trap — the reference catches InvalidArgumentError mid-training,
    prints the offending op, then crashes (RandLANet.py:196-204). Here
    ``enable_nan_trap`` flips jax_debug_nans so the failing primitive is
    re-run un-jitted and reported at the exact op.
  * profiling — the reference logs ms/batch and leaves tensorpack's GPU
    trackers commented out (train.py:286-287). ``profile_trace`` wraps a
    region in a jax.profiler trace viewable in TensorBoard/XProf.
"""
from __future__ import annotations

import contextlib
import time


def enable_nan_trap(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def profile_trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """ms/batch + ETA logging (reference RandLANet.py:160-174 ms/batch and
    tensorpack EstimatedTimeLeft, train.py:287)."""

    def __init__(self, total_steps: int):
        self.total = total_steps
        self.start = time.time()
        self.last = self.start
        self.count = 0

    def tick(self, steps: int = 1) -> dict:
        now = time.time()
        self.count += steps
        ms = (now - self.last) * 1000.0 / max(steps, 1)
        self.last = now
        rate = self.count / max(now - self.start, 1e-9)
        remaining = max(self.total - self.count, 0) / max(rate, 1e-9)
        return {"ms_per_batch": ms, "eta_sec": remaining}


def format_eta(seconds: float) -> str:
    seconds = int(seconds)
    h, rem = divmod(seconds, 3600)
    m, s = divmod(rem, 60)
    return f"{h:d}:{m:02d}:{s:02d}"
