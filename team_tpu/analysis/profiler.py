"""Profiling / step-timing observability.

The reference has no tracing at all — only wall-clock prints (reference
``trainer.py:86,104-105``). Here:
* :class:`StepTimer` — rolling per-step timing + images/sec, logged;
* :func:`trace` — context manager around ``jax.profiler`` traces, gated by
  ``Config.profile_dir`` (view with TensorBoard / xprof);
* :func:`device_sync` — completion barrier that also works through the axon
  TPU tunnel (which does not honor ``block_until_ready``; a tiny host fetch is
  the reliable fence).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp


def device_sync(x=None) -> None:
    if x is None:
        x = jnp.zeros(())
    float(jnp.sum(x))


@contextlib.contextmanager
def trace(profile_dir: Optional[str], name: str = "train"):
    """jax.profiler trace context; no-op when profile_dir is unset."""
    if not profile_dir:
        yield
        return
    with jax.profiler.trace(profile_dir):
        with jax.profiler.TraceAnnotation(name):
            yield


class StepTimer:
    def __init__(self, window: int = 50, log_every: int = 0, name: str = "step"):
        self.window = deque(maxlen=window)
        self.log_every = log_every
        self.name = name
        self._count = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.window.append(dt)
        self._count += 1
        if self.log_every and self._count % self.log_every == 0:
            logging.info("%s: %.2f ms/step (avg over %d)", self.name,
                         1e3 * self.mean_time, len(self.window))
        return False

    @property
    def mean_time(self) -> float:
        return sum(self.window) / max(len(self.window), 1)

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean_time if self.window else 0.0
