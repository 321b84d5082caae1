"""Persistent XLA compilation cache.

First compiles through the remote TPU toolchain are slow (minutes); enabling
jax's persistent compilation cache makes every subsequent process reuse them.
"""

from __future__ import annotations

import logging
import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/team_tpu_xla")


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get("TEAM_JAX_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        # 0.0, not the 1.0 default: on the axon tunnel even "fast" compiles
        # cost a multi-second round trip, and eager-op mini-compiles below
        # the threshold were re-paid EVERY RUN (measured: ~550 s of task-1
        # calibration overhead that never hit the cache — docs/BENCH.md)
    except Exception as e:  # older jax or read-only fs: keep going without cache
        logging.info("compilation cache unavailable: %s", e)
