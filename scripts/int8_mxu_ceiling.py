"""Decisive int8 experiment: pure MXU issue rate in Mosaic, no HBM in the loop.

One program holds x [512, K] and w [K, 512] in VMEM and runs N chained dots
(each consuming the previous int32 accumulator through a cheap nonlinearity so
nothing folds). If the measured rate approaches the 394 TOPS int8 peak, the
production kernels' ~140 TOPS is a PIPELINING problem (hand-rolled DMA double
buffering would fix it); if it stays ~140, Mosaic's int8 MXU issue rate itself
is the cap at these tile shapes and kernel tuning is a dead end this round.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from team_tpu.utils.jax_cache import enable as _enable
_enable()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

REPS = 2000
M, K, N = 512, 768, 512


def _kernel_windows(x_ref, w_ref, o_ref, *, acc_dtype):
    """REPS independent dots over sliding windows of a VMEM-resident buffer —
    no data dependency between dots (hardware can pipeline them back-to-back),
    no constant folding (every window differs). Measures the pure MXU issue
    rate Mosaic achieves at this tile shape."""

    def body(i, acc):
        start = pl.multiple_of((i % 64) * 8, 8)  # bounded buffer, unfoldable
        xw = x_ref[pl.ds(start, M), :]
        part = jax.lax.dot_general(
            xw, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)
        return acc + part

    acc = jax.lax.fori_loop(
        0, REPS, body, jnp.zeros((M, K), acc_dtype))
    o_ref[...] = acc.astype(o_ref.dtype)


def run(dtype, acc_dtype, label):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 128, (M + 8 * 64, K), dtype=np.int8))
        w = jnp.asarray(rng.integers(-3, 4, (K, K), dtype=np.int8))
    else:
        x = jnp.asarray((rng.standard_normal((M + 8 * 64, K)) * 0.1).astype(np.float32)).astype(dtype)
        w = jnp.asarray((rng.standard_normal((K, K)) * 0.1).astype(np.float32)).astype(dtype)

    f = jax.jit(functools.partial(
        lambda x, w: pl.pallas_call(
            functools.partial(_kernel_windows, acc_dtype=acc_dtype),
            grid=(1,),
            in_specs=[pl.BlockSpec((M + 8 * 64, K), lambda i: (0, 0)),
                      pl.BlockSpec((K, K), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((M, K), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((M, K), jnp.float32),
        )(x, w)))
    float(jnp.sum(f(x, w)[:1, :1]))  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(x, w)
        float(jnp.sum(out[:1, :1]))
        best = min(best, time.perf_counter() - t0)
    tops = 2 * M * K * K * REPS / best / 1e12
    print(f"{label}: {best*1e3:.2f} ms for {REPS} dots -> {tops:.1f} TOPS "
          f"(VMEM-resident, independent windows)", flush=True)


def main():
    run(jnp.int8, jnp.int32, "int8 [512,768]@[768,768]")
    run(jnp.bfloat16, jnp.float32, "bf16 [512,768]@[768,768]")


if __name__ == "__main__":
    main()
