"""Probe: can a Pallas/Mosaic kernel reach the v5e int8 MXU path?

Round-1 finding (docs/BENCH.md): XLA ``dot_general`` on int8 operands measures
only 12-23 TOPS of the 394 TOPS int8 peak — XLA does not emit the native int8
MXU lowering. This probe measures a hand-tiled Pallas int8 matmul against that
and against the bf16 anchor (149.8 TFLOPs on 8192^3).

Measurement rules for the axon tunnel (docs/BENCH.md): independent pre-uploaded
inputs, host-fetch fence (block_until_ready does not synchronize).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from team_tpu.utils.jax_cache import enable as _enable_xla_cache
_enable_xla_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = N = K = int(os.environ.get("PROBE_SIZE", "4096"))
BM, BN, BK = 512, 512, 1024


def _mm_kernel(x_ref, w_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=acc_ref.dtype)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("acc_dtype",))
def pallas_mm(x, w, acc_dtype=jnp.int32):
    m, k = x.shape
    _, n = w.shape
    return pl.pallas_call(
        _mm_kernel,
        grid=(m // BM, n // BN, k // BK),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((BK, BN), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), acc_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, w)


@jax.jit
def xla_mm_int8(x, w):
    return jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


@jax.jit
def xla_mm_bf16(x, w):
    return jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def fence(out):
    return float(jnp.sum(out[:8, :8].astype(jnp.float32)))


def bench(fn, xs, w, label, rounds: int = 3):
    """Single host-fetch fence at the END (device executes dispatches in order,
    so fencing the last output fences the stream; per-output fetches would pay a
    ~28 ms tunnel round-trip per call and swamp compute)."""
    fence(fn(xs[0], w))  # compile + warm
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(x, w) for x in xs]
        fence(outs[-1])
        fence(outs[0])
        best = min(best, time.perf_counter() - t0)
    tops = 2 * M * N * K * len(xs) / best / 1e12
    print(f"{label}: {best*1e3/len(xs):.2f} ms/call  {tops:.1f} TOPS", flush=True)
    return tops


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    # cap live device bytes (inputs + int32 outputs + bf16 copies) ~6 GB
    n_inputs = max(4, min(32, 6 * 2 ** 30 // (M * K + M * N * 4 + M * K * 2)))
    xs_i8 = [jnp.asarray(rng.integers(-127, 128, (M, K), dtype=np.int8))
             for _ in range(n_inputs)]
    w_i8 = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))

    # correctness spot-check on a small slice (host int32 reference)
    small = np.asarray(xs_i8[0][:256, :]).astype(np.int32) @ np.asarray(w_i8).astype(np.int32)
    got = np.asarray(pallas_mm(xs_i8[0], w_i8)[:256, :])
    assert np.array_equal(small, got), "pallas int8 matmul wrong!"
    print("pallas int8 matmul exact vs host int32: OK", flush=True)

    bench(pallas_mm, xs_i8, w_i8, "pallas int8->int32")
    bench(xla_mm_int8, xs_i8, w_i8, "xla   int8->int32")

    xs_bf = [x.astype(jnp.bfloat16) for x in xs_i8[: max(2, n_inputs // 2)]]
    w_bf = w_i8.astype(jnp.bfloat16)
    fn_bf = functools.partial(pallas_mm, acc_dtype=jnp.float32)
    bench(fn_bf, xs_bf, w_bf, "pallas bf16->f32 ")
    bench(xla_mm_bf16, xs_bf, w_bf, "xla   bf16->f32 ")


if __name__ == "__main__":
    main()
