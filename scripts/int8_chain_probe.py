"""Isolate per-GEMM device cost: 12 chained 768->768 GEMMs in ONE dispatch,
int8 (quantize + pallas kernel) vs bf16 (jnp.dot). The ~8-16 ms per-dispatch
tunnel floor (scripts/int8_profile.py) cancels out."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from team_tpu.utils.jax_cache import enable as _enable
_enable()

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.ops.int8_matmul import int8_linear, quantize_rows, quantize_weight

M, D = 256 * 197, 768
LAYERS = 12


def fence(x):
    return float(jnp.sum(x[:1, :1].astype(jnp.float32)))


def bench(fn, xs, label, rounds=3):
    fence(fn(xs[0]))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(x) for x in xs]
        fence(outs[-1])
        fence(outs[0])
        best = min(best, time.perf_counter() - t0)
    ms = best / len(xs) * 1e3
    print(f"{label}: {ms:.2f} ms/dispatch  ({(ms) / LAYERS:.2f} ms/GEMM incl overhead)",
          flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((M, D)).astype(np.float32)).astype(jnp.bfloat16)
          for _ in range(8)]
    w = jnp.asarray((rng.standard_normal((D, D)) * 0.03).astype(np.float32))
    wb = w.astype(jnp.bfloat16)
    wq, ws = quantize_weight(w)

    @jax.jit
    def chain_bf16(x):
        for _ in range(LAYERS):
            x = x @ wb
        return x

    @jax.jit
    def chain_int8(x):
        for _ in range(LAYERS):
            q, s = quantize_rows(x)
            x = int8_linear(q, wq, s, ws, None)
        return x

    @jax.jit
    def chain_int8_nq(x):
        # kernel only: feed the same pre-quantized activation each time
        q, s = quantize_rows(x)
        out = None
        for _ in range(LAYERS):
            out = int8_linear(q, wq, s, ws, None)
            q = jax.lax.bitcast_convert_type(out[:, :D].astype(jnp.int8), jnp.int8)
        return out

    base = bench(chain_bf16, xs, f"bf16 x{LAYERS} chained")
    b_i8 = bench(chain_int8, xs, f"int8 quant+kernel x{LAYERS} chained")
    b_nq = bench(chain_int8_nq, xs, f"int8 kernel-only x{LAYERS} chained")
    print(f"per-GEMM delta int8-vs-bf16: {(b_i8 - base) / LAYERS:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
