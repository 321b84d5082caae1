"""Piecewise timing of the int8 encode path at ViT-B/16 shapes (B=256).

Isolates where the end-to-end int8 tower loses time vs bf16: the quantize
pass, each GEMM shape, and the fused quantize+GEMM chain.
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

from team_tpu.ops.int8_matmul import int8_linear, quantize_rows, quantize_weight

M = 256 * 197  # B*S


def fence(x):
    return float(jnp.sum(x[..., :1].astype(jnp.float32)))


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
    print(f"{label}: {ms:.2f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    n_in = 8
    xs = [jnp.asarray(rng.standard_normal((M, 768)).astype(np.float32)).astype(jnp.bfloat16)
          for _ in range(n_in)]
    xs_wide = [jnp.asarray(rng.standard_normal((M, 3072)).astype(np.float32)).astype(jnp.bfloat16)
               for _ in range(4)]

    w768_2304 = jnp.asarray(rng.standard_normal((768, 2304)).astype(np.float32))
    w768_768 = jnp.asarray(rng.standard_normal((768, 768)).astype(np.float32))
    w768_3072 = jnp.asarray(rng.standard_normal((768, 3072)).astype(np.float32))
    w3072_768 = jnp.asarray(rng.standard_normal((3072, 768)).astype(np.float32))

    # bf16 baselines
    for w, name in ((w768_2304, "qkv 768->2304"), (w768_768, "out 768->768"),
                    (w768_3072, "fc  768->3072"), (w3072_768, "proj 3072->768")):
        wb = w.astype(jnp.bfloat16)
        f = jax.jit(lambda x, wb=wb: x @ wb)
        src = xs_wide if w.shape[0] == 3072 else xs
        bench(f, src, f"bf16 {name}")

    # quantize pass alone
    qf = jax.jit(lambda x: quantize_rows(x)[0])
    bench(qf, xs, "quantize_rows [M,768]")
    qfw = jax.jit(lambda x: quantize_rows(x)[0])
    bench(qfw, xs_wide, "quantize_rows [M,3072]")

    # int8 kernel alone (pre-quantized inputs)
    for w, name in ((w768_2304, "qkv 768->2304"), (w768_768, "out 768->768"),
                    (w768_3072, "fc  768->3072"), (w3072_768, "proj 3072->768")):
        wq, ws = quantize_weight(w)
        src = xs_wide if w.shape[0] == 3072 else xs
        pre = [quantize_rows(x) for x in src]
        pre = [(jax.device_put(a), jax.device_put(b)) for a, b in pre]
        f = jax.jit(functools.partial(
            lambda ab, wq, ws: int8_linear(ab[0], wq, ab[1], ws, None), wq=wq, ws=ws))
        bench(f, pre, f"int8 kernel {name}")

    # quantize + kernel chain (what the tower actually runs)
    for w, name in ((w768_2304, "qkv 768->2304"), (w3072_768, "proj 3072->768")):
        wq, ws = quantize_weight(w)
        src = xs_wide if w.shape[0] == 3072 else xs
        def chain(x, wq=wq, ws=ws):
            q, s = quantize_rows(x)
            return int8_linear(q, wq, s, ws, None)
        bench(jax.jit(chain), src, f"quant+int8 {name}")


if __name__ == "__main__":
    main()
