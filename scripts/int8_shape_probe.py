"""int8 kernel vs bf16 XLA dot at EXACT ViT shapes, 12x chained in one jit
(nonlinearity between layers defeats constant folding). Block-size variants
included — the kernel hits 120 TOPS at 8192^3 but loses to bf16 in the tower,
so the regression is shape/tiling-specific."""

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

from team_tpu.ops.int8_matmul import (
    int8_linear,
    int8_linear_kgrid,
    int8_linear_nk,
    quantize_rows,
    quantize_weight,
)

M = 256 * 197
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
    print(f"{label}: {best / len(xs) / LAYERS * 1e3:.3f} ms/GEMM", flush=True)


def main():
    rng = np.random.default_rng(0)
    which = os.environ.get("SHAPE", "qkv")
    k, n = {"qkv": (768, 2304), "proj": (3072, 768), "fc": (768, 3072)}[which]
    xs = [jnp.asarray((rng.standard_normal((M, k)) * 0.3).astype(np.float32)).astype(jnp.bfloat16)
          for _ in range(4)]
    w = jnp.asarray((rng.standard_normal((k, n)) * 0.02).astype(np.float32))
    wb = w.astype(jnp.bfloat16)
    wq, ws = quantize_weight(w)

    def chain_bf16(x):
        for _ in range(LAYERS):
            y = x @ wb
            x = jnp.tanh(y[:, :k])
        return x

    def make_chain_int8(bm, bn):
        def f(x):
            for _ in range(LAYERS):
                q, s = quantize_rows(x)
                y = int8_linear(q, wq, s, ws, None, block_m=bm, block_n=bn)
                x = jnp.tanh(y[:, :k])
            return x
        return f

    def make_chain_kgrid(bm, bn, bk):
        def f(x):
            for _ in range(LAYERS):
                q, s = quantize_rows(x)
                y = int8_linear_kgrid(q, wq, s, ws, None, block_m=bm, block_n=bn,
                                      block_k=bk)
                x = jnp.tanh(y[:, :k])
            return x
        return f

    def make_chain_nq(bm, bn, bk):
        # kernel-only (no per-layer quantize): reuse one quantized activation
        q0, s0 = quantize_rows(xs[0])
        def f(x):
            q, s = quantize_rows(x)
            y = None
            for _ in range(LAYERS):
                y = int8_linear_kgrid(q, wq, s, ws, None, block_m=bm, block_n=bn,
                                      block_k=bk)
                q = jnp.clip(y[:, :k].astype(jnp.int32), -127, 127).astype(jnp.int8)
            return y
        return f

    wtq = jnp.asarray(np.ascontiguousarray(np.asarray(wq).T))

    def make_chain_nk(bm, bn):
        def f(x):
            for _ in range(LAYERS):
                q, s = quantize_rows(x)
                y = int8_linear_nk(q, wtq, s, ws, None, block_m=bm, block_n=bn)
                x = jnp.tanh(y[:, :k])
            return x
        return f

    mode = os.environ.get("MODE", "base")
    if mode == "nk":
        for bm, bn in ((512, 512), (512, 1152), (1024, 768)):
            bench(jax.jit(make_chain_nk(bm, bn)), xs,
                  f"int8-nk {which} bm={bm} bn={bn}")
        return
    if mode == "base":
        bench(jax.jit(chain_bf16), xs, f"bf16 {which} {k}->{n}")
        for bm, bn in ((512, 512), (1024, 512), (512, 2304), (1024, 1152), (256, 512)):
            bench(jax.jit(make_chain_int8(bm, bn)), xs,
                  f"int8 {which} bm={bm} bn={bn}")
    else:
        for bm, bn, bk in ((512, 512, 256), (512, 512, 384), (1024, 768, 384),
                           (512, 1152, 256)):
            bench(jax.jit(make_chain_kgrid(bm, bn, bk)), xs,
                  f"int8-kgrid {which} bm={bm} bn={bn} bk={bk}")
        bench(jax.jit(make_chain_nq(512, 512, 384)), xs,
              f"int8-kgrid {which} KERNEL-ONLY bm=512 bn=512 bk=384")


if __name__ == "__main__":
    main()
