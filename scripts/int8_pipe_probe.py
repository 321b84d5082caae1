"""Round-3 int8 GEMM pipelining probe: weight-stationary + explicit-DMA
variants vs the round-2 2-D-gridded kernel and XLA bf16, at exact ViT shapes.

Protocol ("kernel-only"): N_INPUTS independent pre-uploaded quantized inputs,
one jit computing one GEMM per input (no inter-GEMM dependency -> hardware can
pipeline; different inputs -> no constant folding, no proxy dedup), ONE host
fetch fence. Reports ms/GEMM and effective TOPS. Per docs/BENCH.md rules.

Env: SHAPE=qkv|fc|proj|out  VARIANTS=comma list (default all)
"""

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
    int8_linear_dma,
    int8_linear_wres,
    quantize_rows,
    quantize_weight,
)

M = 256 * 197
N_INPUTS = 4
LAYERS = 12  # GEMMs chained per dispatch: 48 GEMMs amortize the ~30 ms tunnel
             # dispatch+fence overhead (6 independent GEMMs/dispatch measured a
             # flat ~6 ms/GEMM for EVERY variant incl. XLA bf16 — pure overhead)


def fence(xs):
    return float(sum(jnp.sum(x[:1, :1].astype(jnp.float32)) for x in xs))


def bench(fn, inputs_list, shared, label, flops, rounds=3):
    # inputs MUST be jit arguments, not closure captures: closed-over device
    # arrays become inline constants and blow the remote-compile request body
    # (HTTP 413)
    f = jax.jit(fn)
    outs = [f(*i, *shared) for i in inputs_list]
    fence(outs)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [f(*i, *shared) for i in inputs_list]
        fence(outs)
        best = min(best, time.perf_counter() - t0)
    per = best / (len(inputs_list) * LAYERS)
    print(f"{label}: {per * 1e3:.3f} ms/GEMM  {flops / per / 1e12:.1f} TOPS",
          flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    which = os.environ.get("SHAPE", "qkv")
    k, n = {"qkv": (768, 2304), "fc": (768, 3072), "proj": (3072, 768),
            "out": (768, 768)}[which]
    flops = 2 * M * k * n
    # upload-light: GEMM timing is value-independent, so generate int8 operands
    # directly on host (38 MB/input vs 155 MB f32 + eager device quantization,
    # which stalled for >30 min through the 1-core axon tunnel)
    w_np = rng.integers(-127, 128, (k, n), dtype=np.int8)
    wq = jnp.asarray(w_np)
    ws = jnp.full((1, n), 0.01, jnp.float32)
    wb = jnp.asarray((w_np.astype(np.float32) * 0.01)).astype(jnp.bfloat16)
    b = jnp.zeros((n,), jnp.float32)

    q_in = [jnp.asarray(rng.integers(-127, 128, (M, k), dtype=np.int8))
            for _ in range(N_INPUTS)]
    s_in = [jnp.full((M, 1), 0.02, jnp.float32) for _ in range(N_INPUTS)]
    xb_in = [q.astype(jnp.bfloat16) for q in q_in]

    variants = os.environ.get(
        "VARIANTS",
        "bf16,base512,wres256,wres512,wres512s3,wres1024,wres1024s3,"
        "dma512,dma1024").split(",")

    def chain_bf16(x, w):
        y = None
        for _ in range(LAYERS):
            y = x @ w
            x = jnp.tanh(y[:, :k]).astype(jnp.bfloat16)
        return y

    def make_chain(kernel, **kw):
        # kernel-only chain: int8 re-cast between layers (cheap, identical for
        # every variant) defeats CSE/folding without paying a quantize pass
        def f(q, s, w, wsc, bb):
            y = None
            for _ in range(LAYERS):
                y = kernel(q, w, s, wsc, bb, **kw)
                q = jnp.clip(y[:, :k], -127, 127).astype(jnp.int8)
            return y
        return f

    def chain_bf16cast(q, w):
        # XLA bf16 GEMM with the SAME int8 re-cast chain the pallas variants
        # pay (tanh fuses into XLA's GEMM; the cast around a pallas call does
        # not) — isolates the chain-protocol overhead from kernel throughput
        y = None
        for _ in range(LAYERS):
            y = q.astype(jnp.bfloat16) @ w
            q = jnp.clip(y[:, :k], -127, 127).astype(jnp.int8)
        return y

    def chain_xlaint8(q, w):
        y = None
        for _ in range(LAYERS):
            y = jax.lax.dot_general(q, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            q = jnp.clip(y[:, :k], -127, 127).astype(jnp.int8)
        return y

    def fold_cols(y):
        # consume EVERY output column (defeats dot-narrowing DCE on the
        # chained slice): n is a multiple of k at the qkv/fc shapes
        acc = y[:, :k]
        for j in range(1, n // k):
            acc = acc + y[:, j * k:(j + 1) * k]
        return acc

    def chain_bf16_fold(x, w):
        y = None
        for _ in range(LAYERS):
            y = x @ w
            x = jnp.tanh(fold_cols(y)).astype(jnp.bfloat16)
        return y

    def chain_xlaint8_fold(q, w):
        y = None
        for _ in range(LAYERS):
            y = jax.lax.dot_general(q, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            q = jnp.clip(fold_cols(y) >> 8, -127, 127).astype(jnp.int8)
        return y

    def make_chain_fold(kernel, **kw):
        def f(q, s, w, wsc, bb):
            y = None
            for _ in range(LAYERS):
                y = kernel(q, w, s, wsc, bb, **kw)
                q = jnp.clip(fold_cols(y), -127, 127).astype(jnp.int8)
            return y
        return f

    for v in variants:
        try:
            if v == "bf16fold":
                bench(chain_bf16_fold, [(q.astype(jnp.bfloat16),) for q in q_in],
                      (wb,), f"{which} xla-bf16 FOLD-ALL-COLS", flops)
            elif v == "xlaint8fold":
                bench(chain_xlaint8_fold, [(q,) for q in q_in], (wq,),
                      f"{which} xla int8 FOLD-ALL-COLS", flops)
            elif v.startswith("foldw"):
                body = v[5:]
                bm, nsplit = (int(body.split("s")[0]), int(body.split("s")[1])) \
                    if "s" in body else (int(body), 1)
                bench(make_chain_fold(int8_linear_wres, block_m=bm, n_split=nsplit),
                      [(q, s) for q, s in zip(q_in, s_in)], (wq, ws, b),
                      f"{which} wres{body} FOLD-ALL-COLS", flops)
            elif v == "bf16cast":
                bench(chain_bf16cast, [(q,) for q in q_in], (wb,),
                      f"{which} xla-bf16+cast-chain", flops)
            elif v == "xlaint8":
                bench(chain_xlaint8, [(q,) for q in q_in], (wq,),
                      f"{which} xla int8 dot_general", flops)
            elif v == "bf16":
                bench(chain_bf16, [(x,) for x in xb_in], (wb,),
                      f"{which} xla-bf16", flops)
            elif v == "base512":
                bench(make_chain(int8_linear),
                      [(q, s) for q, s in zip(q_in, s_in)], (wq, ws, b),
                      f"{which} int8_linear bm=512 (r2 default)", flops)
            elif v.startswith("wres") or v.startswith("dma"):
                kernel = int8_linear_wres if v.startswith("wres") else int8_linear_dma
                body = v[4:] if v.startswith("wres") else v[3:]
                bm, nsplit = (int(body.split("s")[0]), int(body.split("s")[1])) \
                    if "s" in body else (int(body), 1)
                bench(make_chain(kernel, block_m=bm, n_split=nsplit),
                      [(q, s) for q, s in zip(q_in, s_in)], (wq, ws, b),
                      f"{which} {v}", flops)
            else:
                print(f"unknown variant {v}", flush=True)
        except Exception as e:
            print(f"{which} {v} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
