"""Round-5 probe (VERDICT item 1b): can a multi-op Mosaic megakernel beat
XLA's conv-emitter mega-fusions on the MLP pair?

Every prior Pallas GEMM attempt (rounds 2-3) was a single-dot 2-D tiling and
capped at ~140-157 TOPS (issue-pipeline bound) where XLA's int8 engine runs
~228. The untested hypothesis: a kernel that runs TWO consecutive dots per
grid step (fc → tanh-GELU → static requantize → proj, the whole MLP) with
both weights VMEM-resident
  (a) doubles per-step arithmetic intensity (more MXU work per issue window),
  (b) keeps the [M, 3072] int8 intermediate entirely in VMEM (the XLA graph
      round-trips it through HBM between the fc and proj fusions), and
  (c) in the 3-D form processes [bb, S, K] blocks — the batch-in-sublanes
      shape XLA's own emitter favors.

Variants:
  xla   — the shipped form: two 3-D int8 dots with fused epilogues, int8
          intermediate through HBM (baseline)
  mk2d  — flat 2-D megakernel, grid over M=B*S rows (block_m sweep)
  mk3d  — batch-in-sublanes megakernel, grid over B, block [bb, 197, K]

Protocol: 12 chained MLP pairs (residual add between pairs defeats folding),
N_INPUTS independent pre-uploaded int8 inputs, ONE fence. Reports ms/pair and
TOPS over the pair's 2*M*K*N*2 int8 FLOPs.

Env: VARIANTS=xla,mk2d256,mk2d512,mk2d1024,mk3d8,mk3d16  LAYERS=12 N_INPUTS=4
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
from jax.experimental.pallas import tpu as pltpu

B, S, K, N = 256, 197, 768, 3072
LAYERS = int(os.environ.get("LAYERS", "12"))
N_INPUTS = int(os.environ.get("N_INPUTS", "4"))
PAIR_FLOPS = 2 * B * S * K * N * 2  # fc + proj


def _gelu_tanh(x):
    # tanh GELU — Mosaic has no erf lowering (docs/BENCH.md)
    c = np.sqrt(2.0 / np.pi).astype(np.float32)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _mlp_mega_kernel(x_ref, w1_ref, s1_ref, w2_ref, s2_ref, qi_ref, o_ref):
    """One grid step: rows -> fc dot -> dequant+gelu -> requant int8 (VMEM)
    -> proj dot -> dequant -> bf16 out. x_ref may be [bm, K] (2-D form) or
    [bb, S, K] (batch-in-sublanes form); dots contract the last dim."""
    x = x_ref[...]
    nd = x.ndim
    dims = (((nd - 1,), (0,)), ((), ()))
    acc1 = jax.lax.dot_general(x, w1_ref[...], dims,
                               preferred_element_type=jnp.int32)
    h = _gelu_tanh(acc1.astype(jnp.float32) * s1_ref[...])
    hq = jnp.clip(jnp.round(h * qi_ref[...]), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot_general(hq, w2_ref[...], dims,
                               preferred_element_type=jnp.int32)
    o_ref[...] = (acc2.astype(jnp.float32) * s2_ref[...]).astype(jnp.bfloat16)


def mlp_mega_2d(x_q, w1, s1, w2, s2, qi, *, block_m=512, interpret=False):
    """[M, K] int8 -> [M, K] bf16 whole-MLP megakernel, grid over M."""
    m, k = x_q.shape
    n = w1.shape[1]
    m_pad = ((m + block_m - 1) // block_m) * block_m
    if m_pad != m:
        x_q = jnp.pad(x_q, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        _mlp_mega_kernel,
        grid=(m_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((n, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, k), jnp.bfloat16),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n * 2,
            bytes_accessed=m_pad * k * 3 + k * n * 2,
            transcendentals=m_pad * n,
        ),
    )(x_q, w1, s1, w2, s2, qi)
    return out[:m] if m_pad != m else out


def mlp_mega_3d(x_q, w1, s1, w2, s2, qi, *, block_b=8, interpret=False):
    """[B, S, K] int8 -> [B, S, K] bf16 megakernel, grid over the BATCH dim —
    the batch-in-sublanes block shape XLA's conv emitter uses."""
    b, s, k = x_q.shape
    n = w1.shape[1]
    out = pl.pallas_call(
        _mlp_mega_kernel,
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, s, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((n, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, s, k), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, k), jnp.bfloat16),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * k * n * 2,
            bytes_accessed=b * s * k * 3 + k * n * 2,
            transcendentals=b * s * n,
        ),
    )(x_q, w1, s1, w2, s2, qi)
    return out


def xla_pair(x_q, w1, s1, w2, s2, qi):
    """The shipped graph's form: two 3-D int8 dots, fused epilogues, int8
    intermediate (which XLA materializes to HBM between the two fusions)."""
    acc1 = jax.lax.dot_general(x_q, w1, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    h = jax.nn.gelu(acc1.astype(jnp.float32) * s1.reshape(1, 1, -1),
                    approximate=True)
    hq = jnp.clip(jnp.round(h * qi.reshape(1, 1, -1)), -127, 127
                  ).astype(jnp.int8)
    acc2 = jax.lax.dot_general(hq, w2, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    return (acc2.astype(jnp.float32) * s2.reshape(1, 1, -1)
            ).astype(jnp.bfloat16)


def make_chain(pair_fn, three_d):
    def f(x8, w1, s1, w2, s2, qi):
        q = x8 if three_d else x8.reshape(B * S, K)
        for _ in range(LAYERS):
            y = pair_fn(q, w1, s1, w2, s2, qi)
            # residual-style requantize between pairs (defeats folding; same
            # cost for every variant)
            q = jnp.clip(jnp.round(y.astype(jnp.float32) * 0.25),
                         -127, 127).astype(jnp.int8)
        return y

    return f


def fence(xs):
    return float(sum(jnp.sum(x.reshape(-1)[:4].astype(jnp.float32))
                     for x in xs))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    variants = os.environ.get(
        "VARIANTS", "xla,mk2d256,mk2d512,mk2d1024,mk3d8,mk3d16").split(",")

    w1 = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))
    w2 = jnp.asarray(rng.integers(-127, 128, (N, K), dtype=np.int8))
    s1 = jnp.full((1, N), 2e-4, jnp.float32)
    s2 = jnp.full((1, K), 2e-4, jnp.float32)
    qi = jnp.full((1, N), 30.0, jnp.float32)
    inputs = [jnp.asarray(rng.integers(-127, 128, (B, S, K), dtype=np.int8))
              for _ in range(N_INPUTS)]
    fence(inputs)

    ref = None
    for v in variants:
        if v == "xla":
            fn = make_chain(xla_pair, three_d=True)
        elif v.startswith("mk2d"):
            bm = int(v[4:] or "512")
            fn = make_chain(functools.partial(mlp_mega_2d, block_m=bm),
                            three_d=False)
        elif v.startswith("mk3d"):
            bb = int(v[4:] or "8")
            fn = make_chain(functools.partial(mlp_mega_3d, block_b=bb),
                            three_d=True)
        else:
            raise SystemExit(f"unknown variant {v}")
        f = jax.jit(fn)
        try:
            outs = [f(x, w1, s1, w2, s2, qi) for x in inputs]
            fence(outs)
        except Exception as e:  # noqa: BLE001 — probe
            print(f"{v}: FAILED — {str(e).splitlines()[0][:140]}", flush=True)
            continue
        got = np.asarray(outs[0], np.float32).reshape(-1)[:4096]
        if ref is None:
            ref = got
            err = 0.0
        else:
            err = float(np.max(np.abs(got - ref)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [f(x, w1, s1, w2, s2, qi) for x in inputs]
            fence(outs)
            best = min(best, time.perf_counter() - t0)
        per = best / (N_INPUTS * LAYERS)
        print(f"{v}: {per * 1e3:.3f} ms/pair  {PAIR_FLOPS / per / 1e12:.1f} "
              f"TOPS  maxerr={err:.4f}", flush=True)


if __name__ == "__main__":
    main()
