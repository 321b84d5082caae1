"""Round-5 probe (VERDICT item 1a): can int4 operands speed up the
MXU-bound conv-emitter dots?

The round-4 audit left the per-layer dot mega-fusions at 83 % of the int8
MXU peak with no traffic slack — halving MXU work per element via the
int4 mode (v5e doubles the int8 rate for int4 operands IF XLA lowers it
natively) is the only remaining first-order lever on the encode axis.

Protocol: the production 3-D batch-in-sublanes form exactly — chained
``[256, 197, K] @ [K, N]`` dots with the tower's own fused epilogue
(f32 scale + tanh-GELU + static requantize), independent pre-uploaded
inputs, ONE fence (docs/BENCH.md rules). Two chain shapes:

* ``square`` — 768→768 (cannot be DCE-narrowed: the honest comparator)
* ``mlp``    — alternating 768→3072→768 (where the FLOPs are)

Engines: w8a8 (baseline, the shipped form), w4a8 (int4 weight × int8
activation), w4a4 (both int4). A variant that fails to lower on this
backend prints the error and moves on.

Env: SHAPES=square,mlp  ENGINES=w8a8,w4a8,w4a4  LAYERS=12  N_INPUTS=4
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

B, S = 256, 197
LAYERS = int(os.environ.get("LAYERS", "12"))
N_INPUTS = int(os.environ.get("N_INPUTS", "4"))


def fence(xs):
    return float(sum(jnp.sum(x[:1, :1, :1].astype(jnp.float32)) for x in xs))


def _quant_to(x_f32, inv_a, dtype):
    lim = 7 if dtype == jnp.int4 else 127
    return jnp.clip(jnp.round(x_f32 * inv_a), -lim, lim).astype(dtype)


def make_chain(weights, act_dtype, w_dtype):
    """weights: list of (w_q int8, scale) per layer step; activation
    requantized to act_dtype between layers with the tower's fused epilogue
    form. int4 CONVERSION HAPPENS IN-GRAPH: passing an S4 array as a jit
    argument hits a device_put RecursionError through the axon layout path
    (measured round 5), so host/device buffers stay int8 and the narrow cast
    is a (cheap, fusable) in-graph convert."""

    def f(q, *ws):
        n = len(ws) // 2
        q = q.astype(act_dtype)
        y = None
        for i in range(LAYERS):
            w = ws[(i % n) * 2].astype(w_dtype)
            sc = ws[(i % n) * 2 + 1]
            acc = jax.lax.dot_general(q, w, (((2,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * sc
            y = jax.nn.gelu(y, approximate=True)
            q = _quant_to(y, 0.25, act_dtype)
        return y

    return f


def bench(label, fn, inputs, shared, flops_per_layer):
    f = jax.jit(fn)
    try:
        outs = [f(i, *shared) for i in inputs]
        fence(outs)
    except Exception as e:  # noqa: BLE001 — probe: record the lowering error
        msg = str(e).splitlines()[0][:140]
        print(f"{label}: FAILED TO LOWER — {msg}", flush=True)
        return
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(i, *shared) for i in inputs]
        fence(outs)
        best = min(best, time.perf_counter() - t0)
    per = best / (len(inputs) * LAYERS)
    print(f"{label}: {per * 1e3:.3f} ms/layer  "
          f"{flops_per_layer / per / 1e12:.1f} TOPS", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    shapes = os.environ.get("SHAPES", "square,mlp").split(",")
    engines = os.environ.get("ENGINES", "w8a8,w4a8,w4a4").split(",")

    for shape in shapes:
        if shape == "square":
            dims = [(768, 768)]
        else:
            dims = [(768, 3072), (3072, 768)]
        flops = sum(2 * B * S * k * n for k, n in dims) / len(dims)
        for eng in engines:
            wdt = jnp.int4 if eng.startswith("w4") else jnp.int8
            adt = jnp.int4 if eng.endswith("a4") else jnp.int8
            wlim = 7 if wdt == jnp.int4 else 127
            alim = 7 if adt == jnp.int4 else 127
            shared = []
            for k, n in dims:
                w_np = rng.integers(-wlim, wlim + 1, (k, n), dtype=np.int8)
                shared.append(jnp.asarray(w_np))
                shared.append(jnp.full((1, 1, n), 1e-3, jnp.float32))
            inputs = [
                jnp.asarray(rng.integers(-alim, alim + 1, (B, S, dims[0][0]),
                                         dtype=np.int8))
                for _ in range(N_INPUTS)
            ]
            fence([x.astype(jnp.float32)[:, :1, :1] for x in inputs])
            bench(f"{shape}/{eng}", make_chain(shared, adt, wdt), inputs,
                  shared, flops)


if __name__ == "__main__":
    main()
