"""Per-layer cost of the three block impls at the production encode shape
(b=256, s=197, d=768): bf16 `_block_forward` vs int8 Pallas `_qblock_forward`
vs int8 XLA `_qblock_forward_xla`, timed as LAYERS-deep chains inside one jit
over independent inputs (docs/BENCH.md chain rules), one fence.

Env: WHICH=bf16,pallas,xla  LAYERS=12  N_INPUTS=4
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from team_tpu.utils.jax_cache import enable as _enable
_enable()

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.backbone.clip import CLIPConfig, _block_forward, init_clip_params
from team_tpu.backbone.quant import (
    _qblock_forward,
    _qblock_forward_hybrid,
    _qblock_forward_xla,
    quantize_block,
)

LAYERS = int(os.environ.get("LAYERS", "12"))
N_INPUTS = int(os.environ.get("N_INPUTS", "4"))


def fence(xs):
    return float(sum(jnp.sum(x[:1, :1, :1].astype(jnp.float32)) for x in xs))


def bench(fn, inputs, shared, label, rounds=3):
    f = jax.jit(fn)
    outs = [f(x, *shared) for x in inputs]
    fence(outs)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [f(x, *shared) for x in inputs]
        fence(outs)
        best = min(best, time.perf_counter() - t0)
    per = best / (len(inputs) * LAYERS)
    print(f"{label}: {per * 1e3:.3f} ms/layer ({LAYERS} layers x "
          f"{len(inputs)} inputs)", flush=True)
    return per


def main():
    cfg = CLIPConfig.vit_b16()
    v = cfg.vision
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    blk = params["vision"]["blocks"][0]
    qb = quantize_block(blk)
    rng = np.random.default_rng(0)
    xs_in = [jnp.asarray(rng.standard_normal((256, v.seq_len, v.width)) * 0.02,
                         jnp.bfloat16) for _ in range(N_INPUTS)]

    def chain(block_fn):
        def f(x, p):
            for _ in range(LAYERS):
                x = block_fn(p, x, v.heads, v.seq_len)
            return x
        return f

    which = os.environ.get("WHICH", "bf16,pallas,xla").split(",")
    for w in which:
        if w == "bf16":
            bench(chain(lambda p, x, h, kv: _block_forward(
                p, x, h, causal=False, kv_len=kv, impl="auto")),
                xs_in, (blk,), "bf16 block")
        elif w == "pallas":
            bench(chain(lambda p, x, h, kv: _qblock_forward(
                p, x, h, kv, attn_impl="auto", interpret=False)),
                xs_in, (qb,), "int8 pallas block")
        elif w == "xla":
            bench(chain(lambda p, x, h, kv: _qblock_forward_xla(
                p, x, h, kv, attn_impl="auto", interpret=False)),
                xs_in, (qb,), "int8 xla block")
        elif w == "hybrid":
            bench(chain(lambda p, x, h, kv: _qblock_forward_hybrid(
                p, x, h, kv, attn_impl="auto", interpret=False)),
                xs_in, (qb,), "int8 hybrid block")
        else:
            print(f"unknown {w}", flush=True)


if __name__ == "__main__":
    main()
