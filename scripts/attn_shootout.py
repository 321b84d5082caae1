"""Attention shoot-out at CLIP shapes (B=256, H=12, S=197, D=64, bf16, v5e).

12 layers chained in ONE dispatch per impl (the tunnel's per-dispatch floor
would otherwise swamp 4 ms calls). Round-1 anchors: XLA 3.95 ms/layer,
mha_short v1 6.4 ms/layer."""

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

from team_tpu.ops.attention import _xla_attention
from team_tpu.ops.mha_short import fused_mha_short, fused_mha_short_v2

B, H, S, D = 256, 12, 197, 64
LAYERS = 12


def fence(x):
    return float(jnp.sum(x[:1, :1, :1, :1].astype(jnp.float32)))


def bench(fn, xs, label, rounds=3):
    fence(fn(xs[0]))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(x) for x in xs]
        fence(outs[-1])
        fence(outs[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best / len(xs) / LAYERS * 1e3:.2f} ms/layer", flush=True)


def chain(attn):
    @jax.jit
    def f(x):
        for _ in range(LAYERS):
            # tanh re-mixes so the chain cannot be folded; negligible cost
            x = jnp.tanh(attn(x, x, x))
        return x
    return f


def main():
    rng = np.random.default_rng(0)
    xs = [jnp.asarray((rng.standard_normal((B, H, S, D)) * 0.3).astype(np.float32)).astype(jnp.bfloat16)
          for _ in range(4)]

    mode = os.environ.get("MODE", "all")
    if mode == "all":
        bench(chain(lambda q, k, v: _xla_attention(q, k, v, S)), xs, "xla fused")
        bench(chain(lambda q, k, v: fused_mha_short(q, k, v, S)), xs, "mha_short v1")
        bench(chain(lambda q, k, v: fused_mha_short_v2(q, k, v, S)), xs, "mha_short v2 f32exp")
        bench(chain(lambda q, k, v: fused_mha_short_v2(q, k, v, S, exp_dtype=jnp.bfloat16)),
              xs, "mha_short v2 bf16exp")
    else:
        bench(chain(lambda q, k, v: fused_mha_short_v2(q, k, v, S, q_pad=128)),
              xs, "v2 qpad=128 (deferred norm, 256 rows)")
        bench(chain(lambda q, k, v: fused_mha_short_v2(q, k, v, S, q_pad=128,
                                                       exp_dtype=jnp.bfloat16)),
              xs, "v2 qpad=128 bf16exp")


if __name__ == "__main__":
    main()
