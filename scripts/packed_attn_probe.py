"""12 chained bf16 ViT blocks: XLA attention vs the transpose-free packed
Pallas kernel (fused_mha_packed). One dispatch per impl."""

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

from team_tpu.backbone.clip import CLIPConfig, _block_forward, init_clip_params

B, S, D, H = 256, 197, 768, 12
LAYERS = 12


def fence(x):
    return float(jnp.sum(x[:1, :1, :1].astype(jnp.float32)))


def bench(fn, xs, label, rounds=3):
    fence(fn(xs[0]))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(x) for x in xs]
        fence(outs[-1])
        fence(outs[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best / len(xs):.4f} s / {LAYERS} layers "
          f"({best / len(xs) / LAYERS * 1e3:.2f} ms/layer)", flush=True)


def main():
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    blk = params["vision"]["blocks"][0]
    rng = np.random.default_rng(0)
    xs = [jnp.asarray((rng.standard_normal((B, S, D)) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
          for _ in range(5)]

    def chain(impl):
        @jax.jit
        def f(x):
            for _ in range(LAYERS):
                x = _block_forward(blk, x, H, causal=False, kv_len=S, impl=impl)
            return x
        return f

    import os as _os
    mode = _os.environ.get("MODE", "all")
    if mode == "all":
        bench(chain("xla"), xs, "block x12, XLA attention")
        bench(chain("mha_packed"), xs, "block x12, packed Pallas attention")
    bench(chain("attn_block"), xs, "block x12, fused attention sub-block")
    # numerics spot check
    a = chain("xla")(xs[0])
    b = chain("attn_block")(xs[0])
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"max |xla - packed| after 12 layers: {diff:.3e}", flush=True)


if __name__ == "__main__":
    main()
