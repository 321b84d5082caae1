"""Per-layer cost of the int8 transformer block vs bf16, isolated from the
tunnel dispatch floor: 12 chained FULL blocks in one jit (LN+attention+GEMMs —
not constant-foldable). Variants isolate the fused-GELU epilogue cost."""

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
from team_tpu.backbone.quant import _qblock_forward, quantize_block
from team_tpu.ops.int8_matmul import int8_linear, quantize_rows

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
    print(f"{label}: {best / len(xs) * 1e3:.2f} ms / {LAYERS} layers", flush=True)
    return best / len(xs)


def main():
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    blk = params["vision"]["blocks"][0]
    qb = quantize_block(blk)

    rng = np.random.default_rng(0)
    xs = [jnp.asarray((rng.standard_normal((B, S, D)) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
          for _ in range(6)]

    @jax.jit
    def chain_bf16(x):
        for _ in range(LAYERS):
            x = _block_forward(blk, x, H, causal=False, kv_len=S, impl="xla")
        return x

    @jax.jit
    def chain_int8(x):
        for _ in range(LAYERS):
            x = _qblock_forward(qb, x, H, S, attn_impl="xla", interpret=False)
        return x

    def qblock_gelu_outside(qb, x):
        from team_tpu.backbone.clip import _layer_norm
        from team_tpu.ops.attention import multi_head_attention

        b, s, d = x.shape
        dh = d // H
        h = _layer_norm(qb["ln_1"], x)
        q8, sc = quantize_rows(h.reshape(b * s, d))
        qkv = int8_linear(q8, qb["qkv"]["w_q"], sc, qb["qkv"]["scale"], qb["qkv"]["b"]).reshape(b, s, 3 * d)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sh = lambda t: t.reshape(b, s, H, dh).transpose(0, 2, 1, 3)
        o = multi_head_attention(sh(q), sh(k), sh(v), S, causal=False, impl="xla")
        o = o.transpose(0, 2, 1, 3).reshape(b * s, d)
        q8, sc = quantize_rows(o)
        x = x + int8_linear(q8, qb["out"]["w_q"], sc, qb["out"]["scale"], qb["out"]["b"]).reshape(b, s, d)
        h = _layer_norm(qb["ln_2"], x)
        q8, sc = quantize_rows(h.reshape(b * s, d))
        hh = int8_linear(q8, qb["fc"]["w_q"], sc, qb["fc"]["scale"], qb["fc"]["b"])  # no fused gelu
        hh = jax.nn.gelu(hh, approximate=True)
        q8, sc = quantize_rows(hh)
        x = x + int8_linear(q8, qb["proj"]["w_q"], sc, qb["proj"]["scale"], qb["proj"]["b"]).reshape(b, s, d)
        return x

    @jax.jit
    def chain_int8_gelu_xla(x):
        for _ in range(LAYERS):
            x = qblock_gelu_outside(qb, x)
        return x

    bench(chain_bf16, xs, "bf16 block x12")
    bench(chain_int8, xs, "int8 block x12 (fused tanh-gelu)")
    bench(chain_int8_gelu_xla, xs, "int8 block x12 (gelu in XLA)")


if __name__ == "__main__":
    main()
