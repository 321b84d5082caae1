"""On-chip validation + benchmark of the int8-quantized CLIP image tower.

Checks the cosine gate (>= 0.999 vs the bf16 tower on identical inputs) and
measures encode throughput for both towers at production shape (ViT-B/16,
B=256). Measurement rules per docs/BENCH.md: independent pre-uploaded inputs,
single host-fetch fence at the end of each dispatch chain.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from team_tpu.utils.jax_cache import enable as _enable_xla_cache
_enable_xla_cache()

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.backbone.clip import CLIPConfig, encode_image, init_clip_params
from team_tpu.backbone.quant import (calibrate_vision_tower, encode_image_int8,
                                     quantize_vision_tower,
                                     quantize_vision_tower_static)

BATCH = int(os.environ.get("VAL_BATCH", "256"))
ITERS = int(os.environ.get("VAL_ITERS", "16"))


def fence(x):
    return float(jnp.sum(x))


def bench(fn, arg0, xs, label, rounds=3):
    fence(fn(arg0, xs[0]))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(arg0, x) for x in xs]
        fence(outs[-1])
        fence(outs[0])
        best = min(best, time.perf_counter() - t0)
    ips = BATCH * len(xs) / best
    print(f"{label}: {best / len(xs) * 1e3:.1f} ms/call  {ips:.0f} img/s", flush=True)
    return ips


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    impl = os.environ.get("VAL_IMPL", "static3d")
    if impl.startswith("static"):
        # calibrate on a DIFFERENT batch than the gate batch (held-out gate:
        # clipping from calibration-distribution mismatch is the static
        # tier's failure mode)
        rng_c = np.random.default_rng(123)
        calib_imgs = jnp.asarray(
            rng_c.standard_normal((BATCH, 224, 224, 3)).astype(np.float32))
        calib = jax.jit(lambda p, im: calibrate_vision_tower(
            p, im, cfg, attn_impl="auto"))(params, calib_imgs)
        qv = quantize_vision_tower_static(params, calib,
                                          heads=cfg.vision.heads)
    else:
        qv = jax.tree_util.tree_map(lambda x: x, quantize_vision_tower(params))

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((BATCH, 224, 224, 3)).astype(np.float32))
          for _ in range(ITERS)]

    f_bf16 = jax.jit(lambda p, x: encode_image(p, x, cfg, compute_dtype=jnp.bfloat16,
                                               attn_impl="auto"))
    f_int8 = jax.jit(lambda q, x: encode_image_int8(q, x, cfg, attn_impl="auto",
                                                    gemm_impl=impl))

    # cosine gate on the first batch
    a = np.asarray(f_bf16(params, xs[0]))
    b = np.asarray(f_int8(qv, xs[0]))
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    print(f"cosine(int8, bf16): min={cos.min():.6f} mean={cos.mean():.6f}", flush=True)
    assert cos.min() >= 0.999, "cosine gate failed"

    ips_bf16 = bench(f_bf16, params, xs, "bf16 encode")
    ips_int8 = bench(f_int8, qv, xs, "int8 encode")
    print(f"speedup: {ips_int8 / ips_bf16:.2f}x", flush=True)


if __name__ == "__main__":
    main()
