"""Probe TPU backend compiler options through the axon tunnel (round 4):
does raising xla_tpu_scoped_vmem_limit_kib speed the static3d_qi scan?

Uses jit(...).lower().compile(compiler_options=...) — the only way to reach
backend flags through the remote compile service (client-side XLA_FLAGS
rejects TPU flags, F-check crash).

Env: VMEM_KIB=65536 BATCH=256 ITERS=16
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

from team_tpu.backbone.clip import CLIPConfig, init_clip_params
from team_tpu.backbone.quant import (calibrate_vision_tower, encode_image_int8,
                                     quantize_vision_tower_static)
from team_tpu.ops.preprocess import preprocess_batch


def main():
    vmem = os.environ.get("VMEM_KIB", "65536")
    batch = int(os.environ.get("BATCH", "256"))
    iters = int(os.environ.get("ITERS", "16"))
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, 256, (iters, batch, 224, 224, 3),
                                  dtype=np.uint8))
    calib_imgs = preprocess_batch(xs[0], cfg.vision.image_size)
    calib = jax.jit(lambda p, im: calibrate_vision_tower(
        p, im, cfg, attn_impl="auto"))(params, calib_imgs)
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)

    def run(q, xs):
        def body(c, x):
            im = preprocess_batch(x, cfg.vision.image_size)
            return c, encode_image_int8(q, im, cfg, attn_impl="auto",
                                        gemm_impl="static3d_qi")
        _, outs = jax.lax.scan(body, None, xs)
        return outs

    try:
        compiled = jax.jit(run).lower(qv, xs).compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": vmem})
        print(f"compiled with xla_tpu_scoped_vmem_limit_kib={vmem}", flush=True)
    except Exception as e:
        print(f"compiler_options path failed: {type(e).__name__}: {e}",
              flush=True)
        return

    def fence(x):
        return float(jnp.sum(x[..., 0]))

    fence(compiled(qv, xs))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        out = compiled(qv, xs)
        fence(out)
        dt = time.perf_counter() - t0
        best = max(best, batch * iters / dt)
    print(f"B={batch} static3d_qi vmem={vmem}: {best:.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
