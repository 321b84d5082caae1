"""Probe: amortizing the fixed fence round-trip over more batches.

Two routes to a longer dispatch chain on the headline tier (patch-major
int8 encode, B=256):
  scan32   — one scan over 32 pre-uploaded batches (needs its own compile)
  chain2   — TWO scan-16 dispatches on distinct inputs, ONE fence at the end
             (reuses the production scan-16 graph; tests whether the tunnel
             pipelines dispatches or charges per-dispatch argument overhead)
  chain4   — four scan-16 dispatches, one fence

If chainK ≈ scan(16K), production can lengthen chains without recompiling.
Env: IMPL=static3d_qi CHUNKS=4
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

from team_tpu.backbone.clip import CLIPConfig, init_clip_params, patch_pixels
from team_tpu.backbone.quant import (calibrate_vision_tower,
                                     encode_image_int8_patches,
                                     quantize_vision_tower_static)
from team_tpu.ops.preprocess import preprocess_batch

B, ITERS = 256, 16
IMPL = os.environ.get("IMPL", "static3d_qi")
CHUNKS = int(os.environ.get("CHUNKS", "4"))


def main():
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    def make_chunk(i):
        xs_u8 = jnp.asarray(rng.integers(0, 256, (ITERS, B, 224, 224, 3),
                                         dtype=np.uint8))
        px = jax.jit(jax.vmap(
            lambda im: patch_pixels(im, cfg, compute_dtype=jnp.uint8)))(xs_u8)
        float(jnp.sum(px[..., 0].astype(jnp.int32)))
        return px

    calib_imgs = preprocess_batch(
        jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8)),
        cfg.vision.image_size)
    calib = jax.jit(lambda p, im: calibrate_vision_tower(
        p, im, cfg, attn_impl="auto"))(params, calib_imgs)
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)

    chunks = [make_chunk(i) for i in range(CHUNKS)]

    @jax.jit
    def run(q, xs):
        def body(c, px):
            return c, encode_image_int8_patches(q, px, cfg, attn_impl="auto",
                                                gemm_impl=IMPL)
        _, outs = jax.lax.scan(body, None, xs)
        return outs

    float(jnp.sum(run(qv, chunks[0])[..., 0]))  # compile + warm

    for k in (1, 2, CHUNKS):
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [run(qv, c) for c in chunks[:k]]
            float(jnp.sum(outs[-1][..., 0]))   # ONE fence
            float(jnp.sum(outs[0][..., 0]))    # cheap: already done
            dt = time.perf_counter() - t0
            best = max(best, B * ITERS * k / dt)
        print(f"chain{k} (x scan-16): {best:7.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
