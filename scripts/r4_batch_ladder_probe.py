"""Batch-size ladder for the shipped qi graph (round-4 continuation).

The conv-emitter regime has only ever been measured at B=256 (shipped) and
B=512 (rejected 3x); the intermediate points were never timed, and probe
results have inverted after structural changes before (CLAUDE.md). Same
process, shipped static3d_qi graph + patch-major u8 ingest, scan-16, one
fence; B=256 is the in-process control. Each non-256 point costs one remote
tower compile (cached afterwards).

Env: BATCHES=192,256,320,384  ITERS=16
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from team_tpu.utils.jax_cache import enable as _enable

_enable()

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.backbone.clip import (CLIPConfig, init_clip_params, patch_pixels)
from team_tpu.backbone.quant import (calibrate_vision_tower,
                                     encode_image_int8_patches,
                                     quantize_vision_tower_static)
from team_tpu.ops.preprocess import preprocess_batch

from bench import bench_scanned  # noqa: E402


def main():
    batches = [int(b) for b in os.environ.get(
        "BATCHES", "256,320,384,192").split(",")]
    iters = int(os.environ.get("ITERS", "16"))
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    calib_imgs = preprocess_batch(
        jnp.asarray(rng.integers(0, 256, (256, 224, 224, 3), dtype=np.uint8)),
        cfg.vision.image_size)
    calib = jax.jit(lambda p, im: calibrate_vision_tower(
        p, im, cfg, attn_impl="auto"))(params, calib_imgs)
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)

    def enc(q, px_u8):
        return encode_image_int8_patches(q, px_u8, cfg, attn_impl="auto",
                                         gemm_impl="static3d_qi")

    patchify = jax.jit(jax.vmap(
        lambda im: patch_pixels(im, cfg, compute_dtype=jnp.uint8)))

    for b in batches:
        xs = jnp.asarray(rng.integers(0, 256, (iters, b, 224, 224, 3),
                                      dtype=np.uint8))
        px = patchify(xs)
        float(jnp.sum(px[..., 0].astype(jnp.int32)))  # materialize
        ips = bench_scanned(enc, qv, px, b)
        print(f"B={b} qi scan-{iters}: {ips:.0f} img/s", flush=True)
        del xs, px


if __name__ == "__main__":
    main()
