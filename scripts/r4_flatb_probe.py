"""Flat-batch emitter-regime probe (round-4 continuation).

The shipped graph's dot mega-fusions run at ~83 % of int8 MXU peak and every
LAYOUT-changing alternative (2-D GEMMs, sequence-major, Pallas producers)
regressed — but the batch/spatial split seen by XLA's batch-in-sublanes conv
emitter has never been varied at ZERO layout cost. ``gemm_impl=
"static3d_qib"`` runs the dots + LN/quantize producers on
``[BF, (B/BF)*S, D]`` — a free bitcast of ``[B, S, D]`` (identical bytes,
identical math: CPU-verified max-abs-diff 0.0 vs static3d_qi) — while the
attention kernel views the packed qkv tensor at the real ``[B, S, 3D]``
shape. The CLS-last (kq) block is unchanged.

Variants (bench.py's exact headline protocol: patch-major u8 ingest, int8
patch dot, B=256, scan-16):
  qi    — shipped static3d_qi graph (baseline, cached)
  qib8  — TEAM_FLAT_B=8  (emitter sees B=8,  M=6304)
  qib32 — TEAM_FLAT_B=32 (emitter sees B=32, M=1576)
  qib1  — TEAM_FLAT_B=1  (emitter sees B=1,  M=50432 — fully flat 3-D)

Env: WHICH=qi,qib8,qib32,qib1  BATCH=256  ITERS=16
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from team_tpu.utils.jax_cache import enable as _enable

_enable()

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.backbone.clip import (CLIPConfig, encode_image,
                                    init_clip_params, patch_pixels)
from team_tpu.backbone.quant import (calibrate_vision_tower,
                                     encode_image_int8_patches,
                                     quantize_vision_tower_static)
from team_tpu.ops.preprocess import preprocess_batch

from bench import bench_scanned  # noqa: E402


def main():
    which = os.environ.get("WHICH", "qi,qib8,qib32").split(",")
    batch = int(os.environ.get("BATCH", "256"))
    iters = int(os.environ.get("ITERS", "16"))
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, 256, (iters, batch, 224, 224, 3),
                                  dtype=np.uint8))
    xs_patches = jax.jit(jax.vmap(
        lambda im: patch_pixels(im, cfg, compute_dtype=jnp.uint8)))(xs)
    float(jnp.sum(xs_patches[..., 0].astype(jnp.int32)))  # materialize

    calib_imgs = preprocess_batch(xs[0], cfg.vision.image_size)
    calib = jax.jit(lambda p, im: calibrate_vision_tower(
        p, im, cfg, attn_impl="auto"))(params, calib_imgs)
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)

    f_bf16 = jax.jit(lambda p, x_u8: encode_image(
        p, preprocess_batch(x_u8, cfg.vision.image_size), cfg,
        compute_dtype=jnp.bfloat16, attn_impl="auto"))
    ref = np.asarray(f_bf16(params, xs[1]))

    for v in which:
        if v.startswith("qib"):
            os.environ["TEAM_FLAT_B"] = v[3:] or "8"
            impl = "static3d_qib"
        else:
            impl = "static3d_qi"

        def enc(q, px_u8, impl=impl):
            return encode_image_int8_patches(q, px_u8, cfg, attn_impl="auto",
                                             gemm_impl=impl)

        got = np.asarray(jax.jit(enc)(qv, xs_patches[1]))
        cos = (ref * got).sum(-1) / (np.linalg.norm(ref, axis=-1)
                                     * np.linalg.norm(got, axis=-1))
        ips = bench_scanned(enc, qv, xs_patches, batch)
        print(f"B={batch} {v}: {ips:.0f} img/s  "
              f"cos(held-out) min={cos.min():.6f} mean={cos.mean():.6f}",
              flush=True)


if __name__ == "__main__":
    main()


