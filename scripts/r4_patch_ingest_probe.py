"""Probe: encode throughput when ingest is PATCH-MAJOR uint8.

The profile shows ~1.6 ms/batch of ingest (preprocess + patch reorder) vs a
~0.25 ms floor — the [B,224,224,3] minor-dim-3 layout is lane-hostile. If
the native loader emitted patches ([B, 196, 768] u8, same bytes — the C++
resampler writes every pixel anyway, so patch-major offsets are free on the
host), the device would do ZERO reorder: normalize folds into the patch
dot's prologue as per-column scale/bias (u8-ingest machinery,
quant.py:encode_image_int8_u8).

Variants, all from device-resident u8, scanned 16 batches in one dispatch:
  image   — production bench path (preprocess_batch + encode_image_int8)
  u8      — encode_image_int8_u8 ([B,224,224,3] u8, reorder on u8)
  patches — patch-major [B,196,768] u8 straight into the scale/bias + dot
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

from team_tpu.backbone.clip import CLIPConfig, init_clip_params, patch_pixels
from team_tpu.backbone.quant import (_encode_tokens_int8,
                                     calibrate_vision_tower,
                                     encode_image_int8, encode_image_int8_u8,
                                     quantize_vision_tower_static)
from team_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD, preprocess_batch

B, ITERS = 256, 16
IMPL = os.environ.get("IMPL", "static3d_qi")


def bench_scanned(encode_fn, qv, xs):
    @jax.jit
    def run(q, xs):
        def body(c, x):
            return c, encode_fn(q, x)
        _, outs = jax.lax.scan(body, None, xs)
        return outs

    float(jnp.sum(run(qv, xs)[..., 0]))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(qv, xs)[..., 0]))
        best = max(best, B * ITERS / (time.perf_counter() - t0))
    return best


def main():
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    xs_u8 = jnp.asarray(rng.integers(0, 256, (ITERS, B, 224, 224, 3),
                                     dtype=np.uint8))
    calib_imgs = preprocess_batch(xs_u8[0], cfg.vision.image_size)
    calib = jax.jit(lambda p, im: calibrate_vision_tower(
        p, im, cfg, attn_impl="auto"))(params, calib_imgs)
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)

    # patch-major u8: what the loader would emit ([ITERS, B, 196, 588])
    xs_patches = jax.jit(
        jax.vmap(lambda im: patch_pixels(im, cfg, compute_dtype=jnp.uint8))
    )(xs_u8)
    float(jnp.sum(xs_patches[..., 0].astype(jnp.int32)))  # materialize

    v = cfg.vision
    ps2 = v.patch_size * v.patch_size
    mean = jnp.repeat(jnp.asarray(CLIP_MEAN, jnp.float32), ps2)
    std = jnp.repeat(jnp.asarray(CLIP_STD, jnp.float32), ps2)
    scale = (1.0 / (255.0 * std)).astype(jnp.float32)
    bias = (-mean / std).astype(jnp.float32)

    def enc_image(q, x_u8):
        x = preprocess_batch(x_u8, cfg.vision.image_size)
        return encode_image_int8(q, x, cfg, attn_impl="auto", gemm_impl=IMPL)

    def enc_u8(q, x_u8):
        return encode_image_int8_u8(q, x_u8, cfg, attn_impl="auto",
                                    gemm_impl=IMPL)

    def enc_patches(q, px_u8):
        px = (px_u8.astype(jnp.float32) * scale + bias).astype(jnp.bfloat16)
        tokens = px @ q["patch_w"].astype(jnp.bfloat16)
        return _encode_tokens_int8(q, tokens, cfg, attn_impl="auto",
                                   gemm_impl=IMPL, interpret=False,
                                   seq_pad=None)

    for label, fn, data in (("image", enc_image, xs_u8),
                            ("u8", enc_u8, xs_u8),
                            ("patches", enc_patches, xs_patches)):
        ips = bench_scanned(fn, qv, data)
        print(f"{label:8s} {ips:7.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
