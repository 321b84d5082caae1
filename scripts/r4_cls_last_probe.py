"""CLS-only last block probe (round-4 late session).

The pooled image feature is ``x[:, 0]`` (CLIP ViT pooling), so the LAST
transformer block's out-projection, LN2, and MLP on the 196 patch rows — and
the last Pallas attention call's 196 query rows — are dead compute:
~9/12 of the final block's dot FLOPs (~1.6 ms of the 38.25 ms batch) plus
~0.5 ms of attention kernel time. K/V still need every token, so the qkv dot
stays full. Exact math (int8 dots accumulate in int32; only the bf16 PV
reduction of the CLS row can shift by a rounding step) — tested in
tests/test_int8.py::test_cls_last_block_matches_full_tower.

Variants (bench.py's exact headline protocol: patch-major u8 ingest, int8
patch dot, static3d_qi, B=256, scan-16):
  full — cls_last=False  (the shipped 6395/6652 graph, cached)
  cls  — cls_last="attn" (all-jnp CLS attention + CLS MLP — measured 6286
         vs full's 6407: the int8 k/v head-relayout + tiny batched dots cost
         more than the dead query rows save; REJECTED)
  mlp  — cls_last="mlp"  (full Pallas attention kernel, CLS-only
         out-proj/LN2/MLP — zero new layout cost; WIN: 6659 vs 6388,
         shipped as TEAM_CLS_LAST=mlp, bench headline 6962)
  kq   — cls_last="kq"   (CLS-query Pallas kernel: same packed input
         layout, only q row 0 computed + CLS MLP)
  kqs  — cls_last="kqs"  (split qkv dot: k/v projected for all rows, q for
         the CLS row only — the q projection on the 196 dead rows is never
         computed — + split CLS kernel + CLS MLP)

Env: WHICH=full,mlp,kq,kqs  BATCH=256  ITERS=16
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
    which = os.environ.get("WHICH", "full,mlp").split(",")
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
        cl = {"cls": "attn", "mlp": "mlp", "kq": "kq",
              "kqs": "kqs"}.get(v, False)

        def enc(q, px_u8, cl=cl):
            return encode_image_int8_patches(q, px_u8, cfg, attn_impl="auto",
                                             gemm_impl="static3d_qi",
                                             cls_last=cl)

        got = np.asarray(jax.jit(enc)(qv, xs_patches[1]))
        cos = (ref * got).sum(-1) / (np.linalg.norm(ref, axis=-1)
                                     * np.linalg.norm(got, axis=-1))
        ips = bench_scanned(enc, qv, xs_patches, batch)
        print(f"B={batch} {v}: {ips:.0f} img/s  "
              f"cos(held-out) min={cos.min():.6f} mean={cos.mean():.6f}",
              flush=True)


if __name__ == "__main__":
    main()
