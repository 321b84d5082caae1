"""Scoped-VMEM ladder probe (round-4 continuation).

Both group-16 rejections this round were VMEM-LIMIT rejections, not measured
losses: TEAM_QI_GROUP=16 and TEAM_QI_CLS_GROUP=16 OOM against Mosaic's
default ~16 MB scoped limit (22.5 MB of double-buffered blocks). The group
optimum has moved UP every time the kernel got cheaper (2 -> 4 -> 8 across
the round), so 16 has never actually been timed. ``TEAM_QI_VMEM_MB`` now
passes an explicit ``vmem_limit_bytes`` to the q3i pallas_calls
(mha_short._qi_compiler_params); this probe times the unlocked variants on
bench.py's exact headline protocol (patch-major u8 ingest, int8 patch dot,
static3d_qi, kq CLS-last, B=256, scan-16).

Variants (same process, globals flipped + kernel trace caches cleared):
  base      — group 8, default limit (the shipped 7000 graph, cached)
  g16       — TEAM_QI_GROUP=16,     vmem 48 MB
  c16       — TEAM_QI_CLS_GROUP=16, vmem 48 MB (main group stays 8)
  g16c16    — both 16,              vmem 48 MB
  g32       — TEAM_QI_GROUP=32,     vmem 96 MB (only if g16 wins; gated)

Env: WHICH=base,g16,c16,g16c16  BATCH=256  ITERS=16
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from team_tpu.utils.jax_cache import enable as _enable

_enable()

import jax
import jax.numpy as jnp
import numpy as np

import team_tpu.ops.mha_short as mha
from team_tpu.backbone.clip import (CLIPConfig, encode_image,
                                    init_clip_params, patch_pixels)
from team_tpu.backbone.quant import (calibrate_vision_tower,
                                     encode_image_int8_patches,
                                     quantize_vision_tower_static)
from team_tpu.ops.preprocess import preprocess_batch

from bench import bench_scanned  # noqa: E402

VARIANTS = {
    # (qi_group, cls_group, vmem_mb)
    "base": (8, 8, 0),
    "g16": (16, 8, 48),
    "c16": (8, 16, 48),
    "g16c16": (16, 16, 48),
    "g32": (32, 8, 96),
    # control: shipped groups, raised limit only — attributes the g16/c16
    # losses to the flag vs the grouping
    "ctl48": (8, 8, 48),
}


def main():
    which = os.environ.get("WHICH", "base,g16,c16,g16c16").split(",")
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

    def enc(q, px_u8):
        return encode_image_int8_patches(q, px_u8, cfg, attn_impl="auto",
                                         gemm_impl="static3d_qi")

    for v in which:
        qi_g, cls_g, vmem = VARIANTS[v]
        mha._QI_GROUP, mha._QI_CLS_GROUP, mha._QI_VMEM_MB = qi_g, cls_g, vmem
        mha.fused_mha_packed_q3i.clear_cache()
        mha.fused_mha_packed_q3i_cls.clear_cache()
        try:
            got = np.asarray(jax.jit(enc)(qv, xs_patches[1]))
        except Exception as e:
            print(f"B={batch} {v}: FAILED {str(e)[:200]}", flush=True)
            continue
        cos = (ref * got).sum(-1) / (np.linalg.norm(ref, axis=-1)
                                     * np.linalg.norm(got, axis=-1))
        ips = bench_scanned(enc, qv, xs_patches, batch)
        print(f"B={batch} {v} (qi_g={qi_g} cls_g={cls_g} vmem={vmem}MB): "
              f"{ips:.0f} img/s  cos(held-out) min={cos.min():.6f}",
              flush=True)


if __name__ == "__main__":
    main()
