"""Round-4 perf race: LN-chain elimination + integer QKᵀ attention.

Variants (all static-W8A8, bench.py's exact scanned uint8 protocol, B=256):
  qa   — static3d_qa        round-3 production tier (baseline, cached)
  qaf  — static3d_qaf       + fused one-pass LN→quantize producers
  qi   — static3d_qi        + integer QKᵀ (per-head q/k scales), bf16 PV
  qi2  — static3d_qi2       + int8 PV (softmax probs requantized in VMEM)

Each variant also reports its on-chip cosine vs the bf16 tower on a HELD-OUT
batch (calibration uses xs[0], the gate uses xs[1] — ADVICE r3 medium).

Env: WHICH=qa,qaf,qi,qi2  TEAM_LN_MODE=1pass|2pass (default 1pass here)
     BATCH=256 ITERS=16
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("TEAM_LN_MODE", "1pass")

from team_tpu.utils.jax_cache import enable as _enable
_enable()

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.backbone.clip import CLIPConfig, encode_image, init_clip_params
from team_tpu.backbone.quant import (calibrate_vision_tower, encode_image_int8,
                                     quantize_vision_tower_static)
from team_tpu.ops.preprocess import preprocess_batch

from bench import bench_scanned  # noqa: E402

IMPLS = {"qa": "static3d_qa", "qaf": "static3d_qaf",
         "qi": "static3d_qi", "qi2": "static3d_qi2",
         "qis": "static3d_qis"}


def main():
    which = os.environ.get("WHICH", "qa,qaf,qi,qi2").split(",")
    batch = int(os.environ.get("BATCH", "256"))
    iters = int(os.environ.get("ITERS", "16"))
    print(f"LN mode: {os.environ['TEAM_LN_MODE']}", flush=True)
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, 256, (iters, batch, 224, 224, 3),
                                  dtype=np.uint8))

    calib_imgs = preprocess_batch(xs[0], cfg.vision.image_size)
    calib = jax.jit(lambda p, im: calibrate_vision_tower(
        p, im, cfg, attn_impl="auto"))(params, calib_imgs)
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)

    # held-out gate reference (bf16 tower, cached graph)
    f_bf16 = jax.jit(lambda p, x_u8: encode_image(
        p, preprocess_batch(x_u8, cfg.vision.image_size), cfg,
        compute_dtype=jnp.bfloat16, attn_impl="auto"))
    ref = np.asarray(f_bf16(params, xs[1]))

    xs_patches = None
    if any(v in ("qip", "qipd") for v in which):
        from team_tpu.backbone.clip import patch_pixels

        xs_patches = jax.jit(jax.vmap(
            lambda im: patch_pixels(im, cfg, compute_dtype=jnp.uint8)))(xs)
        float(jnp.sum(xs_patches[..., 0].astype(jnp.int32)))  # materialize

    for v in which:
        data = xs
        if v in ("qip", "qipd"):
            # patch-major uint8 ingest (native load_batch_u8_patches layout);
            # qipd additionally runs the u8-exact int8 patch dot
            from team_tpu.backbone.quant import encode_image_int8_patches

            # qip pins the bf16 patch dot; qipd the u8-exact int8 dot
            # (the production default is int8, so qip must pin explicitly)
            os.environ["TEAM_PATCH_DOT"] = "int8" if v == "qipd" else "bf16"
            data = xs_patches

            def enc(q, px_u8):
                return encode_image_int8_patches(q, px_u8, cfg,
                                                 attn_impl="auto",
                                                 gemm_impl="static3d_qi")

            got = np.asarray(jax.jit(enc)(qv, data[1]))
            cos = (ref * got).sum(-1) / (np.linalg.norm(ref, axis=-1)
                                         * np.linalg.norm(got, axis=-1))
            ips = bench_scanned(enc, qv, data, batch)
            print(f"B={batch} {v}: {ips:.0f} img/s  "
                  f"cos(held-out) min={cos.min():.6f} mean={cos.mean():.6f}",
                  flush=True)
            continue
        if v == "qiu8":
            # uint8-native ingest: transpose on u8, normalize folded into the
            # patch dot prologue (bit-identical, tested)
            from team_tpu.backbone.quant import encode_image_int8_u8

            def enc(q, x_u8):
                return encode_image_int8_u8(q, x_u8, cfg, attn_impl="auto",
                                            gemm_impl="static3d_qi")
        else:
            impl = IMPLS[v]

            def enc(q, x_u8, impl=impl):
                x = preprocess_batch(x_u8, cfg.vision.image_size)
                return encode_image_int8(q, x, cfg, attn_impl="auto",
                                         gemm_impl=impl)

        got = np.asarray(jax.jit(enc)(qv, xs[1]))
        cos = (ref * got).sum(-1) / (np.linalg.norm(ref, axis=-1)
                                     * np.linalg.norm(got, axis=-1))
        ips = bench_scanned(enc, qv, xs, batch)
        print(f"B={batch} {v}: {ips:.0f} img/s  "
              f"cos(held-out) min={cos.min():.6f} mean={cos.mean():.6f}",
              flush=True)


if __name__ == "__main__":
    main()
