"""End-to-end int8 tower race: Pallas GEMM engine vs XLA int8 dot_general
vs the bf16 tower, under bench.py's exact scanned protocol (B=256, fused
uint8 preprocess, one fence). The end-to-end number is the routing authority
(docs/BENCH.md) — kernel-only probes have been protocol-inverted twice.

Env: WHICH=bf16,pallas,xla (default all)  BATCH=256  ITERS=16
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from team_tpu.utils.jax_cache import enable as _enable
_enable()

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.backbone.clip import CLIPConfig, encode_image, init_clip_params
from team_tpu.backbone.quant import (calibrate_vision_tower, encode_image_int8,
                                     quantize_vision_tower,
                                     quantize_vision_tower_static)
from team_tpu.ops.preprocess import preprocess_batch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import bench_scanned  # noqa: E402


def main():
    which = os.environ.get("WHICH", "bf16,pallas,xla,hybrid,static,static_qa,static3d").split(",")
    batch = int(os.environ.get("BATCH", "256"))
    iters = int(os.environ.get("ITERS", "16"))
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    qv = quantize_vision_tower(params)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, 256, (iters, batch, 224, 224, 3),
                                  dtype=np.uint8))

    def enc_bf16(p, x_u8):
        x = preprocess_batch(x_u8, cfg.vision.image_size)
        return encode_image(p, x, cfg, compute_dtype=jnp.bfloat16,
                            attn_impl="auto")

    def enc_bf16_pad(p, x_u8):
        x = preprocess_batch(x_u8, cfg.vision.image_size)
        return encode_image(p, x, cfg, compute_dtype=jnp.bfloat16,
                            attn_impl="auto", seq_pad=True)

    def make_enc_int8(gemm_impl, **kw):
        def enc(q, x_u8):
            x = preprocess_batch(x_u8, cfg.vision.image_size)
            return encode_image_int8(q, x, cfg, attn_impl="auto",
                                     gemm_impl=gemm_impl, **kw)
        return enc

    qv_static = None
    for v in which:
        if v == "bf16":
            ips = bench_scanned(enc_bf16, params, xs, batch)
        elif v == "bf16pad":
            ips = bench_scanned(enc_bf16_pad, params, xs, batch)
        elif v.startswith("static"):
            if qv_static is None:
                calib_imgs = preprocess_batch(xs[0], cfg.vision.image_size)
                calib = jax.jit(lambda p, im: calibrate_vision_tower(
                    p, im, cfg, attn_impl="auto"))(params, calib_imgs)
                qv_static = quantize_vision_tower_static(params, calib)
            impl, kw = (v[:-6], {"seq_pad": False}) if v.endswith("_nopad") else (v, {})
            ips = bench_scanned(make_enc_int8(impl, **kw), qv_static, xs, batch)
        else:
            ips = bench_scanned(make_enc_int8(v), qv, xs, batch)
        print(f"B={batch} {v}: {ips:.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
