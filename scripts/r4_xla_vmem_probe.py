"""Whole-graph XLA scoped-VMEM ladder (round-4 continuation).

The shipped graph's dot mega-fusions run at ~83 % of int8 MXU peak and the
fusion-bytes audit says they are MXU-bound, not traffic-bound — the one
compiler resource that bounds how deep the batch-in-sublanes conv emitter
can pipeline VMEM-resident segments is the scoped-VMEM budget (default
~16 MB). Unlike env XLA_FLAGS (client-side; the axon tunnel compiles
remotely), per-jit ``compiler_options`` ride the compile request, so the
ladder actually reaches the remote compiler.

Variants (exact headline protocol: patch-major u8 ingest, static3d_qi, kq
CLS-last, B=256, scan-16, chained dispatches + one fence):
  base — default options (the shipped graph, cached)
  v32  — xla_tpu_scoped_vmem_limit_kib=32768
  v48  — 49152
  v64  — 65536

Env: WHICH=base,v32,v48,v64  BATCH=256  ITERS=16  CHUNKS=4
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

VARIANTS = {
    "base": None,
    "v32": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "v48": {"xla_tpu_scoped_vmem_limit_kib": "49152"},
    "v64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    # emitter/autotune candidates (flag names enumerated from libtpu 0.0.34;
    # unknown-to-server names fail the compile and are reported, not fatal)
    "autod": {"xla_tpu_autotune_dots": "true"},
    "autof": {"xla_tpu_autotune_dots": "true",
              "xla_tpu_autotune_fusions": "true"},
    "joinmxu": {"xla_tpu_join_mxu_result_add": "true"},
    "unroll": {"xla_tpu_enable_pipelined_loop_unrolling": "true"},
}


def _fence(x) -> float:
    return float(jnp.sum(x[..., :1].astype(jnp.float32)))


def main():
    which = os.environ.get("WHICH", "base,v32,v48,v64").split(",")
    batch = int(os.environ.get("BATCH", "256"))
    iters = int(os.environ.get("ITERS", "16"))
    n_chunks = int(os.environ.get("CHUNKS", "4"))
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    patchify = jax.jit(jax.vmap(
        lambda im: patch_pixels(im, cfg, compute_dtype=jnp.uint8)))
    chunks = []
    for _ in range(n_chunks):
        xs = jnp.asarray(rng.integers(0, 256, (iters, batch, 224, 224, 3),
                                      dtype=np.uint8))
        chunks.append(patchify(xs))
        _fence(chunks[-1])
    calib_src = jnp.asarray(rng.integers(
        0, 256, (batch, 224, 224, 3), dtype=np.uint8))
    calib_imgs = preprocess_batch(calib_src, cfg.vision.image_size)
    calib = jax.jit(lambda p, im: calibrate_vision_tower(
        p, im, cfg, attn_impl="auto"))(params, calib_imgs)
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)

    @jax.jit
    def run_p(q, px):
        def body(c, x):
            return c, encode_image_int8_patches(q, x, cfg, attn_impl="auto",
                                                gemm_impl="static3d_qi")
        _, outs = jax.lax.scan(body, None, px)
        return outs

    lowered = run_p.lower(qv, chunks[0])
    ref = None
    n_img = batch * iters * n_chunks
    for v in which:
        opts = VARIANTS[v]
        t0 = time.perf_counter()
        try:
            compiled = lowered.compile(compiler_options=opts)
        except Exception as e:
            print(f"{v}: COMPILE FAILED {str(e)[:200]}", flush=True)
            continue
        print(f"{v}: compiled in {time.perf_counter() - t0:.0f}s", flush=True)
        out = compiled(qv, chunks[0])
        _fence(out)
        got = np.asarray(out[0], np.float64)
        if ref is None:
            ref = got
        else:
            cos = (ref * got).sum(-1) / (np.linalg.norm(ref, axis=-1)
                                         * np.linalg.norm(got, axis=-1))
            print(f"{v}: cos vs base min={cos.min():.6f}", flush=True)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [compiled(qv, c) for c in chunks]
            _fence(outs[-1])
            best = max(best, n_img / (time.perf_counter() - t0))
        print(f"B={batch} {v}: {best:.0f} img/s "
              f"({n_chunks}x scan-{iters} chain)", flush=True)


if __name__ == "__main__":
    main()
