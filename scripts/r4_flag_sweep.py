"""Single-flag sweep over plausibly-relevant XLA:TPU compiler options
(round-4 continuation). The options ladder showed per-jit compiler_options
reach the remote compiler and compiles for this graph are cheap (~15-30 s),
so a broad sweep is affordable. Each variant: compile the exact headline
scan graph with ONE flag flipped, check cosine vs the default graph, time a
4-chunk one-fence chain. Numerics-risky flags are gated by the cosine check
(fused int8 math is exact; any drift is a red flag for the variant).

Flag names come from `strings libtpu.so | grep xla_tpu_` (libtpu 0.0.34).
Unknown/invalid names fail the compile and are reported, not fatal.

Env: BATCH=256 ITERS=16 CHUNKS=4 FLAGS=f1=v1[,f2=v2...] (override list)
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

SWEEP = [
    "xla_tpu_dot_dot_fusion=true",
    "xla_tpu_dot_dot_fusion_duplicated=true",
    "xla_tpu_enable_multi_level_input_dot_dot_fusion=true",
    "xla_tpu_enable_multi_level_output_dot_dot_fusion=true",
    "xla_tpu_enable_multi_level_nested_dot_fusion=true",
    "xla_tpu_enable_multi_level_nested_loop_fusion=true",
    "xla_tpu_enable_aggressive_loop_fusion_layout_opt=true",
    "xla_tpu_enable_fusion_layout_update=true",
    "xla_tpu_enable_experimental_fusion_cost_model=true",
    "xla_tpu_enable_indexing_optimizations=true",
    "xla_tpu_enable_bf16_slp_vectorizer=true",
    "xla_tpu_enable_pincer_short_emitter=true",
    "xla_tpu_enable_pincer_short_fusion_emitter=true",
    "xla_tpu_enable_async_pincer_emitter=true",
    "xla_tpu_enable_mosaic_emitters=true",
    "xla_tpu_allow_conv_input_fusion_with_downcast_convert=true",
    "xla_tpu_allow_input_fusion_in_certain_reduce_ops=true",
    "xla_tpu_enable_latency_hiding_scheduler=true",
    "xla_tpu_enable_all_experimental_scheduler_features=true",
    "xla_tpu_autotune_fusions=true",
    "xla_tpu_autotune_schedules=true",
    "xla_tpu_enable_sublane_major_scaling_bitcast_fusion=true",
    "xla_tpu_enable_copy_permute_minor_fusion=true",
    "xla_tpu_enable_megacore_fusion=false",
    "xla_tpu_copy_fusion_allow_split=true",
]


def _fence(x) -> float:
    return float(jnp.sum(x[..., :1].astype(jnp.float32)))


def main():
    batch = int(os.environ.get("BATCH", "256"))
    iters = int(os.environ.get("ITERS", "16"))
    n_chunks = int(os.environ.get("CHUNKS", "4"))
    sweep = os.environ.get("FLAGS", "").split(",") if os.environ.get("FLAGS") \
        else SWEEP
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
    calib = jax.jit(lambda p, im: calibrate_vision_tower(
        p, preprocess_batch(im, cfg.vision.image_size), cfg,
        attn_impl="auto"))(params, calib_src)
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)

    @jax.jit
    def run_p(q, px):
        def body(c, x):
            return c, encode_image_int8_patches(q, x, cfg, attn_impl="auto",
                                                gemm_impl="static3d_qi")
        _, outs = jax.lax.scan(body, None, px)
        return outs

    lowered = run_p.lower(qv, chunks[0])
    n_img = batch * iters * n_chunks

    def measure(compiled):
        out = compiled(qv, chunks[0])
        _fence(out)
        got = np.asarray(out[0], np.float64)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [compiled(qv, c) for c in chunks]
            _fence(outs[-1])
            best = max(best, n_img / (time.perf_counter() - t0))
        return best, got

    base_c = lowered.compile()
    base_ips, ref = measure(base_c)
    print(f"base: {base_ips:.0f} img/s", flush=True)

    results = []
    for spec in sweep:
        name, _, val = spec.partition("=")
        t0 = time.perf_counter()
        try:
            compiled = lowered.compile(compiler_options={name: val})
        except Exception as e:
            print(f"{spec}: COMPILE FAILED {str(e)[:120]}", flush=True)
            continue
        dt = time.perf_counter() - t0
        try:
            ips, got = measure(compiled)
        except Exception as e:
            print(f"{spec}: RUN FAILED {str(e)[:120]}", flush=True)
            continue
        cos = (ref * got).sum(-1) / (np.linalg.norm(ref, axis=-1)
                                     * np.linalg.norm(got, axis=-1))
        ok = cos.min() >= 0.999999
        results.append((ips, spec, cos.min(), ok))
        print(f"{spec}: {ips:.0f} img/s ({ips - base_ips:+.0f})  "
              f"cos={cos.min():.7f}{'' if ok else '  NUMERICS'}  "
              f"[compile {dt:.0f}s]", flush=True)

    results.sort(reverse=True)
    print("\n=== top (numerics-clean) ===", flush=True)
    for ips, spec, cmin, ok in results[:8]:
        if ok:
            print(f"  {ips:.0f}  {spec}", flush=True)


if __name__ == "__main__":
    main()
