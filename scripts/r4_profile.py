"""Profile the round-4 static3d_qi tower and itemize the cost buckets
(round-4 verdict item 3: fusions → ms → bytes-vs-floor table).

Captures a jax.profiler trace of the scanned encode (the bench protocol),
parses the device lane of vm.trace.json.gz, and buckets op self-times by
name family. Prints per-bucket ms/batch and the top individual ops.

Env: IMPL=static3d_qi BATCH=256 ITERS=4 OUT=/tmp/r4_prof
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from team_tpu.utils.jax_cache import enable as _enable
_enable()

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.backbone.clip import CLIPConfig, init_clip_params
from team_tpu.backbone.quant import (calibrate_vision_tower, encode_image_int8,
                                     quantize_vision_tower_static)
from team_tpu.ops.preprocess import preprocess_batch


def main():
    impl = os.environ.get("IMPL", "static3d_qi")
    batch = int(os.environ.get("BATCH", "256"))
    iters = int(os.environ.get("ITERS", "4"))
    out_dir = os.environ.get("OUT", "/tmp/r4_prof")
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, 256, (iters, batch, 224, 224, 3),
                                  dtype=np.uint8))
    calib_imgs = preprocess_batch(xs[0], cfg.vision.image_size)
    calib = jax.jit(lambda p, im: calibrate_vision_tower(
        p, im, cfg, attn_impl="auto"))(params, calib_imgs)
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)

    if os.environ.get("INGEST", "image") == "patches":
        # production patch-major ingest (round 4): profile the exact
        # bench.py headline graph
        from team_tpu.backbone.clip import patch_pixels
        from team_tpu.backbone.quant import encode_image_int8_patches

        xs = jax.jit(jax.vmap(
            lambda im: patch_pixels(im, cfg, compute_dtype=jnp.uint8)))(xs)
        float(jnp.sum(xs[..., 0].astype(jnp.int32)))

        @jax.jit
        def run(q, xs):
            def body(c, px):
                return c, encode_image_int8_patches(
                    q, px, cfg, attn_impl="auto", gemm_impl=impl)
            _, outs = jax.lax.scan(body, None, xs)
            return outs
    else:
        @jax.jit
        def run(q, xs):
            def body(c, x):
                im = preprocess_batch(x, cfg.vision.image_size)
                return c, encode_image_int8(q, im, cfg, attn_impl="auto",
                                            gemm_impl=impl)
            _, outs = jax.lax.scan(body, None, xs)
            return outs

    float(jnp.sum(run(qv, xs)[..., 0]))  # compile + warm
    with jax.profiler.trace(out_dir):
        float(jnp.sum(run(qv, xs)[..., 0]))

    traces = sorted(glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                              recursive=True))
    assert traces, f"no trace under {out_dir}"
    with gzip.open(traces[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    # find the device lane: pid whose thread names look like TPU op streams
    by_pid = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            by_pid[e["pid"]] += e["dur"]
    # device pid = the one with the op-name events (skip python host lanes)
    op_events = [e for e in events
                 if e.get("ph") == "X" and "dur" in e
                 and not str(e.get("name", "")).startswith(("$", "Thread",
                                                            "python",))]

    def bucket(name: str) -> str:
        n = name.lower()
        if "custom-call" in n or "mosaic" in n or "tpu_custom_call" in n:
            return "attention-kernel(custom-call)"
        if n.startswith("fusion") or ".fusion" in n:
            if "reduce" in n or "convert_reduce" in n:
                return "LN-reduce-fusions"
            return "fusions(dot+elementwise)"
        if "reduce" in n:
            return "LN-reduce-fusions"
        if "convolution" in n or n.startswith("conv"):
            return "conv(patch-embed/dots)"
        if "clamp" in n or "round" in n:
            return "quantize-clamps"
        if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
            return "layout-copies"
        if "all-" in n or "collective" in n:
            return "collectives"
        return "other"

    buckets = defaultdict(float)
    tops = defaultdict(float)
    for e in op_events:
        pidname = e.get("pid")
        # keep only clearly device-side events: heuristically, ops with XLA
        # names (contain '.' or start with fusion/conv/copy/custom)
        nm = str(e.get("name", ""))
        if not any(t in nm.lower() for t in ("fusion", "conv", "copy", "custom",
                                             "reduce", "dot", "transpose",
                                             "clamp", "scan", "while", "bitcast",
                                             "dynamic", "broadcast", "iota",
                                             "select", "concatenate", "slice")):
            continue
        buckets[bucket(nm)] += e["dur"]
        tops[nm] += e["dur"]

    total = sum(buckets.values())
    print(f"\nIMPL={impl}  trace total device-op time: {total/1e3:.1f} ms "
          f"over {iters} batches -> {total/1e3/iters:.2f} ms/batch")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {k:36s} {v/1e3/iters:8.2f} ms/batch  ({100*v/total:.1f}%)")
    print("\ntop 25 ops (summed):")
    for k, v in sorted(tops.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v/1e3/iters:8.3f} ms/batch  {k[:110]}")


if __name__ == "__main__":
    main()
