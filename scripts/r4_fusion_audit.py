"""Fusion→bytes→floor audit of the static3d_qi encode (round-4 verdict
item 3): compile the EXACT bench graph (cached), extract each profiled
fusion's body from the optimized HLO, sum its parameter/output buffer bytes,
and compare against the 819 GB/s HBM floor and the int8 MXU floor.

Prints a table: fusion name → dominant ops → bytes moved → HBM-floor ms →
measured ms (from scripts/r4_profile.py's trace numbers, passed via env or
defaults from the round-4 trace).
"""

import os
import re
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

HBM_GBPS = 819.0
DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "s8": 1,
               "u8": 1, "pred": 1, "s64": 8}


def shape_bytes(shape_str: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def main():
    impl = os.environ.get("IMPL", "static3d_qi")
    batch = int(os.environ.get("BATCH", "256"))
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, 256, (batch, 224, 224, 3), dtype=np.uint8))
    calib_imgs = preprocess_batch(xs, cfg.vision.image_size)
    calib = jax.jit(lambda p, im: calibrate_vision_tower(
        p, im, cfg, attn_impl="auto"))(params, calib_imgs)
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)

    def enc(q, x_u8):
        im = preprocess_batch(x_u8, cfg.vision.image_size)
        return encode_image_int8(q, im, cfg, attn_impl="auto", gemm_impl=impl)

    lowered = jax.jit(enc).lower(qv, xs)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = f"/tmp/qi_encode_{impl}.hlo"
    with open(out, "w") as fh:
        fh.write(txt)
    print(f"HLO -> {out} ({len(txt)} bytes)")

    # fusion computations: map "%fused_computation.N" bodies and the calling
    # fusion instruction's operand/result shapes
    # calls look like: %fusion.N = TYPE[...] fusion(ARGS), kind=..., calls=%fused_computation.M
    fusions = {}
    for m in re.finditer(
            r"ROOT? ?%?([\w.-]+) = ([^\s]+) fusion\(([^)]*)\).*calls=%?([\w.-]+)",
            txt):
        name, out_shape, args, comp = m.group(1), m.group(2), m.group(3), m.group(4)
        # tuple outputs: (f32[...], bf16[...]) — collect all shapes
        outs = re.findall(r"(\w+\[[\d,]*\])", out_shape)
        arg_shapes = re.findall(r"(\w+\[[\d,]*\])", args)
        fusions[name] = {"outs": outs, "args": arg_shapes, "comp": comp}

    # body op summary per fused computation
    comp_ops = defaultdict(lambda: defaultdict(int))
    cur = None
    for line in txt.splitlines():
        mm = re.match(r"%?([\w.-]+) \(", line.strip())
        if line.startswith("%fused_computation") or line.startswith("fused_computation"):
            cur = line.split(" ")[0].lstrip("%")
        elif line.startswith("}"):
            cur = None
        elif cur:
            op = re.search(r"= *\w+\[[\d,]*\]\{?[\d,]*\}? (\w[\w-]*)\(", line)
            if op:
                comp_ops[cur][op.group(1)] += 1

    names = os.environ.get(
        "FUSIONS",
        "fusion.866,fusion.875,convert_reduce_fusion.55,"
        "convert_reduce_fusion.56,fusion.901,fusion.862").split(",")
    print(f"\n{'fusion':28s} {'bytes(MB)':>10s} {'HBM floor':>10s}  dominant body ops")
    for want in names:
        # trace names may differ from HLO names by suffix; match prefix family
        hits = [k for k in fusions if k == want] or \
               [k for k in fusions if k.startswith(want.rsplit('.', 1)[0])]
        if not hits:
            print(f"{want:28s}  — not found")
            continue
        k = hits[0] if want not in fusions else want
        f = fusions[k]
        nbytes = sum(shape_bytes(s) for s in f["outs"]) + \
            sum(shape_bytes(s) for s in f["args"])
        ops = comp_ops.get(f["comp"], {})
        dom = ", ".join(f"{o}×{c}" for o, c in
                        sorted(ops.items(), key=lambda kv: -kv[1])[:6])
        print(f"{k:28s} {nbytes/1e6:10.1f} {nbytes/1e9/HBM_GBPS*1e3:9.3f}ms  {dom}")

    # also: every fusion family ranked by total operand+result bytes
    fam = defaultdict(float)
    for k, f in fusions.items():
        nb = sum(shape_bytes(s) for s in f["outs"]) + sum(shape_bytes(s) for s in f["args"])
        fam[re.sub(r"\.\d+$", "", k)] += nb
    print("\nbytes by fusion family (whole graph):")
    for k, v in sorted(fam.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {k:32s} {v/1e9:8.2f} GB  ({v/1e9/HBM_GBPS*1e3:6.2f} ms at HBM floor)")


if __name__ == "__main__":
    main()
