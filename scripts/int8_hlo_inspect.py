"""Inspect the OPTIMIZED TPU HLO of one int8-XLA block layer: did the
dequant epilogue fuse into the dot, or does the int32 GEMM output (465 MB at
the qkv shape) round-trip HBM? Prints buffer-donation-level stats: every
s32 tensor >= 100 MB that appears as a fusion ROOT/parameter shape, plus
total bytes-accessed from XLA's own cost analysis.
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from team_tpu.utils.jax_cache import enable as _enable
_enable()

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.backbone.clip import CLIPConfig, init_clip_params
from team_tpu.backbone.quant import (_qblock_forward, _qblock_forward_hybrid,
                                     _qblock_forward_static,
                                     _qblock_forward_xla, quantize_block,
                                     quantize_block_static)


def main():
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    v = cfg.vision
    x = jnp.zeros((256, v.seq_len, v.width), jnp.bfloat16)

    impl = os.environ.get("IMPL", "xla")
    blk = params["vision"]["blocks"][0]
    if impl == "static":
        import numpy as _np
        stats = {"ln1": jnp.ones((v.width,)), "attn_o": jnp.ones((v.width,)),
                 "ln2": jnp.ones((v.width,)), "gelu": jnp.ones((4 * v.width,))}
        qb = quantize_block_static(blk, stats)
    else:
        qb = quantize_block(blk)
    block = {"xla": _qblock_forward_xla, "hybrid": _qblock_forward_hybrid,
             "static": _qblock_forward_static,
             "pallas": _qblock_forward}[impl]

    def f(qb, x):
        return block(qb, x, v.heads, v.seq_len,
                     attn_impl="auto", interpret=False)

    lowered = jax.jit(f).lower(qb, x)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        print({k: ca.get(k) for k in ("bytes accessed", "flops",
                                      "bytes accessed output")}, flush=True)
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", flush=True)
    txt = compiled.as_text()
    out = os.environ.get("HLO_OUT", f"/tmp/int8_block_{impl}.hlo")
    with open(out, "w") as fh:
        fh.write(txt)
    print(f"HLO -> {out} ({len(txt)} bytes)", flush=True)

    # big s32/f32 intermediates that live as standalone op results (i.e. HBM)
    big = {}
    for m in re.finditer(r"^\s*(?:ROOT )?%?([\w.-]+) = (s32|f32|s8|bf16)\[(\d+),(\d+)\]", txt, re.M):
        name, dt, a, b = m.group(1), m.group(2), int(m.group(3)), int(m.group(4))
        nb = a * b * {"s32": 4, "f32": 4, "s8": 1, "bf16": 2}[dt]
        if nb >= 100e6:
            big.setdefault((dt, a, b, nb), []).append(name)
    for (dt, a, b, nb), names in sorted(big.items(), key=lambda kv: -kv[0][3]):
        heads = [n for n in names if not n.startswith(("fusion", "copy"))]
        print(f"{dt}[{a},{b}] {nb/1e6:.0f} MB x{len(names)}: "
              f"{', '.join(names[:6])}", flush=True)


if __name__ == "__main__":
    main()
