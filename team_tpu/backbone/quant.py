"""int8-quantized CLIP ViT image tower (inference path).

The backbone is FROZEN in every learner (reference ``models/proof.py:353-356``),
so its weights can be quantized once, offline: per-output-channel int8 for the
four GEMM weights of every transformer block (qkv / attn-out / mlp-fc /
mlp-proj — ≈66 ms of the 113 ms bf16 encode at B=256), with dynamic per-token
activation quantization. LayerNorms, the softmax-bound attention core, patch
embedding, and the final projection stay in bf16/f32 — they are VPU/HBM-bound,
not MXU-bound, and keeping them high-precision protects the cosine-similarity
gate (>= 0.999 vs the bf16 tower, tests + docs/BENCH.md).

GEMMs run on :func:`team_tpu.ops.int8_matmul.int8_linear` — the Pallas kernel
that reaches the MXU's native int8 mode XLA won't emit (2x the bf16 MXU rate;
replaces the reference's cuBLAS tier, ``utils/inc_net.py:19-32``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from team_tpu.backbone.clip import (CLIPConfig, Params, _layer_norm,
                                    _maybe_pad_seq, embed_patches,
                                    patch_pixels)
from team_tpu.ops.attention import multi_head_attention
from team_tpu.ops.int8_matmul import (
    int8_linear,
    int8_linear_blockscale,
    int8_linear_gelu_quant,
    int8_linear_xla,
    ln_quantize,
    ln_quantize_static,
    quantize_rows,
    quantize_weight,
    row_quant_static,
)


def quantize_block(blk: Params) -> Dict[str, Any]:
    """Quantize one transformer block's GEMM weights (per-output-channel)."""
    out = {"ln_1": blk["ln_1"], "ln_2": blk["ln_2"]}
    for src, dst in (("qkv", "qkv"), ("out", "out")):
        w, s = quantize_weight(blk["attn"][f"{src}_w"])
        out[dst] = {"w_q": w, "scale": s, "b": blk["attn"][f"{src}_b"].astype(jnp.float32)}
    for src in ("fc", "proj"):
        w, s = quantize_weight(blk["mlp"][f"{src}_w"])
        out[src] = {"w_q": w, "scale": s, "b": blk["mlp"][f"{src}_b"].astype(jnp.float32)}
    return out


def quantize_vision_tower(params: Params) -> Dict[str, Any]:
    """Offline weight quantization of the image tower. Non-GEMM params pass
    through in full precision."""
    v = params["vision"]
    return {
        "patch_w": v["patch_w"],
        "cls": v["cls"],
        "pos": v["pos"],
        "ln_pre": v["ln_pre"],
        "blocks": [quantize_block(b) for b in v["blocks"]],
        "ln_post": v["ln_post"],
        "proj": v["proj"],
    }


def _qlinear(x2d: jax.Array, qp: Dict[str, Any], activation=None, interpret=False):
    x_q, x_scale = quantize_rows(x2d)
    return int8_linear(x_q, qp["w_q"], x_scale, qp["scale"], qp["b"],
                       activation=activation, interpret=interpret)


def _attn_core(qkv: jax.Array, heads: int, kv_len, *, attn_impl: str,
               interpret: bool, causal: bool) -> jax.Array:
    """Shared bf16 attention core: ``[b, s, 3d]`` packed qkv -> ``[b*s, d]``."""
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    if attn_impl == "auto" and s < 512 and jax.default_backend() in ("tpu", "axon"):
        attn_impl = "mha_packed"  # transpose-free packed kernel (see clip.py)
    if attn_impl == "mha_packed":
        from team_tpu.ops.mha_short import fused_mha_packed

        return fused_mha_packed(
            qkv, heads, causal=causal, interpret=interpret,
            kv_len=kv_len if (kv_len is not None and kv_len < s) else None,
        ).reshape(b * s, d)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(t):
        return t.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)

    o = multi_head_attention(split_heads(q), split_heads(k), split_heads(v),
                             kv_len, causal=causal, impl=attn_impl)
    return o.transpose(0, 2, 1, 3).reshape(b * s, d)


def _ln_quant_jnp(x2d: jax.Array, gamma: jax.Array, beta: jax.Array):
    """Plain-jnp LayerNorm + per-row int8 quantize (XLA fuses the chain).
    Numerics identical to :func:`team_tpu.ops.int8_matmul.ln_quantize`."""
    x32 = x2d.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return quantize_rows(y)


def _qblock_forward_xla(qb: Dict[str, Any], x: jax.Array, heads: int, kv_len,
                        *, attn_impl: str, interpret: bool,
                        causal: bool = False) -> jax.Array:
    """One quantized transformer block riding XLA's int8 GEMM engine.

    Round-3 shoot-out result (docs/BENCH.md): XLA's int8 ``dot_general`` beats
    every Mosaic kernel AND XLA's own bf16 at ViT shapes, and XLA fuses the
    jnp quantize/dequant chains into the GEMM fusions on its own — no Pallas
    needed anywhere on this path (the attention core is shared with the
    Pallas variant). GELU is exact (erf), matching the bf16 tower.
    """
    b, s, d = x.shape
    hq, hs = _ln_quant_jnp(x.reshape(b * s, d), qb["ln_1"]["scale"],
                           qb["ln_1"]["bias"])
    qkv = int8_linear_xla(hq, qb["qkv"]["w_q"], hs, qb["qkv"]["scale"],
                          qb["qkv"]["b"]).reshape(b, s, 3 * d)
    o = _attn_core(qkv, heads, kv_len, attn_impl=attn_impl,
                   interpret=interpret, causal=causal)
    oq, osc = quantize_rows(o)
    x = x + int8_linear_xla(oq, qb["out"]["w_q"], osc, qb["out"]["scale"],
                            qb["out"]["b"]).reshape(b, s, d)

    hq, hs = _ln_quant_jnp(x.reshape(b * s, d), qb["ln_2"]["scale"],
                           qb["ln_2"]["bias"])
    h = int8_linear_xla(hq, qb["fc"]["w_q"], hs, qb["fc"]["scale"],
                        qb["fc"]["b"], activation="gelu")
    gq, gs = quantize_rows(h)
    proj = int8_linear_xla(gq, qb["proj"]["w_q"], gs, qb["proj"]["scale"],
                           qb["proj"]["b"])
    return x + proj.reshape(b, s, d)


def _qblock_forward_hybrid(qb: Dict[str, Any], x: jax.Array, heads: int, kv_len,
                           *, attn_impl: str, interpret: bool,
                           causal: bool = False) -> jax.Array:
    """Hybrid engine selection, one choice per GEMM (HLO-driven, round 3):

    * LN → quantize: Pallas ``ln_quantize`` — ONE HBM pass; the pure-jnp LN
      chain materializes THREE f32 copies of the activation (155 MB each at
      B=256, seen in the optimized HLO);
    * qkv / attn-out GEMMs: XLA int8 ``dot_general`` (the fastest engine,
      ~1.25× bf16) — their dequant epilogues are pure-elementwise, so XLA
      fuses them into the dot's output fusion (verified in HLO: one bf16
      output buffer, no s32 round trip);
    * fc GEMM: Pallas ``int8_linear_gelu_quant`` — the GELU+re-quantize
      consumer contains a REDUCTION (row amax), which XLA cannot fuse into a
      dot, so the XLA path pays a 310 MB bf16 materialize + 620 MB of
      re-reads; the Pallas kernel keeps the [M, 4D] activation entirely in
      VMEM;
    * proj GEMM: Pallas ``int8_linear_blockscale`` (consumes the block-scale
      int8 activation directly).
    """
    b, s, d = x.shape
    hq, hs = ln_quantize(x.reshape(b * s, d), qb["ln_1"]["scale"],
                         qb["ln_1"]["bias"], interpret=interpret)
    qkv = int8_linear_xla(hq, qb["qkv"]["w_q"], hs, qb["qkv"]["scale"],
                          qb["qkv"]["b"]).reshape(b, s, 3 * d)
    o = _attn_core(qkv, heads, kv_len, attn_impl=attn_impl,
                   interpret=interpret, causal=causal)
    oq, osc = quantize_rows(o)
    x = x + int8_linear_xla(oq, qb["out"]["w_q"], osc, qb["out"]["scale"],
                            qb["out"]["b"]).reshape(b, s, d)

    hq, hs = ln_quantize(x.reshape(b * s, d), qb["ln_2"]["scale"],
                         qb["ln_2"]["bias"], interpret=interpret)
    gq, gs = int8_linear_gelu_quant(hq, qb["fc"]["w_q"], hs, qb["fc"]["scale"],
                                    qb["fc"]["b"], interpret=interpret)
    proj = int8_linear_blockscale(gq, qb["proj"]["w_q"], gs, qb["proj"]["scale"],
                                  qb["proj"]["b"], interpret=interpret)
    return x + proj.reshape(b, s, d)


# ---------------------------------------------------------------------------
# Static (calibrated) activation quantization — the W8A8-static tier.
#
# Dynamic per-row scales force a row-amax REDUCTION between every producer and
# every int8 GEMM; XLA cannot fuse reduction-bearing consumers into dots, so
# each quantize costs a full HBM round trip of the activation (the measured
# reason every dynamic int8 tower loses to bf16 — docs/BENCH.md round 3).
# With per-INPUT-CHANNEL scales calibrated offline, quantization is pure
# elementwise (q = clip(round(x * inv_scale))) and fuses into whatever
# produced x, and the activation scale folds INTO the downstream weight:
#     y = x @ w ≈ (q · s_a) @ w = q @ (s_a[:, None] · w)
# so the GEMM epilogue never sees a per-row scale either. The entire block
# becomes XLA int8 dots + fused elementwise chains: minimum HBM traffic AND
# the fastest GEMM engine. (Same scheme as SmoothQuant-style static W8A8.)
# ---------------------------------------------------------------------------


def _block_calib_forward(blk: Params, x: jax.Array, heads: int, kv_len,
                         *, attn_impl: str, causal: bool = False):
    """bf16 block forward (numerics of ``clip._block_forward``) that also
    returns the per-channel abs-max of the four GEMM input activations."""
    b, s, d = x.shape
    h = _layer_norm(blk["ln_1"], x).reshape(b * s, d)
    a_ln1 = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=0)
    qkv = (h @ blk["attn"]["qkv_w"].astype(h.dtype)
           + blk["attn"]["qkv_b"].astype(h.dtype)).reshape(b, s, 3 * d)
    a_qkv = jnp.max(jnp.abs(qkv.astype(jnp.float32)), axis=(0, 1))
    # per-head max attention LOGIT (q·kᵀ·dh^-0.5): feeds the static-max
    # softmax in the integer-QKᵀ kernel (TEAM_QI_SOFTMAX=static), which
    # replaces the row-max reduce over the [S,S] logits with this constant.
    # Signed max (softmax subtracts the max, not the abs-max); causal/kv
    # masking ignored — an over-estimate only costs unused exp2 headroom.
    dh = d // heads
    qh = qkv[..., :d].reshape(b, s, heads, dh)
    kh = qkv[..., d:2 * d].reshape(b, s, heads, dh)
    lg = jnp.einsum("bqhc,bkhc->bhqk", qh, kh,
                    preferred_element_type=jnp.float32)
    a_lmax = jnp.max(lg, axis=(0, 2, 3)) * dh ** -0.5
    o = _attn_core(qkv, heads, kv_len, attn_impl=attn_impl, interpret=False,
                   causal=causal)
    a_o = jnp.max(jnp.abs(o.astype(jnp.float32)), axis=0)
    x = x + (o @ blk["attn"]["out_w"].astype(o.dtype)
             + blk["attn"]["out_b"].astype(o.dtype)).reshape(b, s, d)
    h = _layer_norm(blk["ln_2"], x).reshape(b * s, d)
    a_ln2 = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=0)
    g = jax.nn.gelu(h @ blk["mlp"]["fc_w"].astype(h.dtype)
                    + blk["mlp"]["fc_b"].astype(h.dtype), approximate=False)
    a_g = jnp.max(jnp.abs(g.astype(jnp.float32)), axis=0)
    x = x + (g @ blk["mlp"]["proj_w"].astype(g.dtype)
             + blk["mlp"]["proj_b"].astype(g.dtype)).reshape(b, s, d)
    return x, {"ln1": a_ln1, "attn_o": a_o, "ln2": a_ln2, "gelu": a_g,
               "qkv_out": a_qkv, "qk_lmax": a_lmax}


def calibrate_vision_tower(params: Params, images: jax.Array, cfg: CLIPConfig,
                           *, attn_impl: str = "auto",
                           return_features: bool = False):
    """Per-block, per-channel activation abs-max over a calibration batch
    (``[B, H, W, 3]`` preprocessed images). Run on representative data; the
    returned stats feed :func:`quantize_vision_tower_static`.

    ``return_features=True`` additionally returns the bf16 tower's embedding
    of the calibration batch (this forward IS the bf16 tower) — the cosine
    gate then needs no separate bf16 encode graph, which on the axon tunnel
    costs minutes of per-run warm-start (docs/BENCH.md round 3)."""
    px = patch_pixels(images, cfg, compute_dtype=jnp.bfloat16)
    return _calibrate_from_px(params, px, cfg, attn_impl=attn_impl,
                              return_features=return_features)


def calibrate_vision_tower_patches(params: Params, patches_u8: jax.Array,
                                   cfg: CLIPConfig, *, attn_impl: str = "auto",
                                   return_features: bool = False):
    """Calibration entry for PATCH-MAJOR uint8 batches (the native loader's
    ``load_batch_u8_patches`` layout): /255 + CLIP-normalize fold in as
    per-column scale/bias, then the same calibration forward as
    :func:`calibrate_vision_tower` (identical math to within bf16 rounding —
    the runtime's held-out cosine gate still applies either way)."""
    assert patches_u8.dtype == jnp.uint8
    scale, bias = _patch_norm_consts(cfg)
    px = (patches_u8.astype(jnp.float32) * scale + bias).astype(jnp.bfloat16)
    return _calibrate_from_px(params, px, cfg, attn_impl=attn_impl,
                              return_features=return_features)


def _calibrate_from_px(params: Params, px: jax.Array, cfg: CLIPConfig, *,
                       attn_impl: str, return_features: bool):
    v = cfg.vision
    compute_dtype = jnp.bfloat16
    a_patch = jnp.max(jnp.abs(px.astype(jnp.float32)), axis=(0, 1))
    vis = params["vision"]
    tokens = px @ vis["patch_w"].astype(compute_dtype)
    b = tokens.shape[0]
    cls = jnp.broadcast_to(vis["cls"].astype(compute_dtype), (b, 1, v.width))
    x = jnp.concatenate([cls, tokens], axis=1)
    x = x + vis["pos"].astype(compute_dtype)
    x = _layer_norm(vis["ln_pre"], x)
    stats = []
    for blk in vis["blocks"]:
        x, st = _block_calib_forward(blk, x, v.heads, v.seq_len,
                                     attn_impl=attn_impl)
        stats.append(st)
    out = {"blocks": stats, "patch_in": a_patch}
    if not return_features:
        return out
    feats = _layer_norm(vis["ln_post"], x[:, 0])
    feats = (feats @ vis["proj"].astype(compute_dtype)).astype(jnp.float32)
    return out, feats


def _fold_site(w: jax.Array, bias: jax.Array, amax: jax.Array,
               margin: float) -> Dict[str, Any]:
    """Fold the static activation scale into the weight and quantize it."""
    amax = amax.astype(jnp.float32) * margin
    s_a = jnp.where(amax > 0, amax / 127.0, 1.0)       # [K]
    w_q, w_s = quantize_weight(w.astype(jnp.float32) * s_a[:, None])
    return {"w_q": w_q, "scale": w_s, "b": bias.astype(jnp.float32),
            "inv_a": (1.0 / s_a)[None, :]}             # [1, K]


def quantize_block_static(blk: Params, stats: Dict[str, jax.Array],
                          *, margin: float = 1.5,
                          heads: int | None = None) -> Dict[str, Any]:
    qkv_site = _fold_site(blk["attn"]["qkv_w"], blk["attn"]["qkv_b"],
                          stats["ln1"], margin)
    if "qkv_out" in stats:
        # static quantization of the qkv GEMM OUTPUT (feeds the int8-in/
        # int8-out attention kernel, gemm_impl="static_qa")
        a = stats["qkv_out"].astype(jnp.float32) * margin
        s_qkv = jnp.where(a > 0, a / 127.0, 1.0)
        qkv_site["out_inv_a"] = (1.0 / s_qkv)[None, :]
        qkv_site["deq"] = s_qkv[None, :]
        if heads is not None:
            # PER-HEAD-UNIFORM scales for the q/k segments: per-channel
            # scales cannot be pulled out of the QKᵀ contraction, a per-head
            # scalar can — enables the fully-integer QKᵀ MXU dot
            # (fused_mha_packed_q3i, gemm_impl="static3d_qi*").
            d = a.shape[0] // 3
            dh = d // heads
            aq = jnp.repeat(jnp.max(a[:d].reshape(heads, dh), axis=1), dh)
            ak = jnp.repeat(jnp.max(a[d:2 * d].reshape(heads, dh), axis=1), dh)
            au = jnp.concatenate([aq, ak, a[2 * d:]])
            s_u = jnp.where(au > 0, au / 127.0, 1.0)
            qkv_site["deq_i"] = s_u[None, :]
            qkv_site["out_inv_a_i"] = (1.0 / s_u)[None, :]
            sq_h = s_u[:d].reshape(heads, dh)[:, 0]
            sk_h = s_u[d:2 * d].reshape(heads, dh)[:, 0]
            qkv_site["qk_scale"] = (sq_h * sk_h * dh ** -0.5)[None, :]
            if "qk_lmax" in stats:
                # calibrated per-head max logit in exp2 units (+2-nat margin
                # for quantization noise; exp2 headroom is 88 nats) — the
                # static-max softmax constant (TEAM_QI_SOFTMAX=static)
                qkv_site["qk_m2"] = ((stats["qk_lmax"].astype(jnp.float32)
                                      + 2.0) * 1.4426950408889634)[None, :]
    return {
        "ln_1": blk["ln_1"], "ln_2": blk["ln_2"],
        "qkv": qkv_site,
        "out": _fold_site(blk["attn"]["out_w"], blk["attn"]["out_b"],
                          stats["attn_o"], margin),
        "fc": _fold_site(blk["mlp"]["fc_w"], blk["mlp"]["fc_b"],
                         stats["ln2"], margin),
        "proj": _fold_site(blk["mlp"]["proj_w"], blk["mlp"]["proj_b"],
                           stats["gelu"], margin),
    }


import functools as _functools


@_functools.partial(jax.jit, static_argnames=("margin", "heads"))
def quantize_vision_tower_static(params: Params, calib_stats,
                                 *, margin: float = 1.5,
                                 heads: int | None = None) -> Dict[str, Any]:
    """Offline static-W8A8 quantization of the image tower (activation scales
    from :func:`calibrate_vision_tower` folded into the weights).

    Jitted as ONE graph: the eager form issues ~600 tiny remote dispatches
    (12 blocks x 4 sites x ~12 ops), each with a sub-second mini-compile the
    persistent cache did not retain — measured ~550 s of per-run calibration
    overhead on the axon tunnel (docs/BENCH.md round 3)."""
    v = params["vision"]
    if isinstance(calib_stats, (list, tuple)):  # legacy: per-block list only
        block_stats, patch_in = calib_stats, None
    else:
        block_stats = calib_stats["blocks"]
        patch_in = calib_stats.get("patch_in")
    out = {
        "patch_w": v["patch_w"],
        "cls": v["cls"],
        "pos": v["pos"],
        "ln_pre": v["ln_pre"],
        "blocks": [quantize_block_static(b, st, margin=margin, heads=heads)
                   for b, st in zip(v["blocks"], block_stats)],
        "ln_post": v["ln_post"],
        "proj": v["proj"],
    }
    # NOTE: patch_in stats are recorded but the int8 patch-embed site is NOT
    # routed for float-image ingest — the routed version measured 4899 vs
    # 4964 img/s (the pixel quantize broke the preprocess->patch-dot fusion;
    # see encode_image_int8). For PATCH-MAJOR uint8 ingest the input is
    # integer already, so the u8-exact patch dot below has no activation
    # quantization error at all and no fusion to break (TEAM_PATCH_DOT=int8).
    del patch_in
    out["patch_q"] = _quantize_patch_dot(v["patch_w"])
    return out


def _quantize_patch_dot(patch_w: jax.Array) -> Dict[str, Any]:
    """u8-EXACT int8 patch embedding for patch-major uint8 ingest.

    ``tokens = (u8*scale + bias) @ W`` with per-column normalize constants
    rewrites as ``(u8-128) @ (scale⊙W) + [128·colsum(scale⊙W) + bias@W]``:
    the centered input is exactly representable in int8 (zero activation
    quantization error — only the per-output-channel weight quantize is
    lossy), so the patch dot runs as a native int8×int8→int32 MXU
    contraction with an f32 scale+const epilogue."""
    from team_tpu.ops.preprocess import patch_norm_consts

    ps = int(round((patch_w.shape[0] // 3) ** 0.5))
    scale, bias = patch_norm_consts(ps)
    w32 = patch_w.astype(jnp.float32)
    a = w32 * scale[:, None]
    w_q, w_s = quantize_weight(a)                      # [K,N], [1,N]
    const = 128.0 * jnp.sum(a, axis=0) + bias @ w32    # [N]
    return {"w_q": w_q, "scale": w_s, "const": const[None, :]}


def _static_quant(x2d: jax.Array, inv_a: jax.Array) -> jax.Array:
    """Pure-elementwise static quantize (fuses into the producer)."""
    return jnp.clip(jnp.round(x2d.astype(jnp.float32) * inv_a),
                    -127, 127).astype(jnp.int8)


def _static_linear(q: jax.Array, site: Dict[str, Any], activation=None,
                   quant_inv_a=None) -> jax.Array:
    """XLA int8 dot + fused dequant/bias/GELU epilogue. With ``quant_inv_a``
    the next site's static quantize rides the same fusion and the result is
    int8 — the full-precision GEMM output never reaches HBM.

    GELU is tanh-approximate in bf16: the profiler showed the f32 erf chain
    fused into the fc dot costs 2.95 ms/layer vs 0.69 ms for the identical
    proj dot with a plain epilogue — the epilogue, not the GEMM, was the
    cost. Same approximation the Mosaic kernels use; covered by the
    tower-level cosine gate (docs/BENCH.md round 3)."""
    acc = jax.lax.dot_general(q, site["w_q"], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * site["scale"] + site["b"][None, :]
    if activation == "gelu":
        out = jax.nn.gelu(out, approximate=True)
    if quant_inv_a is not None:
        return jnp.clip(jnp.round(out.astype(jnp.float32) * quant_inv_a),
                        -127, 127).astype(jnp.int8)
    return out.astype(jnp.bfloat16)


def _qblock_forward_static(qb: Dict[str, Any], x: jax.Array, heads: int,
                           kv_len, *, attn_impl: str, interpret: bool,
                           causal: bool = False) -> jax.Array:
    """Static-W8A8 block: XLA int8 dots + one-pass Pallas static-quantize
    producers. Every activation crosses HBM exactly once, in its narrowest
    dtype (the pure-jnp v1 materialized six 155 MB f32 LN/layout copies per
    layer — measured, docs/BENCH.md round 3)."""
    b, s, d = x.shape
    hq = ln_quantize_static(x.reshape(b * s, d), qb["ln_1"]["scale"],
                            qb["ln_1"]["bias"], qb["qkv"]["inv_a"],
                            interpret=interpret)
    qkv = _static_linear(hq, qb["qkv"]).reshape(b, s, 3 * d)
    o = _attn_core(qkv, heads, kv_len, attn_impl=attn_impl,
                   interpret=interpret, causal=causal)
    oq = row_quant_static(o, qb["out"]["inv_a"], interpret=interpret)
    x = x + _static_linear(oq, qb["out"]).reshape(b, s, d)
    hq = ln_quantize_static(x.reshape(b * s, d), qb["ln_2"]["scale"],
                            qb["ln_2"]["bias"], qb["fc"]["inv_a"],
                            interpret=interpret)
    gq = _static_linear(hq, qb["fc"], activation="gelu",
                        quant_inv_a=qb["proj"]["inv_a"])
    p = _static_linear(gq, qb["proj"])
    return x + p.reshape(b, s, d)


def _static_linear3(q3: jax.Array, site: Dict[str, Any], activation=None,
                    quant_inv_a=None) -> jax.Array:
    """3-D form of :func:`_static_linear` (``[B, S, K] @ [K, N]``). XLA's
    batch-in-sublanes emitter builds VMEM-resident mega-fusions around 3-D
    dots (the discovery that explains the bf16 tower's speed — see
    ``clip._block_forward``); this lets the int8 tier ride the same
    lowering."""
    acc = jax.lax.dot_general(q3, site["w_q"], (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    # f32 dequant epilogue: a bf16 variant measured FLAT (4964 vs 4964 img/s
    # — the conv-emitter fusions are not elementwise-bound), so keep the
    # precision margin on the int32 accumulators
    out = (acc.astype(jnp.float32) * site["scale"].reshape(1, 1, -1)
           + site["b"].reshape(1, 1, -1))
    if activation == "gelu":
        # TEAM_GELU (trace-time knob): "tanh" (default, the production
        # approximation), "sigmoid" (x·σ(1.702x) — fewer VPU ops, error
        # ~1e-2 absolute vs tanh's ~3e-4; only ships if the cosine gate
        # holds), "none" (PERF DIAGNOSTIC ONLY — wrong numerics, used to
        # test whether the fc fusion is epilogue-VPU-bound)
        mode = _os.environ.get("TEAM_GELU", "tanh")
        if mode == "sigmoid":
            out = out * jax.nn.sigmoid(1.702 * out)
        elif mode != "none":
            out = jax.nn.gelu(out, approximate=True)
    if quant_inv_a is not None:
        return jnp.clip(jnp.round(out * quant_inv_a.reshape(1, 1, -1)),
                        -127, 127).astype(jnp.int8)
    return out.astype(jnp.bfloat16)


def _static_quant3(x3: jax.Array, inv_a: jax.Array) -> jax.Array:
    return jnp.clip(jnp.round(x3.astype(jnp.float32) * inv_a.reshape(1, 1, -1)),
                    -127, 127).astype(jnp.int8)


import os as _os

# LN reduce structure for the static3d towers: "1pass" computes E[x] and
# E[x²] in ONE fused reduction pass (sibling sums over the same operand) so
# the [B,S,D] residual stream is read once, not twice, per LN site — measured
# +141 img/s end-to-end over the jnp.mean/jnp.var "2pass" form (4973 → 5114,
# round 4, docs/BENCH.md); numerics within one int8 step (tested). Set
# TEAM_LN_MODE=2pass to fall back.
_LN_MODE = _os.environ.get("TEAM_LN_MODE", "1pass")


def _ln_quant3(x3: jax.Array, ln: Params, inv_a: jax.Array) -> jax.Array:
    """Fused LayerNorm → static int8 quantize over ``[B, S, D]`` (pure jnp —
    stays inside XLA's mega-fusion plan). The LN affine (γ, β) folds into the
    static quantize constants, so after the normalize the chain is a single
    multiply-add-round-clip; no intermediate bf16 rounding (round-4 verdict
    item 2 — numerics within the int8 noise, covered by the cosine gates)."""
    x32 = x3.astype(jnp.float32)
    n = x3.shape[-1]
    if _LN_MODE == "1pass":
        s1 = jnp.sum(x32, axis=-1, keepdims=True)
        s2 = jnp.sum(x32 * x32, axis=-1, keepdims=True)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
    else:
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    inv = inv_a.reshape(-1)
    g = (ln["scale"].astype(jnp.float32) * inv).reshape(1, 1, -1)
    b = (ln["bias"].astype(jnp.float32) * inv).reshape(1, 1, -1)
    return jnp.clip(jnp.round(y * g + b), -127, 127).astype(jnp.int8)


def _qblock_forward_static3d(qb: Dict[str, Any], x: jax.Array, heads: int,
                             kv_len, *, attn_impl: str, interpret: bool,
                             causal: bool = False) -> jax.Array:
    """Static-W8A8 block, all-3-D, pure jnp (no Pallas producers): every
    quantize is elementwise, every dot is 3-D — XLA fuses entire
    LN→quant→dot→dequant→residual segments into single VMEM-resident
    mega-fusions exactly as it does for the bf16 tower."""
    # jnp LN + elementwise quantize, NOT the Pallas ln_quantize_static3
    # kernel: the kernel variant measured 4061 img/s vs 4306 for this form
    # (custom-call boundaries break XLA's fusion plan) — docs/BENCH.md.
    b, s, d = x.shape
    h = _layer_norm(qb["ln_1"], x)
    qkv = _static_linear3(_static_quant3(h, qb["qkv"]["inv_a"]), qb["qkv"])
    o = _attn_core(qkv, heads, kv_len, attn_impl=attn_impl,
                   interpret=interpret, causal=causal).reshape(b, s, d)
    x = x + _static_linear3(_static_quant3(o, qb["out"]["inv_a"]), qb["out"])
    h = _layer_norm(qb["ln_2"], x)
    g = _static_linear3(_static_quant3(h, qb["fc"]["inv_a"]), qb["fc"],
                        activation="gelu", quant_inv_a=qb["proj"]["inv_a"])
    return x + _static_linear3(g, qb["proj"])


def _qblock_forward_static3d_qa(qb: Dict[str, Any], x: jax.Array, heads: int,
                                kv_len, *, attn_impl: str, interpret: bool,
                                causal: bool = False) -> jax.Array:
    """static3d with QUANTIZED attention I/O: the qkv dot's static-quantize
    epilogue emits int8 ``[B, S, 3D]`` (halving the attention stage's HBM
    traffic) and :func:`fused_mha_packed_q3` dequantizes q/k/v in VMEM and
    re-quantizes its output with the out-projection's static scale.
    ``attn_impl`` is ignored — this impl IS the attention choice."""
    from team_tpu.ops.mha_short import fused_mha_packed_q3

    if jax.default_backend() not in ("tpu", "axon"):
        interpret = True  # Pallas needs interpret mode off-TPU (CPU tests)
    b, s, d = x.shape
    h = _layer_norm(qb["ln_1"], x)
    qkvq = _static_linear3(_static_quant3(h, qb["qkv"]["inv_a"]), qb["qkv"],
                           quant_inv_a=qb["qkv"]["out_inv_a"])
    oq = fused_mha_packed_q3(qkvq, qb["qkv"]["deq"], qb["out"]["inv_a"],
                             heads, causal=causal,
                             kv_len=kv_len if (kv_len is not None
                                               and kv_len < s) else None,
                             interpret=interpret)
    x = x + _static_linear3(oq, qb["out"])
    h = _layer_norm(qb["ln_2"], x)
    g = _static_linear3(_static_quant3(h, qb["fc"]["inv_a"]), qb["fc"],
                        activation="gelu", quant_inv_a=qb["proj"]["inv_a"])
    return x + _static_linear3(g, qb["proj"])


def _qblock_forward_static3d_qaf(qb: Dict[str, Any], x: jax.Array, heads: int,
                                 kv_len, *, attn_impl: str, interpret: bool,
                                 causal: bool = False) -> jax.Array:
    """static3d_qa with the FUSED one-pass LN→quantize producer
    (:func:`_ln_quant3` — round-4 verdict item 2: the LN reduce chains were
    13.1 ms of the 52 ms static3d_qa batch)."""
    from team_tpu.ops.mha_short import fused_mha_packed_q3

    if jax.default_backend() not in ("tpu", "axon"):
        interpret = True
    b, s, d = x.shape
    qkvq = _static_linear3(_ln_quant3(x, qb["ln_1"], qb["qkv"]["inv_a"]),
                           qb["qkv"], quant_inv_a=qb["qkv"]["out_inv_a"])
    oq = fused_mha_packed_q3(qkvq, qb["qkv"]["deq"], qb["out"]["inv_a"],
                             heads, causal=causal,
                             kv_len=kv_len if (kv_len is not None
                                               and kv_len < s) else None,
                             interpret=interpret)
    x = x + _static_linear3(oq, qb["out"])
    g = _static_linear3(_ln_quant3(x, qb["ln_2"], qb["fc"]["inv_a"]),
                        qb["fc"], activation="gelu",
                        quant_inv_a=qb["proj"]["inv_a"])
    return x + _static_linear3(g, qb["proj"])


def _qblock_forward_static3d_qi(qb: Dict[str, Any], x: jax.Array, heads: int,
                                kv_len, *, attn_impl: str, interpret: bool,
                                causal: bool = False,
                                pv_int8: bool = False) -> jax.Array:
    """static3d with fully-INTEGER QKᵀ attention (round-4 verdict item 1):
    q/k segments quantized with per-head-uniform static scales (requires
    ``quantize_*_static(..., heads=...)``) so QKᵀ runs int8×int8→int32 on the
    MXU's native int8 mode; ``pv_int8`` also runs PV as an int8 dot (softmax
    probabilities requantized in VMEM). LN producers use the fused one-pass
    form. Under a registered 2-D TP mesh (``mha_short.set_tp_mesh``) the
    kernel runs head-split over the model axis via shard_map."""
    from team_tpu.ops.mha_short import fused_mha_packed_q3i_tp

    if jax.default_backend() not in ("tpu", "axon"):
        interpret = True
    b, s, d = x.shape
    qkvq = _static_linear3(_ln_quant3(x, qb["ln_1"], qb["qkv"]["inv_a"]),
                           qb["qkv"], quant_inv_a=qb["qkv"]["out_inv_a_i"])
    oq = fused_mha_packed_q3i_tp(qkvq, qb["qkv"]["deq_i"], qb["qkv"]["qk_scale"],
                                 qb["out"]["inv_a"], heads, causal=causal,
                                 kv_len=kv_len if (kv_len is not None
                                                   and kv_len < s) else None,
                                 interpret=interpret, pv_int8=pv_int8,
                                 defer_norm=_os.environ.get(
                                     "TEAM_QI_DEFER", "0") == "1",
                                 qk_m2=qb["qkv"].get("qk_m2"))
    x = x + _static_linear3(oq, qb["out"])
    g = _static_linear3(_ln_quant3(x, qb["ln_2"], qb["fc"]["inv_a"]),
                        qb["fc"], activation="gelu",
                        quant_inv_a=qb["proj"]["inv_a"])
    return x + _static_linear3(g, qb["proj"])


def _cls_attn_q3i(qkvq: jax.Array, deq: jax.Array, qk_scale: jax.Array,
                  o_inv: jax.Array, heads: int,
                  qk_m2: jax.Array | None = None) -> jax.Array:
    """CLS-query-only integer attention (plain jnp, no Pallas): the last
    vision block's attention output is consumed only at row 0 (CLIP pools
    ``x[:, 0]`` — reference open_clip forward, ``utils/inc_net.py:19-32``),
    so Q shrinks to the CLS row while K/V stay full. Same math as
    :func:`team_tpu.ops.mha_short._mha_packed_q3i_kernel` restricted to one
    query row: int8×int8→int32 QKᵀ, calibrated static-max exp2 softmax
    (row-max fallback for pre-``qk_m2`` payloads), bf16 PV with v's
    per-channel dequant folded into the output quantize scale. Returns
    ``[B, 1, D]`` int8. Non-causal, full-kv only (caller guards)."""
    import team_tpu.ops.mha_short as _mha

    b, s, d3 = qkvq.shape
    d = d3 // 3
    dh = d // heads
    q8 = qkvq[:, 0, :d].reshape(b, heads, 1, dh)
    k8 = qkvq[:, :, d:2 * d].reshape(b, s, heads, dh).transpose(0, 2, 1, 3)
    v8 = qkvq[:, :, 2 * d:].reshape(b, s, heads, dh).transpose(0, 2, 1, 3)
    acc = jax.lax.dot_general(q8, k8, (((3,), (3,)), ((0, 1), (0, 1))),
                              preferred_element_type=jnp.int32)  # [B,H,1,S]
    qks = qk_scale.reshape(1, heads, 1, 1).astype(jnp.float32)
    # honor the kernel's trace-time softmax knob so the CLS row stays
    # bitwise-consistent with what the full kernel would have computed
    # (tests strip qk_m2 / flip the knob and compare exactly)
    if _mha._QI_SOFTMAX != "static":
        qk_m2 = None
    if qk_m2 is not None:
        p = jnp.exp2(acc.astype(jnp.float32) * (qks * _CLS_LOG2E)
                     - qk_m2.reshape(1, heads, 1, 1).astype(jnp.float32))
    else:
        logits = acc.astype(jnp.float32) * qks
        p = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    # PV numerator and denominator both see bf16 p (exactly the kernel's
    # rowsum=mxu precision), accumulation in f32
    pb = p.astype(jnp.bfloat16)
    num = jax.lax.dot_general(pb, v8.astype(jnp.bfloat16),
                              (((3,), (2,)), ((0, 1), (0, 1))),
                              preferred_element_type=jnp.float32)  # [B,H,1,dh]
    den = jnp.sum(pb.astype(jnp.float32), axis=-1, keepdims=True)
    pv_scale = (deq.reshape(-1)[2 * d:].astype(jnp.float32)
                * o_inv.reshape(-1).astype(jnp.float32)).reshape(
                    1, heads, 1, dh)
    out = num * pv_scale / den
    out = out.transpose(0, 2, 1, 3).reshape(b, 1, d)
    return jnp.clip(jnp.round(out), -127, 127).astype(jnp.int8)


def _qblock_forward_static3d_qi_cls(qb: Dict[str, Any], x: jax.Array,
                                    heads: int) -> jax.Array:
    """LAST vision block in CLS-only form (round-4 late probe): everything
    downstream of the final attention is consumed only at the CLS row, so
    the out-projection, LN2, and the MLP run on ``[B, 1, D]`` instead of
    ``[B, S, D]`` — 9/12 of the block's dot FLOPs and the final Pallas
    attention call disappear, mathematically exactly (int8 dots are exact;
    only the bf16 PV accumulation of row 0 can move by an int8 rounding
    step). The qkv dot stays full: K/V need every token."""
    qkvq = _static_linear3(_ln_quant3(x, qb["ln_1"], qb["qkv"]["inv_a"]),
                           qb["qkv"], quant_inv_a=qb["qkv"]["out_inv_a_i"])
    oq = _cls_attn_q3i(qkvq, qb["qkv"]["deq_i"], qb["qkv"]["qk_scale"],
                       qb["out"]["inv_a"], heads,
                       qk_m2=qb["qkv"].get("qk_m2"))
    xc = x[:, :1] + _static_linear3(oq, qb["out"])
    g = _static_linear3(_ln_quant3(xc, qb["ln_2"], qb["fc"]["inv_a"]),
                        qb["fc"], activation="gelu",
                        quant_inv_a=qb["proj"]["inv_a"])
    return xc + _static_linear3(g, qb["proj"])


def _qblock_forward_static3d_qi_clsmlp(qb: Dict[str, Any], x: jax.Array,
                                       heads: int, kv_len, *, attn_impl: str,
                                       interpret: bool,
                                       attn_cls: str | bool = False
                                       ) -> jax.Array:
    """LAST vision block with CLS-only out-proj/LN2/MLP but the Pallas
    attention kernel (probe split of :func:`_qblock_forward_static3d_qi_cls`:
    the all-jnp CLS attention measured SLOWER on chip — the int8 k/v
    head-relayout and the tiny batched dots cost more than the 196 dead query
    rows save — but the post-attention 6/12 of the block's dot FLOPs are
    still dead compute with zero layout cost to skip).

    ``attn_cls`` swaps the FULL kernel for a CLS-query kernel: ``"kq"``
    (:func:`team_tpu.ops.mha_short.fused_mha_packed_q3i_cls` — same packed
    input layout, only query row 0 computed) or ``"kqs"`` (split qkv dot:
    k/v projected for all rows, q for the CLS row ONLY — the q projection
    on the 196 dead rows is never computed; feeds
    :func:`team_tpu.ops.mha_short.fused_mha_packed_q3i_cls_split`). Falls
    back to the full TP kernel when a 2-D model mesh is registered (the CLS
    kernels have no shard_map wrapper — the last block is not the TP hot
    path)."""
    import team_tpu.ops.mha_short as _mha
    from team_tpu.ops.mha_short import (fused_mha_packed_q3i_cls,
                                        fused_mha_packed_q3i_cls_split,
                                        fused_mha_packed_q3i_tp)

    if jax.default_backend() not in ("tpu", "axon"):
        interpret = True
    b, s, d = x.shape
    use_cls_kernel = attn_cls and _mha._TP_MESH is None and not (
        kv_len is not None and kv_len < s)
    if use_cls_kernel and attn_cls == "kqs":
        site = qb["qkv"]
        q3 = _ln_quant3(x, qb["ln_1"], site["inv_a"])
        kv_site = {"w_q": site["w_q"][:, d:], "scale": site["scale"][..., d:],
                   "b": site["b"][..., d:]}
        q_site = {"w_q": site["w_q"][:, :d], "scale": site["scale"][..., :d],
                  "b": site["b"][..., :d]}
        kvq = _static_linear3(q3, kv_site,
                              quant_inv_a=site["out_inv_a_i"][..., d:])
        qq = _static_linear3(q3[:, :1], q_site,
                             quant_inv_a=site["out_inv_a_i"][..., :d])
        oq_cls = fused_mha_packed_q3i_cls_split(qq, kvq, site["deq_i"],
                                                site["qk_scale"],
                                                qb["out"]["inv_a"], heads,
                                                interpret=interpret,
                                                qk_m2=site.get("qk_m2"))
        xc = x[:, :1] + _static_linear3(oq_cls, qb["out"])
        g = _static_linear3(_ln_quant3(xc, qb["ln_2"], qb["fc"]["inv_a"]),
                            qb["fc"], activation="gelu",
                            quant_inv_a=qb["proj"]["inv_a"])
        return xc + _static_linear3(g, qb["proj"])
    qkvq = _static_linear3(_ln_quant3(x, qb["ln_1"], qb["qkv"]["inv_a"]),
                           qb["qkv"], quant_inv_a=qb["qkv"]["out_inv_a_i"])
    if use_cls_kernel:
        oq_cls = fused_mha_packed_q3i_cls(qkvq, qb["qkv"]["deq_i"],
                                          qb["qkv"]["qk_scale"],
                                          qb["out"]["inv_a"], heads,
                                          interpret=interpret,
                                          qk_m2=qb["qkv"].get("qk_m2"))
        xc = x[:, :1] + _static_linear3(oq_cls, qb["out"])
        g = _static_linear3(_ln_quant3(xc, qb["ln_2"], qb["fc"]["inv_a"]),
                            qb["fc"], activation="gelu",
                            quant_inv_a=qb["proj"]["inv_a"])
        return xc + _static_linear3(g, qb["proj"])
    oq = fused_mha_packed_q3i_tp(qkvq, qb["qkv"]["deq_i"],
                                 qb["qkv"]["qk_scale"], qb["out"]["inv_a"],
                                 heads, causal=False,
                                 kv_len=kv_len if (kv_len is not None
                                                   and kv_len < s) else None,
                                 interpret=interpret,
                                 defer_norm=_os.environ.get(
                                     "TEAM_QI_DEFER", "0") == "1",
                                 qk_m2=qb["qkv"].get("qk_m2"))
    xc = x[:, :1] + _static_linear3(oq[:, :1], qb["out"])
    g = _static_linear3(_ln_quant3(xc, qb["ln_2"], qb["fc"]["inv_a"]),
                        qb["fc"], activation="gelu",
                        quant_inv_a=qb["proj"]["inv_a"])
    return xc + _static_linear3(g, qb["proj"])


def _qblock_forward_static3d_qib(qb: Dict[str, Any], xf: jax.Array,
                                 heads: int, b_real: int, s_real: int, *,
                                 interpret: bool) -> jax.Array:
    """FLAT-BATCH static3d_qi block (round-4 emitter-regime probe): the dots
    and LN/quantize producers run on ``xf: [BF, (B/BF)*S, D]`` — the same
    bytes as ``[B, S, D]`` row-major, so every reshape is a free bitcast
    (LN/quantize/residual are per-row and the dots contract only the last
    dim: math is IDENTICAL) — while the Pallas attention kernel views the
    packed qkv tensor at the real ``[B, S, 3D]`` shape. Probes whether XLA's
    batch-in-sublanes conv emitter (measured 83 % of int8 MXU peak at
    B=256/S=197) lowers better at a different batch/spatial split
    (``TEAM_FLAT_B``), with ZERO layout cost — the only transformation class
    that has ever won this round. Non-causal, full-kv, no TP (probe)."""
    from team_tpu.ops.mha_short import fused_mha_packed_q3i_tp

    if jax.default_backend() not in ("tpu", "axon"):
        interpret = True
    bf, m, d = xf.shape
    qkvq = _static_linear3(_ln_quant3(xf, qb["ln_1"], qb["qkv"]["inv_a"]),
                           qb["qkv"], quant_inv_a=qb["qkv"]["out_inv_a_i"])
    oq = fused_mha_packed_q3i_tp(qkvq.reshape(b_real, s_real, 3 * d),
                                 qb["qkv"]["deq_i"], qb["qkv"]["qk_scale"],
                                 qb["out"]["inv_a"], heads, causal=False,
                                 kv_len=None, interpret=interpret,
                                 defer_norm=_os.environ.get(
                                     "TEAM_QI_DEFER", "0") == "1",
                                 qk_m2=qb["qkv"].get("qk_m2"))
    xf = xf + _static_linear3(oq.reshape(bf, m, d), qb["out"])
    g = _static_linear3(_ln_quant3(xf, qb["ln_2"], qb["fc"]["inv_a"]),
                        qb["fc"], activation="gelu",
                        quant_inv_a=qb["proj"]["inv_a"])
    return xf + _static_linear3(g, qb["proj"])


_CLS_LOG2E = 1.4426950408889634  # matches team_tpu.ops.mha_short._LOG2E


def _qblock_forward_static3d_qis(qb: Dict[str, Any], x: jax.Array, heads: int,
                                 kv_len, *, attn_impl: str, interpret: bool,
                                 causal: bool = False) -> jax.Array:
    """SEQUENCE-MAJOR static3d_qi block (``x: [S, B, D]`` — round-4 layout
    probe): identical math to `_qblock_forward_static3d_qi`, but the conv
    emitter sees B=256 (tile-friendly) as the spatial dim and S=197 as the
    batch dim. Non-causal, full-kv only (the vision tower)."""
    from team_tpu.ops.mha_short import fused_mha_packed_q3i_sb

    assert not causal
    if jax.default_backend() not in ("tpu", "axon"):
        interpret = True
    qkvq = _static_linear3(_ln_quant3(x, qb["ln_1"], qb["qkv"]["inv_a"]),
                           qb["qkv"], quant_inv_a=qb["qkv"]["out_inv_a_i"])
    oq = fused_mha_packed_q3i_sb(qkvq, qb["qkv"]["deq_i"],
                                 qb["qkv"]["qk_scale"], qb["out"]["inv_a"],
                                 heads, interpret=interpret)
    x = x + _static_linear3(oq, qb["out"])
    g = _static_linear3(_ln_quant3(x, qb["ln_2"], qb["fc"]["inv_a"]),
                        qb["fc"], activation="gelu",
                        quant_inv_a=qb["proj"]["inv_a"])
    return x + _static_linear3(g, qb["proj"])


def _qblock_forward_static_qa(qb: Dict[str, Any], x: jax.Array, heads: int,
                              kv_len, *, attn_impl: str, interpret: bool,
                              causal: bool = False) -> jax.Array:
    """Static-W8A8 block with QUANTIZED attention I/O: the qkv GEMM output is
    statically quantized (fused elementwise epilogue), the int8-in/int8-out
    packed kernel dequantizes q/k/v in VMEM and re-quantizes its output with
    the out-projection's static scale. HBM traffic for the attention stage
    drops from bf16 232+77 MB to int8 116+39 MB per layer, and the 2-D kernel
    removes the [M,3D]<->[B,S,3D] reshape copies entirely.
    ``attn_impl`` is ignored — this impl IS the attention choice."""
    from team_tpu.ops.mha_short import fused_mha_packed_q

    if jax.default_backend() not in ("tpu", "axon"):
        interpret = True  # Pallas needs interpret mode off-TPU (CPU tests)
    b, s, d = x.shape
    hq = ln_quantize_static(x.reshape(b * s, d), qb["ln_1"]["scale"],
                            qb["ln_1"]["bias"], qb["qkv"]["inv_a"],
                            interpret=interpret)
    qkvq = _static_linear(hq, qb["qkv"], quant_inv_a=qb["qkv"]["out_inv_a"])
    oq = fused_mha_packed_q(qkvq, qb["qkv"]["deq"], qb["out"]["inv_a"],
                            heads, seq=s, causal=causal,
                            kv_len=kv_len if (kv_len is not None
                                              and kv_len < s) else None,
                            interpret=interpret)
    x = x + _static_linear(oq, qb["out"]).reshape(b, s, d)
    hq = ln_quantize_static(x.reshape(b * s, d), qb["ln_2"]["scale"],
                            qb["ln_2"]["bias"], qb["fc"]["inv_a"],
                            interpret=interpret)
    gq = _static_linear(hq, qb["fc"], activation="gelu",
                        quant_inv_a=qb["proj"]["inv_a"])
    p = _static_linear(gq, qb["proj"])
    return x + p.reshape(b, s, d)


def _qblock_forward(qb: Dict[str, Any], x: jax.Array, heads: int, kv_len,
                    *, attn_impl: str, interpret: bool,
                    causal: bool = False) -> jax.Array:
    """One quantized transformer block with deep kernel fusion (the measured
    requirement — standalone quantize passes cost a full HBM round trip each):

    * LN → int8 quantize fused (``ln_quantize``), feeding qkv / fc;
    * fc GEMM → GELU → int8 quantize fused (``int8_linear_gelu_quant``): the
      [M, 4D] full-precision activation never reaches HBM;
    * proj consumes the block-scale int8 activation (``int8_linear_blockscale``);
    * attention (softmax-bound) stays on the XLA path.
    """
    b, s, d = x.shape
    hq, hs = ln_quantize(x.reshape(b * s, d), qb["ln_1"]["scale"],
                         qb["ln_1"]["bias"], interpret=interpret)
    qkv = int8_linear(hq, qb["qkv"]["w_q"], hs, qb["qkv"]["scale"], qb["qkv"]["b"],
                      interpret=interpret).reshape(b, s, 3 * d)
    o = _attn_core(qkv, heads, kv_len, attn_impl=attn_impl,
                   interpret=interpret, causal=causal)
    x = x + _qlinear(o, qb["out"], interpret=interpret).reshape(b, s, d)

    hq, hs = ln_quantize(x.reshape(b * s, d), qb["ln_2"]["scale"],
                         qb["ln_2"]["bias"], interpret=interpret)
    gq, gs = int8_linear_gelu_quant(hq, qb["fc"]["w_q"], hs, qb["fc"]["scale"],
                                    qb["fc"]["b"], interpret=interpret)
    proj = int8_linear_blockscale(gq, qb["proj"]["w_q"], gs, qb["proj"]["scale"],
                                  qb["proj"]["b"], interpret=interpret)
    return x + proj.reshape(b, s, d)


def quantize_text_tower(params: Params) -> Dict[str, Any]:
    """Offline weight quantization of the TEXT tower (round-2 verdict item 6:
    zero-shot eval and ``_make_ctx`` text encoding ride the same int8 scheme
    as the image tower). Embeddings / norms / final projection stay bf16."""
    t = params["text"]
    return {
        "token_embedding": t["token_embedding"],
        "pos": t["pos"],
        "blocks": [quantize_block(b) for b in t["blocks"]],
        "ln_final": t["ln_final"],
        "proj": t["proj"],
    }


def calibrate_text_tower(params: Params, tokens: jax.Array, cfg: CLIPConfig,
                         *, attn_impl: str = "auto"):
    """Per-block, per-channel activation abs-max of the TEXT tower over a
    calibration token batch (``[B, 77]`` ids from the tokenizer). Feeds
    :func:`quantize_text_tower_static`."""
    t = cfg.text
    p = params["text"]
    x = p["token_embedding"][tokens].astype(jnp.bfloat16)
    x = x + p["pos"].astype(jnp.bfloat16)
    stats = []
    for blk in p["blocks"]:
        x, st = _block_calib_forward(blk, x, t.heads, t.context_length,
                                     attn_impl=attn_impl, causal=True)
        stats.append(st)
    return stats


@_functools.partial(jax.jit, static_argnames=("margin", "heads"))
def quantize_text_tower_static(params: Params, calib_stats,
                               *, margin: float = 1.5,
                               heads: int | None = None) -> Dict[str, Any]:
    """Static-W8A8 quantization of the text tower (same scale-folding scheme
    as :func:`quantize_vision_tower_static`).

    Text activations quantize WORSE than vision under static per-channel
    scales on ARBITRARY held-out prompts (cosine ~0.9988-0.9993, resolution-
    bound — docs/BENCH.md round 3). The supported domain of this tier is
    therefore the PROMPT-SET regime (round-4 verdict item 6): production text
    encoding is a finite, cached prompt set (class prompts × templates, see
    ``BackboneRuntime.encode_texts``), so calibrate on exactly those tokens —
    :func:`quantize_text_tower_for_prompts` — where the tier passes >= 0.999.
    For open-ended text, use the dynamic scheme
    (``encode_text_int8(..., gemm_impl="xla")``)."""
    t = params["text"]
    return {
        "token_embedding": t["token_embedding"],
        "pos": t["pos"],
        "blocks": [quantize_block_static(b, st, margin=margin, heads=heads)
                   for b, st in zip(t["blocks"], calib_stats)],
        "ln_final": t["ln_final"],
        "proj": t["proj"],
    }


def quantize_text_tower_for_prompts(params: Params, tokens: jax.Array,
                                    cfg: CLIPConfig, *, margin: float = 1.0,
                                    attn_impl: str = "auto",
                                    heads: int | None = None) -> Dict[str, Any]:
    """Prompt-set static-W8A8 text quantization (round-4 verdict item 6).

    ``tokens: [N, 77]`` must be the tokenized FINITE prompt set the deployment
    will encode (class prompts × templates — the same strings
    ``BackboneRuntime.encode_texts`` caches). Because every activation the
    quantized tower will ever see comes from this exact set, ``margin=1.0``
    is safe (nothing can clip) and maximizes int8 resolution — measured
    cosine >= 0.9993 on the prompt set across seeds (vs 0.9988 worst-case
    under the old margin-1.5 arbitrary-text calibration), clearing the 0.999
    gate in its documented domain."""
    # one jitted graph: eager calibration issues hundreds of tiny remote
    # dispatches on the axon tunnel (docs/BENCH.md round 3)
    stats = jax.jit(lambda p, t: calibrate_text_tower(
        p, t, cfg, attn_impl=attn_impl))(params, tokens)
    return quantize_text_tower_static(params, stats, margin=margin, heads=heads)


def encode_text_int8(
    qtext: Dict[str, Any],
    tokens: jax.Array,
    cfg: CLIPConfig,
    *,
    attn_impl: str = "auto",
    gemm_impl: str = "xla",
    interpret: bool = False,
) -> jax.Array:
    """Quantized text tower: ``[B, 77]`` int tokens -> ``[B, embed_dim]`` f32.

    Same structure as :func:`team_tpu.backbone.clip.encode_text` (causal
    attention, eot-argmax pooling, reference ``utils/inc_net.py`` encode_text
    usage); GEMMs int8 per-token dynamic, attention core bf16."""
    compute_dtype = jnp.bfloat16
    block = {"xla": _qblock_forward_xla, "hybrid": _qblock_forward_hybrid,
             "static": _qblock_forward_static,
             "static_qa": _qblock_forward_static_qa,
             "static3d": _qblock_forward_static3d,
             "static3d_qa": _qblock_forward_static3d_qa,
             "static3d_qaf": _qblock_forward_static3d_qaf,
             "static3d_qi": _qblock_forward_static3d_qi,
             "static3d_qi2": _functools.partial(_qblock_forward_static3d_qi,
                                                pv_int8=True),
             "pallas": _qblock_forward}[gemm_impl]
    x = qtext["token_embedding"][tokens].astype(compute_dtype)
    x = x + qtext["pos"].astype(compute_dtype)
    t = cfg.text
    for qb in qtext["blocks"]:
        x = block(qb, x, t.heads, t.context_length, causal=True,
                  attn_impl=attn_impl, interpret=interpret)
    x = _layer_norm(qtext["ln_final"], x)
    eot = jnp.argmax(tokens, axis=-1)
    x = x[jnp.arange(x.shape[0]), eot]
    return (x @ qtext["proj"].astype(compute_dtype)).astype(jnp.float32)


def encode_image_int8_u8(
    qvision: Dict[str, Any],
    images_u8: jax.Array,
    cfg: CLIPConfig,
    *,
    attn_impl: str = "auto",
    gemm_impl: str = "xla",
    interpret: bool = False,
    seq_pad: bool | None = None,
    cls_last: bool | None = None,
) -> jax.Array:
    """uint8-native ingest for the quantized tower (round-4 audit finding:
    ~2 ms/batch of the profile is ingest). The patch-reorder transpose runs
    on the RAW uint8 tensor (38.5 MB moved instead of the 154 MB f32 copy),
    and /255 + CLIP-normalize fold into the patch dot's elementwise prologue
    as a per-column scale/bias vector (normalize is per-channel, so it
    commutes with the spatial reorder). Images must already be at the model
    resolution (the steady-state loader case — ``preprocess_batch`` path
    stays for arbitrary sizes). Numerically identical f32 math."""
    assert images_u8.dtype == jnp.uint8
    v = cfg.vision
    assert images_u8.shape[1:3] == (v.image_size, v.image_size), (
        "u8-native ingest needs pre-sized images; use preprocess_batch + "
        "encode_image_int8 for arbitrary sizes")
    px_u8 = patch_pixels(images_u8, cfg, compute_dtype=jnp.uint8)
    scale, bias = _patch_norm_consts(cfg)
    # scale/bias in f32 then cast: identical math to preprocess_batch →
    # patch_pixels(bf16); the f32 intermediate lives in registers inside the
    # dot-prologue fusion, so HBM still only sees the uint8 read
    px = (px_u8.astype(jnp.float32) * scale + bias).astype(jnp.bfloat16)
    tokens = px @ qvision["patch_w"].astype(jnp.bfloat16)
    return _encode_tokens_int8(qvision, tokens, cfg, attn_impl=attn_impl,
                               gemm_impl=gemm_impl, interpret=interpret,
                               seq_pad=seq_pad, cls_last=cls_last)


def _patch_norm_consts(cfg: CLIPConfig):
    from team_tpu.ops.preprocess import patch_norm_consts

    return patch_norm_consts(cfg.vision.patch_size)


def encode_image_int8_patches(
    qvision: Dict[str, Any],
    patches_u8: jax.Array,
    cfg: CLIPConfig,
    *,
    attn_impl: str = "auto",
    gemm_impl: str = "xla",
    interpret: bool = False,
    seq_pad: bool | None = None,
    patch_dot: str | None = None,
    cls_last: bool | None = None,
) -> jax.Array:
    """Patch-major uint8 ingest: ``[B, grid², 3·ps²] u8`` (the native
    loader's ``load_batch_u8_patches`` layout, element order =
    :func:`team_tpu.backbone.clip.patch_pixels`) -> ``[B, embed_dim]`` f32.

    The device does ZERO spatial reorder — /255 + CLIP-normalize fold into
    the patch dot's prologue as per-column scale/bias (normalize is
    per-channel, so it commutes with the host-side reorder). The image-major
    [H, W, 3] layout's minor-dim-3 reorder cost (~0.35 ms/batch,
    `scripts/r4_patch_ingest_probe.py`: 6387 vs 6304 img/s) disappears.
    Numerically identical f32 math to ``preprocess_batch`` + patchify.

    ``patch_dot`` (default env ``TEAM_PATCH_DOT``, production default
    ``int8``) selects the patch embedding engine: ``int8`` runs it as a
    u8-exact int8 MXU dot (:func:`_quantize_patch_dot` — zero activation
    quantization error, weight-quant error only; measured 6388 vs 6328
    bf16 img/s, cosine gate unchanged), ``bf16`` keeps the bf16 dot
    (bitwise-identical to the image-major u8 entry; also the automatic
    fallback for payloads saved before ``patch_q`` existed)."""
    assert patches_u8.dtype == jnp.uint8
    if patch_dot is None:
        patch_dot = _os.environ.get("TEAM_PATCH_DOT", "int8")
    if patch_dot == "int8" and "patch_q" in qvision:
        pq = qvision["patch_q"]
        x_i8 = (patches_u8.astype(jnp.int32) - 128).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_i8, pq["w_q"], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        tokens = (acc.astype(jnp.float32) * pq["scale"]
                  + pq["const"]).astype(jnp.bfloat16)
    else:
        scale, bias = _patch_norm_consts(cfg)
        px = (patches_u8.astype(jnp.float32) * scale + bias).astype(jnp.bfloat16)
        tokens = px @ qvision["patch_w"].astype(jnp.bfloat16)
    return _encode_tokens_int8(qvision, tokens, cfg, attn_impl=attn_impl,
                               gemm_impl=gemm_impl, interpret=interpret,
                               seq_pad=seq_pad, cls_last=cls_last)


def encode_image_int8(
    qvision: Dict[str, Any],
    images: jax.Array,
    cfg: CLIPConfig,
    *,
    attn_impl: str = "auto",
    gemm_impl: str = "xla",
    interpret: bool = False,
    seq_pad: bool | None = None,
    cls_last: bool | None = None,
) -> jax.Array:
    """Quantized image tower: ``[B, H, W, 3]`` -> ``[B, embed_dim]`` f32.

    Same structure as :func:`team_tpu.backbone.clip.encode_image`; GEMMs in
    int8, everything else bf16/f32. ``gemm_impl``: ``"xla"`` (default — XLA's
    int8 dot_general engine, the round-3 shoot-out winner) or ``"pallas"``
    (the hand-tiled Mosaic kernels with fused quantize producers)."""
    # patch embedding stays bf16 (0.5% of encode FLOPs; input pixels are
    # normalized with per-channel CLIP stats — row quantization would be fine,
    # but this keeps the first-layer numerics bit-comparable)
    # patch embedding stays bf16: an int8 static patch dot was built and
    # measured 4899 vs 4964 img/s end-to-end (the pixel quantize breaks the
    # preprocess->patch-dot fusion) — docs/BENCH.md round 3
    fake = {"vision": {"patch_w": qvision["patch_w"]}}
    tokens = embed_patches(fake, images, cfg, compute_dtype=jnp.bfloat16)
    return _encode_tokens_int8(qvision, tokens, cfg, attn_impl=attn_impl,
                               gemm_impl=gemm_impl, interpret=interpret,
                               seq_pad=seq_pad, cls_last=cls_last)


def _encode_tokens_int8(qvision, tokens, cfg, *, attn_impl, gemm_impl,
                        interpret, seq_pad, cls_last=None):
    """Quantized tower body over patch tokens (shared by the f32 and the
    uint8-native ingest paths).

    ``cls_last`` (default env ``TEAM_CLS_LAST``): run the LAST block in
    CLS-only form — the pooled feature is ``x[:, 0]``, so the final block's
    compute on the 196 patch rows is dead. Values: ``"kq"`` (production
    default — CLS-query Pallas kernel + CLS MLP: same packed layout, only
    query row 0 computed; beat "mlp" 6744 vs 6668 same-process on chip),
    ``"mlp"`` (full Pallas attention, CLS-only out-proj/LN2/MLP),
    ``"kqs"`` (split qkv dot + split CLS kernel — REJECTED on chip, 6580:
    splitting the qkv dot out of the mega-fusion costs more than the dead
    q rows save), ``"attn"``/True (CLS attention in plain jnp — measured
    SLOWER on chip, kept as probe), ``"0"``/False (full last block).
    Trace-time knob: jitted callers cache the choice."""
    v = cfg.vision
    if cls_last is True:
        cls_mode = "attn"
    elif cls_last is False:
        cls_mode = "0"
    elif cls_last is None:
        cls_mode = _os.environ.get("TEAM_CLS_LAST", "kq")
    else:
        cls_mode = cls_last
    block = {"xla": _qblock_forward_xla, "hybrid": _qblock_forward_hybrid,
             "static": _qblock_forward_static,
             "static_qa": _qblock_forward_static_qa,
             "static3d": _qblock_forward_static3d,
             "static3d_qa": _qblock_forward_static3d_qa,
             "static3d_qaf": _qblock_forward_static3d_qaf,
             "static3d_qi": _qblock_forward_static3d_qi,
             "static3d_qis": _qblock_forward_static3d_qis,
             "static3d_qib": _qblock_forward_static3d_qi,  # flat-B branch below
             "static3d_qi2": _functools.partial(_qblock_forward_static3d_qi,
                                                pv_int8=True),
             "pallas": _qblock_forward}[gemm_impl]
    compute_dtype = jnp.bfloat16
    b = tokens.shape[0]
    cls = jnp.broadcast_to(qvision["cls"].astype(compute_dtype), (b, 1, v.width))
    x = jnp.concatenate([cls, tokens], axis=1)
    x = x + qvision["pos"].astype(compute_dtype)
    x = _layer_norm(qvision["ln_pre"], x)
    if gemm_impl == "static3d_qis":
        # sequence-major layout probe: one transpose in, cls row out
        x = x.transpose(1, 0, 2)          # [S, B, D]
        for qb in qvision["blocks"]:
            x = _qblock_forward_static3d_qis(qb, x, v.heads, v.seq_len,
                                             attn_impl=attn_impl,
                                             interpret=interpret)
        x = _layer_norm(qvision["ln_post"], x[0])
        return (x @ qvision["proj"].astype(compute_dtype)).astype(jnp.float32)
    if gemm_impl == "static3d_qib":
        # flat-batch emitter probe: dots/LN on [BF, (B/BF)*S, D] (bitcast of
        # [B, S, D]), attention at the real shape, CLS-last block unchanged
        bf = int(_os.environ.get("TEAM_FLAT_B", "8"))
        b_real, s_real = x.shape[0], x.shape[1]
        if b_real % bf != 0:
            bf = 1
        xf = x.reshape(bf, (b_real // bf) * s_real, v.width)
        for qb in qvision["blocks"][:-1]:
            xf = _qblock_forward_static3d_qib(qb, xf, v.heads, b_real, s_real,
                                              interpret=interpret)
        x = xf.reshape(b_real, s_real, v.width)
        x = _qblock_forward_static3d_qi_clsmlp(
            qvision["blocks"][-1], x, v.heads, v.seq_len, attn_impl=attn_impl,
            interpret=interpret, attn_cls="kq")[:, 0]
        x = _layer_norm(qvision["ln_post"], x)
        return (x @ qvision["proj"].astype(compute_dtype)).astype(jnp.float32)
    x = _maybe_pad_seq(x, attn_impl, seq_pad,
                       auto_default=gemm_impl in ("static", "static_qa", "hybrid"))
    blocks = qvision["blocks"]
    use_cls = (cls_mode in ("attn", "mlp", "kq", "kqs")
               and gemm_impl == "static3d_qi" and x.shape[1] == v.seq_len)
    for qb in (blocks[:-1] if use_cls else blocks):
        x = block(qb, x, v.heads, v.seq_len, attn_impl=attn_impl,
                  interpret=interpret)
    if use_cls and cls_mode == "attn":
        x = _qblock_forward_static3d_qi_cls(blocks[-1], x, v.heads)[:, 0]
    elif use_cls:
        x = _qblock_forward_static3d_qi_clsmlp(
            blocks[-1], x, v.heads, v.seq_len, attn_impl=attn_impl,
            interpret=interpret,
            attn_cls=cls_mode if cls_mode in ("kq", "kqs") else False)[:, 0]
    else:
        x = x[:, 0]
    x = _layer_norm(qvision["ln_post"], x)
    return (x @ qvision["proj"].astype(compute_dtype)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# quantized-tower persistence: production runs pay calibration (and its graph
# warm-start, minutes on the axon tunnel) ONCE; later runs load the validated
# payload and start encoding int8 from the first batch.
# ---------------------------------------------------------------------------


def save_quantized_tower(path: str, qvision: Dict[str, Any]) -> None:
    """Persist a quantized tower payload (weights + folded static scales).
    Only save payloads that passed their cosine gate — the loader trusts it."""
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), jax.tree_util.tree_map(
        lambda x: jax.device_get(x), qvision), force=True)


def load_quantized_tower(path: str) -> Dict[str, Any]:
    """Load a payload saved by :func:`save_quantized_tower` (device-put lazily
    by the first encode)."""
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))
