"""Fused multi-head attention kernel for SHORT sequences (the CLIP regime).

One grid step owns all heads of one sample: QKᵀ → masked softmax → PV with
logits living only in VMEM — HBM sees just q/k/v/out (~4 MB per sample-layer).

Measured reality on v5e (B=256, H=12, S=197, D=64): this kernel runs 6.4
ms/layer vs XLA's 3.95 ms/layer. Profiling shows attention at these shapes is
VPU-bound on the softmax (≈119M exp evaluations per layer), not HBM- or
MXU-bound, and XLA's lowering already sits near that floor — so the kernel is
kept as an exploration option (`impl="mha_short"`), while ``attention_impl=
"auto"`` routes short sequences to XLA (see docs/BENCH.md). Beating 3.95 ms
would require overlapping head h's softmax (VPU) with head h+1's matmuls (MXU),
which Mosaic does not currently schedule across an unrolled loop.
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
                                             "exp_dtype"))
def fused_mha_short_v2(q: jax.Array, k: jax.Array, v: jax.Array,
                       kv_len: int | None = None, *, interpret: bool = False,
                       precision: str | None = None,
                       exp_dtype=jnp.float32) -> jax.Array:
    """Non-causal MHA over ``[B, H, S, Dh]``; one program per sample, all heads.
    Q rows pad to the 16-row sublane multiple, K/V to the 128-lane multiple."""
    b, h, s, d = q.shape
    if kv_len is None:
        kv_len = s
    if precision is None:
        precision = "highest" if q.dtype == jnp.float32 else "default"
    sq_pad = ((s + 15) // 16) * 16
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


@functools.partial(jax.jit, static_argnames=("kv_len", "interpret", "precision"))
def fused_mha_short(q: jax.Array, k: jax.Array, v: jax.Array, kv_len: int | None = None,
                    *, interpret: bool = False, precision: str | None = None) -> jax.Array:
    """Non-causal MHA over ``[B, H, S, Dh]`` with trailing-key masking; S is
    padded to a lane multiple internally. Rows beyond ``kv_len`` are garbage."""
    b, h, s, d = q.shape
    if kv_len is None:
        kv_len = s
    if precision is None:
        precision = "highest" if q.dtype == jnp.float32 else "default"
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
