"""Blockwise (flash) attention Pallas TPU kernel.

TPU-native replacement for the attention FLOPs the reference inherits from
open_clip's CUDA kernels (reference ``utils/inc_net.py:19-32``; every
``encode_image`` / ``encode_text`` call). Forward-only is the hot path: the CLIP
backbone is frozen during PROOF training (reference ``models/proof.py:353-356``),
so the towers rarely need an attention backward. For the differentiable uses
(Grad-CAM with ``attn_impl='pallas'``, fine-tuning) the kernel carries a real
``jax.custom_vjp``: the forward runs the Pallas kernel, the backward is the VJP
of a numerically-identical XLA attention (recompute-based — no residuals beyond
q/k/v are stored), gradient-tested against the pure-XLA path in
``tests/test_flash_backward.py``.

Design notes (see the flash-attention tiling in the Pallas guide):
* grid = (batch*heads, q_blocks); each program streams K/V blocks with an online
  softmax (running max ``m``, running sum ``l``) held in VMEM scratch.
* q/k/v arrive as ``[BH, S, Dh]`` with ``S`` padded to a lane-aligned multiple of
  the block size; ``kv_len`` masks padded keys so padding never leaks into the
  softmax. Causal masking (for the CLIP text tower) is applied blockwise.
* accumulation is always f32 (MXU ``preferred_element_type``), inputs may be bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(kv_len_ref, q_ref, k_ref, v_ref, o_ref, *, blk_q: int, blk_k: int, causal: bool, scale: float, precision):
    """One (batch*head, q_block) program: online-softmax over all K/V blocks."""
    q_idx = pl.program_id(1)
    kv_len = kv_len_ref[0]
    seq_len = k_ref.shape[1]
    num_kv_blocks = seq_len // blk_k

    q = q_ref[0].astype(jnp.float32) * scale  # [blk_q, Dh]
    q_positions = q_idx * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)

    def body(kv_idx, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kv_idx * blk_k, blk_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kv_idx * blk_k, blk_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )  # [blk_q, blk_k]
        kv_positions = kv_idx * blk_k + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)
        mask = kv_positions < kv_len
        if causal:
            mask = jnp.logical_and(mask, kv_positions <= q_positions)
        s = jnp.where(mask, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )
        return acc, m_new, l_new

    if causal:
        # Blocks strictly after the diagonal contribute nothing; skip them.
        last_block = jnp.minimum(
            (q_idx * blk_q + blk_q + blk_k - 1) // blk_k, num_kv_blocks
        )
    else:
        last_block = num_kv_blocks

    init = (
        jnp.zeros((blk_q, q.shape[-1]), jnp.float32),
        jnp.full((blk_q, 1), NEG_INF, jnp.float32),
        jnp.zeros((blk_q, 1), jnp.float32),
    )
    acc, _, l = jax.lax.fori_loop(0, last_block, body, init)
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def xla_attention(q, k, v, kv_len=None, *, causal: bool = False):
    """THE canonical XLA attention over ``[B, H, S, Dh]`` (fp32 softmax).

    Single source of truth for every custom-VJP backward in this package and
    for the ``impl='xla'`` front-end path — a numerics change here propagates
    to all of them. ``kv_len`` may be a Python int or a traced scalar."""
    dh = q.shape[-1]
    s = q.shape[2]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * (dh ** -0.5)
    kv_positions = jnp.arange(s)[None, :]
    mask = jnp.ones((s, s), dtype=bool)
    if causal:
        mask = jnp.tril(mask)
    if kv_len is not None:
        mask = jnp.logical_and(mask, kv_positions < kv_len)
    logits = jnp.where(mask[None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _xla_reference(q, k, v, kv_len_arr, causal: bool):
    """Backward-pass reference for the flash kernel (traced kv_len array)."""
    return xla_attention(q, k, v, kv_len_arr[0], causal=causal)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_vjp(q, k, v, kv_len_arr, causal, blk_q, blk_k, interpret, precision):
    return _flash_forward(q, k, v, kv_len_arr, causal, blk_q, blk_k, interpret, precision)


def _flash_vjp_fwd(q, k, v, kv_len_arr, causal, blk_q, blk_k, interpret, precision):
    out = _flash_forward(q, k, v, kv_len_arr, causal, blk_q, blk_k, interpret, precision)
    return out, (q, k, v, kv_len_arr)


def _flash_vjp_bwd(causal, blk_q, blk_k, interpret, precision, residuals, g):
    q, k, v, kv_len_arr = residuals
    _, pullback = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, kv_len_arr, causal), q, k, v)
    dq, dk, dv = pullback(g.astype(q.dtype))
    import numpy as np
    d_kv = np.zeros(kv_len_arr.shape, dtype=jax.dtypes.float0)  # int operand
    return dq, dk, dv, d_kv


_flash_vjp.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("causal", "blk_q", "blk_k", "interpret", "precision"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_len: jax.Array | int | None = None,
    *,
    causal: bool = False,
    blk_q: int = 128,
    blk_k: int = 128,
    interpret: bool = False,
    precision: str | None = None,
) -> jax.Array:
    """Flash attention over ``[B, H, S, Dh]`` inputs (softmax(q kᵀ/√d) v).

    ``kv_len`` (scalar) masks trailing key padding. Returns ``[B, H, S, Dh]`` in
    the input dtype. Rows beyond ``kv_len`` are garbage (all keys masked give a
    zero-sum softmax guarded to 0) — callers slice them away.

    Differentiable: ``jax.grad`` through this function uses the custom VJP
    (XLA-derived backward over the exact same masked-softmax math).
    """
    if precision is None:
        # f32 inputs default to full-precision MXU passes (parity); bf16 stays fast
        precision = "highest" if q.dtype == jnp.float32 else "default"
    if kv_len is None:
        kv_len = q.shape[2]
    kv_len_arr = jnp.asarray([kv_len], dtype=jnp.int32)
    return _flash_vjp(q, k, v, kv_len_arr, causal, blk_q, blk_k, interpret, precision)


def _flash_forward(q, k, v, kv_len_arr, causal, blk_q, blk_k, interpret, precision):
    b, h, s, dh = q.shape
    scale = dh ** -0.5
    s_pad = _round_up(max(s, blk_q), max(blk_q, blk_k))

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s), (0, 0))) if s_pad != s else x

    qf = pad(q).reshape(b * h, s_pad, dh)
    kf = pad(k).reshape(b * h, s_pad, dh)
    vf = pad(v).reshape(b * h, s_pad, dh)

    grid = (b * h, s_pad // blk_q)
    kernel = functools.partial(_flash_kernel, blk_q=blk_q, blk_k=blk_k, causal=causal, scale=scale,
                               precision=jax.lax.Precision(precision))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, blk_q, dh), lambda bh, i, *_: (bh, i, 0)),
                pl.BlockSpec((1, s_pad, dh), lambda bh, i, *_: (bh, 0, 0)),
                pl.BlockSpec((1, s_pad, dh), lambda bh, i, *_: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, blk_q, dh), lambda bh, i, *_: (bh, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * s_pad * dh,
            bytes_accessed=3 * b * h * s_pad * dh * q.dtype.itemsize + b * h * s_pad * dh * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
    )(kv_len_arr, qf, kf, vf)
    return out.reshape(b, h, s_pad, dh)[:, :, :s, :]
