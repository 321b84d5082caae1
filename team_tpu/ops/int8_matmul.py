"""int8 quantized matmul on the MXU's native int8 path (Pallas/Mosaic).

Replaces the ViT GEMM tier of the reference's CUDA encoder
(``utils/inc_net.py:19-32``) for inference over the FROZEN CLIP towers. XLA's
own ``dot_general`` does NOT lower int8 operands to the native int8 MXU mode
(measured 50 TOPS at 8192³ on v5e, vs 120+ TOPS for this kernel and a 394 TOPS
hardware peak — ``scripts/int8_probe.py``, docs/BENCH.md); a hand-tiled Mosaic
kernel does.

Scheme (weights frozen → quantized offline; activations dynamic):
* weights: per-output-channel symmetric int8 (``w_scale[1, N]``);
* activations: per-row (per-token) symmetric int8 (``x_scale[1, M]``);
* kernel: ``out[m, n] = gelu?(int32_acc[m, n] · x_scale[m] · w_scale[n] + bias[n])``
  — dequant + bias + (optional) exact GELU fused into the epilogue, so the
  full-size f32 accumulator never touches HBM.

Scales ride the LANE dimension (shape ``[1, M]`` / ``[1, N]``, blocks
``(1, BM)`` / ``(1, BN)``) so every operand is tile-aligned.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_rows(x: jax.Array):
    """Per-row symmetric int8: ``x ≈ q * scale`` with ``scale = amax/127``.

    ``x: [M, K]`` -> ``(q int8 [M, K], scale f32 [M, 1])``. Zero rows get
    scale 1 (q = 0)."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_weight(w: jax.Array):
    """Per-output-channel symmetric int8 for a ``[K, N]`` weight:
    ``(q int8 [K, N], scale f32 [1, N])``."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _kernel(x_ref, w_ref, xs_ref, ws_ref, b_ref, o_ref, *, activation: Optional[str]):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    xs = xs_ref[0, :].astype(jnp.float32)   # [BM]
    ws = ws_ref[0, :].astype(jnp.float32)   # [BN]
    out = acc.astype(jnp.float32) * xs[:, None] * ws[None, :] + b_ref[0, :][None, :]
    if activation == "gelu":
        # tanh-GELU: Mosaic has no erf/erfc lowering; the approximation error
        # (<~1e-3 relative) is far below the int8 quantization noise and is
        # covered by the tower-level cosine gate (tests/test_int8.py)
        out = jax.nn.gelu(out, approximate=True)
    o_ref[:] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block_n(n: int, target: int) -> int:
    """Largest block <= target that divides n, preferring lane multiples (128)."""
    for cand in range(min(target, n) // 128 * 128, 0, -128):
        if n % cand == 0:
            return cand
    for cand in range(min(target, n), 0, -1):  # small-n/test fallback
        if n % cand == 0:
            return cand
    return n


@functools.partial(
    jax.jit,
    static_argnames=("activation", "out_dtype", "block_m", "block_n", "interpret"),
)
def int8_linear(
    x_q: jax.Array,          # [M, K] int8
    w_q: jax.Array,          # [K, N] int8
    x_scale: jax.Array,      # [M, 1] f32
    w_scale: jax.Array,      # [1, N] f32
    bias: Optional[jax.Array] = None,  # [N]
    *,
    activation: Optional[str] = None,  # None | 'gelu' (fused epilogue)
    out_dtype=jnp.bfloat16,
    block_m: int = 512,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``dequant(x_q @ w_q) + bias`` with optional fused GELU -> ``[M, N]``.

    K is not tiled (ViT-B/16 Ks of 768/3072 fit VMEM whole); M is padded to the
    block size internally and sliced back.
    """
    m, k = x_q.shape
    _, n = w_q.shape
    bm = min(block_m, _round_up(m, 32))
    bn = _pick_block_n(n, block_n)  # must DIVIDE n — the grid has no remainder
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x_q = jnp.pad(x_q, ((0, m_pad - m), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, m_pad - m), (0, 0)), constant_values=1.0)
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    xs_row = x_scale.reshape(1, m_pad)       # scales ride the lane dim
    ws_row = w_scale.reshape(1, n).astype(jnp.float32)
    b_row = bias.reshape(1, n).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, activation=activation),
        grid=(m_pad // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bm), lambda i, j: (0, i)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=m_pad * k + k * n + m_pad * n * 2,
            transcendentals=m_pad * n if activation == "gelu" else 0,
        ),
    )(x_q, w_q, xs_row, ws_row, b_row)
    return out[:m] if m_pad != m else out


def quantized_linear(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    activation: Optional[str] = None,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Dynamic-activation convenience: quantize rows of ``x`` then int8_linear."""
    x_q, x_scale = quantize_rows(x)
    return int8_linear(x_q, w_q, x_scale, w_scale, bias,
                       activation=activation, out_dtype=out_dtype,
                       interpret=interpret)
