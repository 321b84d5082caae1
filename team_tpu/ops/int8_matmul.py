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


def _pick_block_m(m: int, target: int) -> int:
    """Largest block <= target that DIVIDES m (multiple of 8 for sublane
    alignment). A divisor avoids M-padding entirely — at the production encode
    shape (M = 256·197 = 50432) padding to the next 512 multiple materializes
    a full pad copy + a select per Pallas call (78-156 MB each, seen in the
    optimized HLO; docs/BENCH.md round 3)."""
    for cand in range(min(target, m) // 8 * 8, 7, -8):
        if m % cand == 0:
            return cand
    return min(target, _round_up(m, 32))  # fall back to padding


def _pick_block_n(n: int, target: int) -> int:
    """Largest block <= target that divides n, preferring lane multiples (128)."""
    for cand in range(min(target, n) // 128 * 128, 0, -128):
        if n % cand == 0:
            return cand
    for cand in range(min(target, n), 0, -1):  # small-n/test fallback
        if n % cand == 0:
            return cand
    return n


def _kernel_nk(x_ref, wt_ref, xs_ref, ws_ref, b_ref, o_ref, *,
               activation: Optional[str]):
    # rhs in [N, K] (k-minor) layout; both operands contract on their last dim
    acc = jax.lax.dot_general(
        x_ref[:], wt_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    xs = xs_ref[0, :].astype(jnp.float32)
    ws = ws_ref[0, :].astype(jnp.float32)
    out = acc.astype(jnp.float32) * xs[:, None] * ws[None, :] + b_ref[0, :][None, :]
    if activation == "gelu":
        out = jax.nn.gelu(out, approximate=True)
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("activation", "out_dtype", "block_m", "block_n", "interpret"),
)
def int8_linear_nk(
    x_q: jax.Array,          # [M, K] int8
    wt_q: jax.Array,         # [N, K] int8 (transposed weight, k-minor)
    x_scale: jax.Array, w_scale: jax.Array,
    bias: Optional[jax.Array] = None, *, activation: Optional[str] = None,
    out_dtype=jnp.bfloat16, block_m: int = 512, block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """int8 matmul with the weight stored [N, K] (both operands k-minor, the
    layout jax's scaled_matmul convention uses) — tiling exploration."""
    m, k = x_q.shape
    n, _ = wt_q.shape
    bm = _pick_block_m(m, block_m)
    bn = _pick_block_n(n, block_n)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x_q = jnp.pad(x_q, ((0, m_pad - m), (0, 0)))
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    xs_row = x_scale.reshape(1, -1)
    if xs_row.shape[1] != m_pad:
        xs_row = jnp.pad(xs_row, ((0, 0), (0, m_pad - xs_row.shape[1])),
                         constant_values=1.0)
    out = pl.pallas_call(
        functools.partial(_kernel_nk, activation=activation),
        grid=(m_pad // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, k), lambda i, j: (j, 0)),
            pl.BlockSpec((1, bm), lambda i, j: (0, i)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x_q, wt_q, xs_row, w_scale.reshape(1, n).astype(jnp.float32),
      bias.reshape(1, n).astype(jnp.float32))
    return out[:m] if m_pad != m else out


def _kernel_kgrid(x_ref, w_ref, xs_ref, ws_ref, b_ref, o_ref, acc_ref, *,
                  activation: Optional[str]):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        xs = xs_ref[0, :].astype(jnp.float32)
        ws = ws_ref[0, :].astype(jnp.float32)
        out = (acc_ref[:].astype(jnp.float32) * xs[:, None] * ws[None, :]
               + b_ref[0, :][None, :])
        if activation == "gelu":
            out = jax.nn.gelu(out, approximate=True)
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("activation", "out_dtype", "block_m", "block_n", "block_k",
                     "interpret"),
)
def int8_linear_kgrid(
    x_q: jax.Array, w_q: jax.Array, x_scale: jax.Array, w_scale: jax.Array,
    bias: Optional[jax.Array] = None, *, activation: Optional[str] = None,
    out_dtype=jnp.bfloat16, block_m: int = 512, block_n: int = 512,
    block_k: int = 256, interpret: bool = False,
) -> jax.Array:
    """K-gridded variant of :func:`int8_linear` (int32 scratch accumulator) —
    tiling exploration; same contract."""
    m, k = x_q.shape
    _, n = w_q.shape
    bm = _pick_block_m(m, block_m)
    bn = _pick_block_n(n, block_n)
    bk = _pick_block_n(k, block_k)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x_q = jnp.pad(x_q, ((0, m_pad - m), (0, 0)))
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    xs_row = x_scale.reshape(1, -1)
    if xs_row.shape[1] != m_pad:
        xs_row = jnp.pad(xs_row, ((0, 0), (0, m_pad - xs_row.shape[1])),
                         constant_values=1.0)
    out = pl.pallas_call(
        functools.partial(_kernel_kgrid, activation=activation),
        grid=(m_pad // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kb: (i, kb)),
            pl.BlockSpec((bk, bn), lambda i, j, kb: (kb, j)),
            pl.BlockSpec((1, bm), lambda i, j, kb: (0, i)),
            pl.BlockSpec((1, bn), lambda i, j, kb: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j, kb: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kb: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x_q, w_q, xs_row, w_scale.reshape(1, n).astype(jnp.float32),
      bias.reshape(1, n).astype(jnp.float32))
    return out[:m] if m_pad != m else out


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
    bm = _pick_block_m(m, block_m)
    bn = _pick_block_n(n, block_n)  # must DIVIDE n — the grid has no remainder
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x_q = jnp.pad(x_q, ((0, m_pad - m), (0, 0)))
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    xs_row = x_scale.reshape(1, -1)          # scales ride the lane dim
    if xs_row.shape[1] != m_pad:             # accepts [M,1] or [1,M] inputs
        xs_row = jnp.pad(xs_row, ((0, 0), (0, m_pad - xs_row.shape[1])),
                         constant_values=1.0)
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


def int8_linear_xla(
    x_q: jax.Array,          # [M, K] int8
    w_q: jax.Array,          # [K, N] int8
    x_scale: jax.Array,      # [M, 1] or [1, M] f32
    w_scale: jax.Array,      # [1, N] f32
    bias: Optional[jax.Array] = None,  # [N]
    *,
    activation: Optional[str] = None,  # None | 'gelu'
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """int8 GEMM on XLA's OWN int8 ``dot_general`` engine.

    Round-3 GEMM shoot-out (docs/BENCH.md, ``scripts/int8_pipe_probe.py``):
    XLA lowers int8×int8→int32 at ~228 TOPS at the ViT qkv shape — 1.2× its
    own bf16 (~190) and 1.5× the best hand-tiled Mosaic kernel (~157, which is
    Mosaic-issue-pipeline-bound regardless of tiling strategy). The dequant /
    bias / GELU epilogue is plain jnp so XLA fuses it into the GEMM's consumer
    fusion. Exact (erf) GELU — unlike Mosaic, XLA has an erf lowering, so the
    XLA int8 tower matches the bf16 tower's activation exactly.
    """
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    xs = x_scale.reshape(-1, 1).astype(jnp.float32)   # [M, 1]
    out = acc.astype(jnp.float32) * xs * w_scale.reshape(1, -1).astype(jnp.float32)
    if bias is not None:
        out = out + bias.reshape(1, -1).astype(jnp.float32)
    if activation == "gelu":
        out = jax.nn.gelu(out, approximate=False)
    return out.astype(out_dtype)


def _ln_quant_kernel(x_ref, g_ref, b_ref, q_ref, s_ref):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * g_ref[0, :][None, :] + b_ref[0, :][None, :]
    amax = jnp.max(jnp.abs(y), axis=-1)          # [bm]
    s = jnp.where(amax > 0, amax * (1.0 / 127.0), 1.0)
    q_ref[...] = jnp.clip(jnp.round(y / s[:, None]), -127, 127).astype(jnp.int8)
    s_ref[0, :] = s


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def ln_quantize(x: jax.Array, gamma: jax.Array, beta: jax.Array, *,
                block_m: int = 512, interpret: bool = False):
    """Fused LayerNorm + per-row int8 quantization in ONE HBM pass.

    ``x: [M, D]`` -> ``(q int8 [M, D], scale f32 [1, M])``. Standalone
    LN-then-quantize costs two full reads + a bf16 write of the LN output;
    fusing them removes that round trip (the measured win that makes the int8
    tower faster than bf16 — docs/BENCH.md)."""
    m, d = x.shape
    bm = _pick_block_m(m, block_m)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    q, s = pl.pallas_call(
        _ln_quant_kernel,
        grid=(m_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((1, bm), lambda i: (0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, d), jnp.int8),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
        ),
        interpret=interpret,
    )(x, gamma.reshape(1, d).astype(jnp.float32), beta.reshape(1, d).astype(jnp.float32))
    return q[:m], s[:, :m]


def _ln_quant_static_kernel(x_ref, g_ref, b_ref, ia_ref, q_ref):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * g_ref[0, :][None, :] + b_ref[0, :][None, :]
    y = y * ia_ref[0, :][None, :]
    q_ref[...] = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def ln_quantize_static(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                       inv_a: jax.Array, *, block_m: int = 512,
                       interpret: bool = False) -> jax.Array:
    """Fused LayerNorm + STATIC per-channel int8 quantize in ONE HBM pass.

    ``x: [M, D]``, ``inv_a: [1, D]`` (127 / calibrated channel amax) ->
    ``q int8 [M, D]``. No scale output — the activation scale is folded into
    the downstream weight (static-W8A8 scheme, ``backbone/quant.py``). The
    pure-jnp chain materializes THREE f32 copies of the activation around
    layout changes (measured, docs/BENCH.md round 3); this kernel reads the
    bf16 input once and writes int8 once."""
    m, d = x.shape
    bm = _pick_block_m(m, block_m)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    q = pl.pallas_call(
        _ln_quant_static_kernel,
        grid=(m_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), jnp.int8),
        interpret=interpret,
    )(x, gamma.reshape(1, d).astype(jnp.float32),
      beta.reshape(1, d).astype(jnp.float32),
      inv_a.reshape(1, d).astype(jnp.float32))
    return q[:m]


def _ln_quant_static3_kernel(x_ref, g_ref, b_ref, ia_ref, q_ref):
    x = x_ref[...].astype(jnp.float32)              # [G, S, D]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * g_ref[0, 0, :][None, None, :] + b_ref[0, 0, :][None, None, :]
    y = y * ia_ref[0, 0, :][None, None, :]
    q_ref[...] = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def ln_quantize_static3(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                        inv_a: jax.Array, *, group: int = 8,
                        interpret: bool = False) -> jax.Array:
    """3-D :func:`ln_quantize_static`: ``[B, S, D]`` bf16 -> ``[B, S, D]``
    int8 with NO reshapes (int8's (32, 128) tiling makes the 2-D round trip
    a real copy at S % 32 != 0; staying 3-D sidesteps it). One HBM read, one
    int8 write — built to replace the separate XLA LN-reduce fusion
    (~0.52 ms) + quantize clamp (~0.13 ms) pairs in the static3d profile.
    MEASURED SLOWER end-to-end (4061 vs 4306 img/s padded): the custom-call
    boundary breaks XLA's surrounding fusion plan. Kept as the measurement
    record; the static3d block uses the jnp form."""
    b, s, d = x.shape
    g = group if b % group == 0 else 1
    q = pl.pallas_call(
        _ln_quant_static3_kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, s, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, s, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, d), jnp.int8),
        interpret=interpret,
    )(x, gamma.reshape(1, 1, d).astype(jnp.float32),
      beta.reshape(1, 1, d).astype(jnp.float32),
      inv_a.reshape(1, 1, d).astype(jnp.float32))
    return q


def _row_quant_static_kernel(x_ref, ia_ref, q_ref):
    y = x_ref[...].astype(jnp.float32) * ia_ref[0, :][None, :]
    q_ref[...] = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def row_quant_static(x: jax.Array, inv_a: jax.Array, *, block_m: int = 512,
                     interpret: bool = False) -> jax.Array:
    """STATIC per-channel int8 quantize, one read + one write.

    ``x: [M, D]`` bf16, ``inv_a: [1, D]`` -> ``q int8 [M, D]``. Exists because
    the jnp equivalent materializes an f32 copy of ``x`` around the layout
    copy XLA inserts at custom-call boundaries."""
    m, d = x.shape
    bm = _pick_block_m(m, block_m)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    q = pl.pallas_call(
        _row_quant_static_kernel,
        grid=(m_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), jnp.int8),
        interpret=interpret,
    )(x, inv_a.reshape(1, d).astype(jnp.float32))
    return q[:m]


def _mm_gelu_quant_kernel(x_ref, w_ref, xs_ref, ws_ref, b_ref, q_ref, s_ref):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    xs = xs_ref[0, :].astype(jnp.float32)
    ws = ws_ref[0, :].astype(jnp.float32)
    out = acc.astype(jnp.float32) * xs[:, None] * ws[None, :] + b_ref[0, :][None, :]
    out = jax.nn.gelu(out, approximate=True)  # tanh-GELU (no erf in Mosaic)
    amax = jnp.max(jnp.abs(out), axis=-1)     # per (row, j-block)
    s = jnp.where(amax > 0, amax * (1.0 / 127.0), 1.0)
    q_ref[...] = jnp.clip(jnp.round(out / s[:, None]), -127, 127).astype(jnp.int8)
    s_ref[0, :] = s


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def int8_linear_gelu_quant(
    x_q: jax.Array,          # [M, K] int8
    w_q: jax.Array,          # [K, N] int8
    x_scale: jax.Array,      # [1, M] or [M, 1] f32
    w_scale: jax.Array,      # [1, N] f32
    bias: jax.Array,         # [N]
    *,
    block_m: int = 512,
    block_n: int = 512,
    interpret: bool = False,
):
    """``quantize(gelu(dequant(x_q @ w_q) + bias))`` with BLOCK-WISE activation
    scales: returns ``(q int8 [M, N], scales f32 [N/bn, M])`` where scale
    ``[j, m]`` covers columns ``[j*bn, (j+1)*bn)`` of row ``m``.

    The full-precision GEMM output (e.g. the 310 MB fc activation at B=256)
    never reaches HBM — only its int8 quantization does. Consumed by
    :func:`int8_linear_blockscale`."""
    m, k = x_q.shape
    _, n = w_q.shape
    bm = _pick_block_m(m, block_m)
    bn = _pick_block_n(n, block_n)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x_q = jnp.pad(x_q, ((0, m_pad - m), (0, 0)))
    xs_row = x_scale.reshape(1, -1)
    if xs_row.shape[1] != m_pad:
        xs_row = jnp.pad(xs_row, ((0, 0), (0, m_pad - xs_row.shape[1])),
                         constant_values=1.0)
    n_i = m_pad // bm
    # scales live FLAT as [1, n_jb * m_pad] (Mosaic requires the second-minor
    # block dim be 8-divisible or the full dim; (1, bm) tiles of a [n_jb, M]
    # array violate that) — reshaped to [n_jb, M] for the public contract.
    q, s = pl.pallas_call(
        _mm_gelu_quant_kernel,
        grid=(m_pad // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bm), lambda i, j: (0, i)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=(
            pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            pl.BlockSpec((1, bm), lambda i, j, n_i=n_i: (0, j * n_i + i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, n), jnp.int8),
            jax.ShapeDtypeStruct((1, (n // bn) * m_pad), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x_q, w_q, xs_row, w_scale.reshape(1, n).astype(jnp.float32),
      bias.reshape(1, n).astype(jnp.float32))
    return q[:m], s.reshape(n // bn, m_pad)[:, :m]


def _mm_blockscale_kernel(x_ref, w_ref, xs_ref, ws_ref, b_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    part = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    xs = xs_ref[0, :].astype(jnp.float32)
    acc_ref[:] += part.astype(jnp.float32) * xs[:, None]

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        ws = ws_ref[0, :].astype(jnp.float32)
        o_ref[:] = (acc_ref[:] * ws[None, :] + b_ref[0, :][None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_m", "block_n",
                                              "interpret"))
def int8_linear_blockscale(
    x_q: jax.Array,          # [M, K] int8
    w_q: jax.Array,          # [K, N] int8
    x_scales: jax.Array,     # [K/bk, M] f32 — per (row, K-block), bk from producer
    w_scale: jax.Array,      # [1, N] f32
    bias: Optional[jax.Array] = None,
    *,
    out_dtype=jnp.bfloat16,
    block_m: int = 512,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Matmul over activations quantized with BLOCK-WISE scales (the output of
    :func:`int8_linear_gelu_quant`): the K axis is gridded at the producer's
    block size and each int32 partial is dequantized with its block's row
    scale into an f32 accumulator."""
    m, k = x_q.shape
    _, n = w_q.shape
    n_kb = x_scales.shape[0]
    assert k % n_kb == 0, (k, n_kb)
    bk = k // n_kb
    bm = _pick_block_m(m, block_m)
    bn = _pick_block_n(n, block_n)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x_q = jnp.pad(x_q, ((0, m_pad - m), (0, 0)))
        x_scales = jnp.pad(x_scales, ((0, 0), (0, m_pad - m)), constant_values=1.0)
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    n_i = m_pad // bm
    xs_flat = x_scales.reshape(1, n_kb * m_pad)  # flat scale layout (see producer)
    out = pl.pallas_call(
        _mm_blockscale_kernel,
        grid=(m_pad // bm, n // bn, n_kb),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kb: (i, kb)),
            pl.BlockSpec((bk, bn), lambda i, j, kb: (kb, j)),
            pl.BlockSpec((1, bm), lambda i, j, kb, n_i=n_i: (0, kb * n_i + i)),
            pl.BlockSpec((1, bn), lambda i, j, kb: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j, kb: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kb: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x_q, w_q, xs_flat, w_scale.reshape(1, n).astype(jnp.float32),
      bias.reshape(1, n).astype(jnp.float32))
    return out[:m] if m_pad != m else out


def _kernel_wres(x_ref, w_ref, xs_ref, ws_ref, b_ref, o_ref, *,
                 activation: Optional[str], n_split: int):
    n = w_ref.shape[-1]
    bn = n // n_split
    xs = xs_ref[0, :].astype(jnp.float32)  # [bm]
    for j in range(n_split):
        sl = slice(j * bn, (j + 1) * bn)
        acc = jax.lax.dot_general(
            x_ref[...], w_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = (acc.astype(jnp.float32) * xs[:, None] * ws_ref[0, sl][None, :]
               + b_ref[0, sl][None, :])
        if activation == "gelu":
            out = jax.nn.gelu(out, approximate=True)
        o_ref[:, sl] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("activation", "out_dtype", "block_m", "n_split", "interpret"),
)
def int8_linear_wres(
    x_q: jax.Array,          # [M, K] int8
    w_q: jax.Array,          # [K, N] int8
    x_scale: jax.Array,      # [M, 1] or [1, M] f32
    w_scale: jax.Array,      # [1, N] f32
    bias: Optional[jax.Array] = None,
    *,
    activation: Optional[str] = None,
    out_dtype=jnp.bfloat16,
    block_m: int = 512,
    n_split: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Weight-STATIONARY int8 matmul: grid over M only; the full [K, N] weight
    (1.7 MB at the ViT qkv shape) stays VMEM-resident across every grid step,
    so per-step traffic is just the x block in and the out block back.

    Rationale (docs/BENCH.md round 3): the 2-D-gridded ``int8_linear`` refetches
    the weight once per M row-block (~175 MB of redundant HBM traffic at the
    qkv shape) and runs 594 small grid steps whose fixed overhead dominates.
    Fewer, bigger steps with zero weight traffic amortize both. ``n_split``
    statically unrolls the per-step dot into N sub-dots (scheduling knob).
    """
    m, k = x_q.shape
    _, n = w_q.shape
    bm = _pick_block_m(m, block_m)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x_q = jnp.pad(x_q, ((0, m_pad - m), (0, 0)))
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    xs_row = x_scale.reshape(1, -1)
    if xs_row.shape[1] != m_pad:
        xs_row = jnp.pad(xs_row, ((0, 0), (0, m_pad - xs_row.shape[1])),
                         constant_values=1.0)
    out = pl.pallas_call(
        functools.partial(_kernel_wres, activation=activation, n_split=n_split),
        grid=(m_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, bm), lambda i: (0, i)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        interpret=interpret,
        # "arbitrary" measured faster than "parallel" here (157 vs 144 TOPS,
        # docs/BENCH.md round 3)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=m_pad * k + k * n + m_pad * n * 2,
            transcendentals=m_pad * n if activation == "gelu" else 0,
        ),
    )(x_q, w_q, xs_row, w_scale.reshape(1, n).astype(jnp.float32),
      bias.reshape(1, n).astype(jnp.float32))
    return out[:m] if m_pad != m else out


def _kernel_dma(x_hbm, w_ref, xs_ref, ws_ref, b_ref, o_hbm, *,
                activation: Optional[str], bm: int, n_chunks: int,
                n_split: int):
    """Hand-rolled double-buffered pipeline: x/out live in HBM; this single
    program streams [bm, K] chunks in, runs the dot against the VMEM-resident
    weight, and streams [bm, N] results out, with both directions overlapped
    against compute via explicit DMA semaphores."""
    k = w_ref.shape[0]
    n = w_ref.shape[1]
    bn = n // n_split

    def body(xbuf, obuf, in_sem, out_sem):
        def in_dma(slot, idx):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(idx * bm, bm), :], xbuf.at[slot], in_sem.at[slot])

        def out_dma(slot, idx):
            return pltpu.make_async_copy(
                obuf.at[slot], o_hbm.at[pl.ds(idx * bm, bm), :], out_sem.at[slot])

        in_dma(0, 0).start()

        @pl.when(n_chunks > 1)
        def _():
            in_dma(1, 1).start()

        def step(i, carry):
            slot = i % 2
            in_dma(slot, i).wait()
            # the out DMA that last used this slot must have drained before we
            # overwrite the buffer
            @pl.when(i >= 2)
            def _():
                out_dma(slot, i - 2).wait()

            xs = xs_ref[i, :].astype(jnp.float32)  # [bm]
            for j in range(n_split):
                sl = slice(j * bn, (j + 1) * bn)
                acc = jax.lax.dot_general(
                    xbuf[slot], w_ref[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                out = (acc.astype(jnp.float32) * xs[:, None]
                       * ws_ref[0, sl][None, :] + b_ref[0, sl][None, :])
                if activation == "gelu":
                    out = jax.nn.gelu(out, approximate=True)
                obuf[slot, :, sl] = out.astype(obuf.dtype)
            out_dma(slot, i).start()

            @pl.when(i + 2 < n_chunks)
            def _():
                in_dma(slot, i + 2).start()

            return carry

        jax.lax.fori_loop(0, n_chunks, step, 0)

        @pl.when(n_chunks >= 2)
        def _():
            out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

        out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

    pl.run_scoped(
        body,
        xbuf=pltpu.VMEM((2, bm, k), jnp.int8),
        obuf=pltpu.VMEM((2, bm, n), o_hbm.dtype),
        in_sem=pltpu.SemaphoreType.DMA((2,)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("activation", "out_dtype", "block_m", "n_split", "interpret"),
)
def int8_linear_dma(
    x_q: jax.Array,          # [M, K] int8
    w_q: jax.Array,          # [K, N] int8
    x_scale: jax.Array,      # [M, 1] or [1, M] f32
    w_scale: jax.Array,      # [1, N] f32
    bias: Optional[jax.Array] = None,
    *,
    activation: Optional[str] = None,
    out_dtype=jnp.bfloat16,
    block_m: int = 512,
    n_split: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Explicit-DMA double-buffered int8 matmul (weight stationary).

    Same contract as :func:`int8_linear_wres` but with a hand-rolled pipeline
    instead of Mosaic's grid pipeliner: one program, x/out in HBM, 2-slot
    in/out buffering with explicit semaphores. Built to test whether manual
    overlap beats Mosaic's cross-step scheduling (docs/BENCH.md round 3)."""
    m, k = x_q.shape
    _, n = w_q.shape
    bm = _pick_block_m(m, block_m)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x_q = jnp.pad(x_q, ((0, m_pad - m), (0, 0)))
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    n_chunks = m_pad // bm
    xs_row = x_scale.reshape(-1)
    if xs_row.shape[0] != m_pad:
        xs_row = jnp.pad(xs_row, (0, m_pad - xs_row.shape[0]),
                         constant_values=1.0)
    xs_chunks = xs_row.reshape(n_chunks, bm).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_kernel_dma, activation=activation, bm=bm,
                          n_chunks=n_chunks, n_split=n_split),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((n_chunks, bm), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x_q, w_q, xs_chunks, w_scale.reshape(1, n).astype(jnp.float32),
      bias.reshape(1, n).astype(jnp.float32))
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
