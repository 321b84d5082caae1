"""Multi-head attention front-end: picks the Pallas flash kernel on TPU and a
fused-XLA path elsewhere.

This is the single attention entry point for the CLIP towers
(``team_tpu.backbone``) and the PROOF fusion layer. The reference computes
attention three separate ways (open_clip CUDA kernels for the towers, a hand-rolled
``ScaledDotProductAttention`` for fusion, reference ``convs/projections.py:22-38``);
here one kernel serves all of them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from team_tpu.ops.flash_attention import flash_attention

NEG_INF = -1e30


def _xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_len=None,
    *,
    causal: bool = False,
) -> jax.Array:
    """Plain XLA attention over [B, H, S, Dh]; fp32 softmax accumulation."""
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


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_len=None,
    *,
    causal: bool = False,
    impl: str = "auto",
) -> jax.Array:
    """Scaled-dot-product attention over ``[B, H, S, Dh]``.

    ``impl``: 'pallas' forces the flash kernel, 'mha_short' the fused per-image
    kernel, 'xla' the einsum path. 'auto' picks per shape (v5e shoot-out,
    docs/BENCH.md): the flash kernel's O(1) memory tiling wins from ~512 tokens
    up; below that XLA wins END-TO-END — the per-image kernel measures faster
    on pre-split [B,H,S,D] tensors (3.62 vs 3.95 ms/layer) but forcing the
    head-split transposes + S-padding copies to materialize around a Pallas
    call costs more than it saves (full-tower regression 2113 -> 1717 img/s).
    The transpose-free packed-layout variant is `mha_short_packed`.
    """
    if impl == "auto":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        impl = "pallas" if (on_tpu and q.shape[2] >= 512) else "xla"
    if impl == "pallas":
        return flash_attention(q, k, v, kv_len, causal=causal)
    if impl == "mha_short":
        from team_tpu.ops.mha_short import fused_mha_short

        assert not causal, "mha_short kernel is non-causal (vision tower only)"
        return fused_mha_short(q, k, v, kv_len)
    return _xla_attention(q, k, v, kv_len, causal=causal)
