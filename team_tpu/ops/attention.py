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

from team_tpu.ops.flash_attention import flash_attention, xla_attention

NEG_INF = -1e30

# canonical XLA attention (single source of truth in flash_attention.py);
# kept under the old private name for existing imports
_xla_attention = xla_attention


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
    The transpose-free packed-layout production kernel is
    team_tpu.ops.mha_short.fused_mha_packed, selected at the BLOCK level in
    team_tpu.backbone.clip._block_forward (it needs the packed qkv tensor).
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
