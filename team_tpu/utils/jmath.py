"""Small grad-safe jnp math helpers shared across modules.

The one rule that has actually bitten twice (CLAUDE.md "gradient safety"):
L2-normalize via ``x / sqrt(max(sum(x^2), eps))`` — NEVER
``x / max(norm(x), eps)``. Forward values are bitwise identical for
``sum(x^2) > eps`` (and both divide by ``sqrt(eps)`` below it), but the
``max``-outside form lets ``d(sqrt)/dx -> inf`` at ``x = 0`` leak a
``0 * inf = NaN`` through the untaken branch of the VJP — e.g. through
zero-initialized prototype bank rows or padded class rows that sit inside a
differentiated cosine head.
"""

from __future__ import annotations

import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-24,
                 keepdims: bool = True) -> jnp.ndarray:
    """Grad-safe L2 normalize along ``axis``.

    ``eps`` clamps the SQUARED norm (so the legacy ``max(norm, 1e-12)``
    call sites map to the default ``eps=1e-24`` with identical forward
    values).
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return x / jnp.sqrt(jnp.maximum(sq, eps))
