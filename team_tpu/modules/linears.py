"""Cosine-similarity classifier head with preallocated class slots.

TPU-native counterpart of the reference ``CosineLinear`` (``convs/linears.py:31-61``):
``logits = sigma * normalize(x) @ normalize(W)ᵀ``. Instead of reallocating and
copying the weight matrix at every task (``utils/inc_net.py:266-278``), the weight
bank is preallocated at ``[max_classes, D]`` and a ``class_mask`` keeps logits of
inactive classes at ``-inf`` — so the jitted forward never changes shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from team_tpu.utils.jmath import l2_normalize

NEG_INF = -1e30


def init_cosine_linear(key: jax.Array, max_classes: int, in_features: int):
    """Reference init: uniform(-stdv, stdv) with stdv = 1/sqrt(in), sigma = 1."""
    stdv = 1.0 / jnp.sqrt(jnp.asarray(float(in_features)))
    weight = jax.random.uniform(key, (max_classes, in_features), minval=-stdv, maxval=stdv)
    return {"weight": weight, "sigma": jnp.ones(())}


def cosine_linear_forward(params, x: jax.Array, class_mask: jax.Array) -> jax.Array:
    """``x: [B, D]`` -> masked logits ``[B, max_classes]``."""
    xn = l2_normalize(x)
    # l2_normalize, not w / max(norm, eps): forward is bitwise identical
    # (sqrt(max(sq, 1e-24)) == max(sqrt(sq), 1e-12)) but the max-outside form
    # leaks 0*inf NaNs through the VJP at ||w|| = 0 (CLAUDE.md grad safety)
    wn = l2_normalize(params["weight"])
    logits = params["sigma"] * (xn @ wn.T)
    return jnp.where(class_mask[None, :] > 0, logits, NEG_INF)


def set_class_weights(params, class_means: jax.Array, class_ids: jax.Array):
    """SimpleCIL prototype replacement (reference ``models/simplecil.py:31-57``):
    write class-mean embeddings into the rows for ``class_ids``."""
    weight = params["weight"].at[class_ids].set(class_means)
    return {**params, "weight": weight}
