"""Symmetric image/text InfoNCE (CLIP) loss with first-class multi-chip support.

Counterpart of reference ``ClipLoss`` (``utils/toolkit.py:74-138``). The
reference's distributed path calls an *undefined* ``gather_features`` and would
NameError for ``world_size > 1`` (``:112``); here the global-batch variant is a
working ``jax.lax.all_gather`` over the data-parallel mesh axis, with the
open_clip-style ``local_loss`` option (per-shard logits against gathered
features, labels offset by the shard index).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _xent(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def clip_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
    *,
    axis_name: Optional[str] = None,
    local_loss: bool = False,
) -> jax.Array:
    """``(CE(img→txt) + CE(txt→img)) / 2`` on L2-normalized features.

    ``axis_name``: name of the data-parallel mesh axis to all-gather the
    contrastive batch over (None = single-shard, matching the reference's
    ``world_size == 1`` path).
    """
    n = image_features.shape[0]
    if axis_name is None:
        labels = jnp.arange(n)
        logits_per_image = logit_scale * image_features @ text_features.T
        logits_per_text = logit_scale * text_features @ image_features.T
        return (_xent(logits_per_image, labels) + _xent(logits_per_text, labels)) / 2.0

    all_img = jax.lax.all_gather(image_features, axis_name, tiled=True)
    all_txt = jax.lax.all_gather(text_features, axis_name, tiled=True)
    if local_loss:
        rank = jax.lax.axis_index(axis_name)
        labels = jnp.arange(n) + n * rank
        logits_per_image = logit_scale * image_features @ all_txt.T
        logits_per_text = logit_scale * text_features @ all_img.T
    else:
        labels = jnp.arange(all_img.shape[0])
        logits_per_image = logit_scale * all_img @ all_txt.T
        logits_per_text = logits_per_image.T
    return (_xent(logits_per_image, labels) + _xent(logits_per_text, labels)) / 2.0
