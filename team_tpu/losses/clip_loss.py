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


NEG_INF = -1e30  # finite: exp underflows to exactly 0, no inf*0 NaNs in grads


def _xent(logits: jax.Array, labels: jax.Array,
          valid_mask: Optional[jax.Array] = None) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_row = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    if valid_mask is None:
        return jnp.mean(per_row)
    return jnp.sum(per_row * valid_mask) / jnp.maximum(jnp.sum(valid_mask), 1.0)


def clip_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
    *,
    axis_name: Optional[str] = None,
    local_loss: bool = False,
    valid_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """``(CE(img→txt) + CE(txt→img)) / 2`` on L2-normalized features.

    ``axis_name``: name of the data-parallel mesh axis to all-gather the
    contrastive batch over (None = single-shard, matching the reference's
    ``world_size == 1`` path).

    ``valid_mask`` (``[B]`` float, 1 = real row): pad-don't-drop support — padded
    rows are excluded from the row means AND masked out of the negative sets, so
    the loss over a padded batch equals the loss over the unpadded batch exactly.
    With ``local_loss=True`` each shard returns a mean over ITS valid rows; a
    caller aggregating per-shard losses must weight them by the shards' valid
    counts (a shard of pure padding returns 0).
    """
    n = image_features.shape[0]
    if axis_name is None:
        labels = jnp.arange(n)
        logits_per_image = logit_scale * image_features @ text_features.T
        logits_per_text = logit_scale * text_features @ image_features.T
        if valid_mask is not None:
            col = jnp.where(valid_mask[None, :] > 0, 0.0, NEG_INF)
            logits_per_image = logits_per_image + col
            logits_per_text = logits_per_text + col
        return (_xent(logits_per_image, labels, valid_mask)
                + _xent(logits_per_text, labels, valid_mask)) / 2.0

    all_img = jax.lax.all_gather(image_features, axis_name, tiled=True)
    all_txt = jax.lax.all_gather(text_features, axis_name, tiled=True)
    all_vm = (jax.lax.all_gather(valid_mask, axis_name, tiled=True)
              if valid_mask is not None else None)
    col = None if all_vm is None else jnp.where(all_vm[None, :] > 0, 0.0, NEG_INF)
    if local_loss:
        rank = jax.lax.axis_index(axis_name)
        labels = jnp.arange(n) + n * rank
        logits_per_image = logit_scale * image_features @ all_txt.T
        logits_per_text = logit_scale * text_features @ all_img.T
        if col is not None:
            logits_per_image = logits_per_image + col
            logits_per_text = logits_per_text + col
        return (_xent(logits_per_image, labels, valid_mask)
                + _xent(logits_per_text, labels, valid_mask)) / 2.0
    labels = jnp.arange(all_img.shape[0])
    logits_per_image = logit_scale * all_img @ all_txt.T
    if col is None:
        logits_per_text = logits_per_image.T
    else:
        logits_per_image = logits_per_image + col
        logits_per_text = logit_scale * all_txt @ all_img.T + col
    return (_xent(logits_per_image, labels, all_vm)
            + _xent(logits_per_text, labels, all_vm)) / 2.0
