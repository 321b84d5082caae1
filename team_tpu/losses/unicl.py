"""UniCL tri-modal contrastive loss, fully vectorized.

Counterpart of reference ``unicl_loss`` (``models/proof.py:21-191``), whose hot
body is per-sample Python loops. The math here is identical (verified against a
straight-line numpy re-derivation in ``tests/test_unicl.py``) but expressed as
dense batch algebra so the whole loss lives inside the jitted train step.

Reproduced reference details:
* the 3×3 instance term's "positive" sum is ``exp(sim·mask)`` — i.e. the masked
  self-entry contributes ``exp(0)=1``, not 0 (reference ``:140-145``);
* the category term subtracts a per-row max before exponentiation and averages
  only rows that have at least one same-label partner (``:158-170``);
* the temporal-evolution enhancement of state features (``:52-105``): time
  positions are ranks of a sample's state among its class's *batch-present*
  states; pairwise weights ``1 − |Δt|`` contribute only above 0.3; multi-sample
  classes blend 0.7/0.3 against a normalized mixture seeded by the class
  evolution embedding, singleton classes blend 0.8/0.2 with the embedding alone;
  the mixture reads the *original* (un-enhanced) state features;
* dynamic temperature cosine decay over epochs (``:111-116``);
* NaN guards (``:178-185``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _normalize(x, axis=-1):
    # grad-safe: clamp BEFORE the sqrt so d(sqrt)/dx never hits inf at ||x||=0
    # (0·inf = NaN would leak through untaken `where` branches — e.g. the
    # zero-initialized evolution embeddings before the first evolution pass)
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, 1e-24))


def dynamic_temperature(temperature: float, epoch, max_epoch) -> jax.Array:
    if epoch is None or max_epoch is None:
        return jnp.asarray(temperature, jnp.float32)
    progress = jnp.asarray(epoch, jnp.float32) / jnp.asarray(max_epoch, jnp.float32)
    cosine_decay = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
    return temperature * (0.5 + 0.5 * cosine_decay)


def _enhance_state_features(
    state_features: jax.Array,   # [B, D] normalized
    labels: jax.Array,           # [B]
    state_ids: jax.Array,        # [B]
    evolution_embeddings: jax.Array,  # [C, D]
    evolution_valid: jax.Array,  # [C] bool
    num_states: int,
    valid_mask: Optional[jax.Array] = None,  # [B] float, 1 = real row
) -> jax.Array:
    b = state_features.shape[0]
    same = (labels[:, None] == labels[None, :])
    if valid_mask is not None:
        vm = valid_mask > 0
        same = same & vm[:, None] & vm[None, :]  # padded rows are absent
    n_same = jnp.sum(same, axis=1)  # includes self
    valid_evo = evolution_valid[labels]
    evo = evolution_embeddings[labels]  # [B, D]

    # batch-present states per sample's class: [B, S]
    st_onehot = jax.nn.one_hot(state_ids, num_states, dtype=jnp.float32)
    present = jnp.clip(same.astype(jnp.float32) @ st_onehot, 0.0, 1.0)  # [B, S]
    u = jnp.sum(present, axis=1)  # distinct states of the class in batch
    # rank of own state among sorted present states
    cum = jnp.cumsum(present, axis=1) - present
    rank = jnp.take_along_axis(cum, state_ids[:, None], axis=1)[:, 0]
    t = jnp.where(u >= 2, rank / jnp.maximum(u - 1.0, 1.0), 0.0)

    # pairwise time weights within class (excluding self)
    w = 1.0 - jnp.abs(t[:, None] - t[None, :])
    pair = same & ~jnp.eye(b, dtype=bool)
    contrib = jnp.where(pair & (w > 0.3), w * 0.2, 0.0)
    mixture = evo + contrib @ state_features
    mix_n = _normalize(mixture)

    multi = (n_same >= 2) & (u >= 2) & valid_evo
    single = (n_same == 1) & valid_evo

    enhanced_multi = _normalize(0.7 * state_features + 0.3 * mix_n)
    enhanced_single = _normalize(0.8 * state_features + 0.2 * _normalize(evo))
    out = jnp.where(multi[:, None], enhanced_multi, state_features)
    out = jnp.where(single[:, None], enhanced_single, out)
    return out


@functools.partial(jax.jit, static_argnames=("num_states", "instance_weight", "category_weight", "temperature"))
def unicl_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    state_features: jax.Array,
    labels: jax.Array,
    state_ids: jax.Array,
    *,
    temperature: float = 0.07,
    epoch: Optional[jax.Array] = None,
    max_epoch: Optional[int] = None,
    evolution_embeddings: Optional[jax.Array] = None,
    evolution_valid: Optional[jax.Array] = None,
    num_states: int = 10,
    instance_weight: float = 1.0,
    category_weight: float = 0.5,
    valid_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, dict]:
    """Returns ``(total_loss, {'instance_loss', 'category_loss', 'temperature'})``.

    ``valid_mask`` (``[B]`` float, 1 = real row) enables pad-don't-drop batches:
    padded rows are excluded from every term (instance mean, category positives,
    negatives, and the evolution enhancement's same-class sets), so the loss over
    a padded batch equals the loss over the unpadded rows exactly."""
    b = image_features.shape[0]
    if b < 2:
        zero = jnp.asarray(0.0)
        return zero, {"instance_loss": zero, "category_loss": zero,
                      "temperature": jnp.asarray(temperature)}

    img = _normalize(image_features.reshape(b, -1))
    txt = _normalize(text_features.reshape(b, -1))
    st = _normalize(state_features.reshape(b, -1))

    if evolution_embeddings is not None and evolution_valid is not None:
        st = _enhance_state_features(st, labels, state_ids, evolution_embeddings,
                                     evolution_valid, num_states, valid_mask)

    temp = dynamic_temperature(temperature, epoch, max_epoch)
    vm = jnp.ones((b,)) if valid_mask is None else valid_mask.astype(jnp.float32)
    n_valid_rows = jnp.maximum(jnp.sum(vm), 1.0)

    # -------- instance-level: per-sample 3x3 (img/text/state) --------
    tri = jnp.stack([img, txt, st], axis=1)                      # [B, 3, D]
    sim = jnp.einsum("bid,bjd->bij", tri, tri) / temp            # [B, 3, 3]
    eye3 = jnp.eye(3)
    pos_sum = jnp.sum(jnp.exp(sim * (1.0 - eye3)), axis=2)       # exp(0)=1 at self
    all_sum = jnp.sum(jnp.exp(sim), axis=2)
    row_terms = jnp.sum(jnp.log(pos_sum / (all_sum + 1e-8)), axis=1)  # [B]
    instance_loss = -jnp.sum(row_terms * vm) / (3 * n_valid_rows)

    # -------- category-level: image-image supervised contrastive --------
    labels_matrix = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    self_mask = (1.0 - jnp.eye(b)) * vm[None, :]
    labels_matrix = labels_matrix * self_mask
    ii = (img @ img.T) / temp
    row_max = jnp.max(ii, axis=1, keepdims=True)
    ex = jnp.exp(ii - row_max)
    pos = jnp.sum(ex * labels_matrix, axis=1)
    alln = jnp.sum(ex * self_mask, axis=1)
    valid = (pos > 0) & (alln > 0) & (vm > 0)
    # double-where: log(0) on invalid rows would poison gradients (0·inf = NaN)
    pos_safe = jnp.where(valid, pos, 1.0)
    alln_safe = jnp.where(valid, alln, 1.0)
    row_loss = jnp.where(valid, -jnp.log(pos_safe / (alln_safe + 1e-8)), 0.0)
    n_valid = jnp.sum(valid)
    category_loss = jnp.where(n_valid > 0, jnp.sum(row_loss) / jnp.maximum(n_valid, 1), 0.0)

    # reference returns 0 for batch_size == 1 (``:41-44``); with padded batches
    # that is a *dynamic* condition on the valid-row count
    few = jnp.sum(vm) < 2
    instance_loss = jnp.where(few, 0.0, instance_loss)
    category_loss = jnp.where(few, 0.0, category_loss)

    total = instance_weight * instance_loss + category_weight * category_loss
    # NaN guard chain (reference ``:178-185``)
    total = jnp.where(
        jnp.isnan(total),
        jnp.where(jnp.isnan(instance_loss),
                  jnp.where(jnp.isnan(category_loss), 0.0, category_loss),
                  instance_loss),
        total,
    )
    return total, {"instance_loss": instance_loss, "category_loss": category_loss,
                   "temperature": temp}
