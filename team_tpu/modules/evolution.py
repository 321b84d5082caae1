"""Insect-lifecycle prototype evolution — dense, jittable.

Counterpart of the reference ``InsectLifecycleModel`` live path
(``models/state_evolution.py:239-367`` ``evolve_and_update``,
``utils/inc_net.py:582-617`` ``evolve_state_prototypes`` /
``_sync_class_prototypes``). The reference builds ragged edge lists with O(N²)
Python loops and a dict-of-dicts prototype store; here prototypes are a dense
``[max_classes, num_states, D]`` bank with a presence mask, the evolution graph
is a dense ``[N, N]`` weighted adjacency (N = C·S), and everything runs under
``jit`` on device.

Semantics reproduced exactly:
* only classes with ≥2 present states contribute nodes (``:261-262``);
* lifecycle type priority: larva(1) > nymph(3) > adult(4) > unknown (``:53-66``);
* intra-class directed temporal edges with weight ``1 − |Δt|`` where t is the
  rank of the state among the class's sorted present states, normalized
  (``:269-307``);
* inter-class same-state edges (weight 0.5) gated on equal lifecycle type
  (``:310-316``);
* no edges at all ⇒ prototypes/embeddings/distances unchanged (``:318-319``);
* pairwise state distances = mean (1 − cosine) over node pairs (``:345-366``).

Parity quirk (documented, SURVEY.md §5): the reference's ``evolve_and_update``
mutates the caller's prototype dict in place, so the α-fuse in
``evolve_state_prototypes`` blends the updated features with *themselves* — a
no-op. ``parity=True`` reproduces this; ``parity=False`` performs the intended
fuse against the pre-evolution prototypes.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from team_tpu.modules.temporal_gcn import temporal_gcn_forward

from team_tpu.utils.jmath import l2_normalize

# lifecycle type codes
LARVA_TO_ADULT, NYMPH_TO_ADULT, ADULT_ONLY, UNKNOWN = 0, 1, 2, 3


class EvolutionResult(NamedTuple):
    prototypes: jax.Array        # [C, S, D] updated per-(class,state) prototypes
    proto_mask: jax.Array        # [C, S] presence (unchanged, passed through)
    embeddings: jax.Array        # [C, D] class-level evolution embeddings
    embed_valid: jax.Array       # [C] bool
    lifecycle_features: jax.Array  # [C, D] pre-evolution per-class mean features
    lifecycle_valid: jax.Array   # [C] bool
    distances: jax.Array         # [S, S] mean (1 - cos) per state pair
    dist_valid: jax.Array        # [S, S] bool
    lifecycle_types: jax.Array   # [C] int codes (persistent)


def detect_lifecycle_types(proto_mask: jax.Array) -> jax.Array:
    """Vectorized ``_detect_evolution_type`` (reference ``:53-66``).

    The insect-lifecycle semantics hard-code state ids 1 (larva), 3 (nymph)
    and 4 (adult) — exactly as the reference does — so the state axis must
    have at least 5 slots. Validated at trace time (shapes are static) so a
    too-small ``num_states`` config fails loudly instead of mis-indexing."""
    if proto_mask.shape[1] < 5:
        raise ValueError(
            "detect_lifecycle_types needs num_states >= 5 (state ids 1/3/4 "
            f"encode larva/nymph/adult, reference models/state_evolution.py); "
            f"got num_states={proto_mask.shape[1]}")
    has1 = proto_mask[:, 1] > 0
    has3 = proto_mask[:, 3] > 0
    has4 = proto_mask[:, 4] > 0
    return jnp.where(has1, LARVA_TO_ADULT,
                     jnp.where(has3, NYMPH_TO_ADULT,
                               jnp.where(has4, ADULT_ONLY, UNKNOWN)))


def state_time_steps(proto_mask: jax.Array) -> jax.Array:
    """Normalized temporal rank of each present state within its class
    (reference ``:269-279``): rank/(n−1) over the class's sorted present states."""
    m = proto_mask.astype(jnp.float32)
    rank = jnp.cumsum(m, axis=1) - 1.0
    n = jnp.sum(m, axis=1, keepdims=True)
    return jnp.where(m > 0, rank / jnp.maximum(n - 1.0, 1.0), 0.0)


@functools.partial(jax.jit, static_argnames=("intra_edge_threshold",
                                              "inter_edge_weight", "time_weight"))
def evolve_and_update(
    gcn_params: Dict[str, Any],
    proto_state: jax.Array,
    proto_mask: jax.Array,
    lifecycle_types: jax.Array,
    *,
    intra_edge_threshold: float = 0.0,
    inter_edge_weight: float = 0.5,
    time_weight: float = 1.0,
) -> EvolutionResult:
    """One temporal-evolution pass over the dense prototype bank.

    The keyword knobs are fix-mode honoring of reference config keys that the
    reference declares but never reads (SURVEY §5 dead keys); the defaults
    reproduce the reference's hard-coded behavior exactly:

    * ``intra_edge_threshold``: temporal edges with weight ``1 − |Δt|`` BELOW
      this are dropped (``temporal_relation_threshold``; default 0.0 keeps
      even zero-weight edges, the reference's behavior);
    * ``inter_edge_weight``: weight of inter-class same-state edges
      (reference hard-codes 0.5 at ``state_evolution.py:316``; fix mode scales
      it by ``class_lifecycle_consistency``);
    * ``time_weight``: see :func:`temporal_gcn_forward` (``temporal_feature_weight``).
    """
    c, s, d = proto_state.shape
    n = c * s
    mask = proto_mask.astype(jnp.float32)
    nstates = jnp.sum(mask, axis=1)
    participating = nstates >= 2.0

    new_types = detect_lifecycle_types(proto_mask)
    lifecycle_types = jnp.where(participating, new_types, lifecycle_types)

    t_cs = state_time_steps(proto_mask)  # [C, S]
    node_valid = (mask > 0) & participating[:, None]  # [C, S]

    nv = node_valid.reshape(n)
    tt = t_cs.reshape(n)
    class_id = jnp.repeat(jnp.arange(c), s)
    state_id = jnp.tile(jnp.arange(s), c)

    pair_valid = nv[:, None] & nv[None, :]
    same_class = class_id[:, None] == class_id[None, :]
    same_state = state_id[:, None] == state_id[None, :]
    not_self = ~jnp.eye(n, dtype=bool)

    # intra-class temporal edges src i -> dst j when t_i < t_j. NOTE: the weight
    # 1 − |Δt| is exactly 0 for the first→last states of a 2-state class; such
    # edges still EXIST (they enter the mean-aggregation denominator), so edge
    # existence and weight are tracked separately (reference builds the edge
    # list before weighting, state_evolution.py:299-316).
    dt = tt[None, :] - tt[:, None]          # dt[i, j] = t_j - t_i
    intra = pair_valid & same_class & (dt > 0) & not_self
    if intra_edge_threshold > 0.0:
        intra = intra & ((1.0 - jnp.abs(dt)) >= intra_edge_threshold)
    intra_w = jnp.where(intra, 1.0 - jnp.abs(dt), 0.0)

    types_n = lifecycle_types[class_id]
    inter = (
        pair_valid & ~same_class & same_state & not_self
        & (types_n[:, None] == types_n[None, :])
    )
    # adjacency indexed [dst, src]
    adj = intra_w.T + jnp.where(inter, inter_edge_weight, 0.0).T
    edge_mask = (intra | inter).T
    has_edges = jnp.sum(edge_mask) > 0

    flat = proto_state.reshape(n, d)
    updated = temporal_gcn_forward(gcn_params, flat, adj, tt[:, None], edge_mask,
                                   time_weight=time_weight)
    keep = has_edges & nv
    new_flat = jnp.where(keep[:, None], updated, flat)
    new_protos = new_flat.reshape(c, s, d)

    # class-level evolution embeddings: mean over the class's present states
    denom = jnp.maximum(nstates, 1.0)[:, None]
    embeddings = jnp.sum(new_protos * mask[:, :, None], axis=1) / denom
    embed_valid = participating & has_edges

    # pre-evolution lifecycle features (reference ``:281-283``)
    lifecycle_features = jnp.sum(proto_state * mask[:, :, None], axis=1) / denom
    lifecycle_valid = participating

    # pairwise state distances over updated node features (reference ``:345-366``)
    un = l2_normalize(new_flat)
    cos = un @ un.T
    dvals = (1.0 - cos) * pair_valid * not_self
    pv = (pair_valid & not_self).astype(jnp.float32)
    # aggregate [N, N] -> [S, S] via the (class, state) reshape
    dist_sum = dvals.reshape(c, s, c, s).sum(axis=(0, 2))
    cnt = pv.reshape(c, s, c, s).sum(axis=(0, 2))
    distances = jnp.where(cnt > 0, dist_sum / jnp.maximum(cnt, 1.0), 0.0)
    dist_valid = (cnt > 0) & has_edges

    return EvolutionResult(
        prototypes=new_protos,
        proto_mask=proto_mask,
        embeddings=embeddings,
        embed_valid=embed_valid,
        lifecycle_features=lifecycle_features,
        lifecycle_valid=lifecycle_valid,
        distances=distances,
        dist_valid=dist_valid,
        lifecycle_types=lifecycle_types,
    )


@functools.partial(jax.jit, static_argnames=("parity", "alpha"))
def fuse_evolved_prototypes(
    original: jax.Array,
    evolved: jax.Array,
    proto_mask: jax.Array,
    updated_any: jax.Array,
    *,
    parity: bool = True,
    alpha: float = 0.6,
) -> jax.Array:
    """``evolve_state_prototypes`` fuse step (reference ``utils/inc_net.py:589-595``).

    parity=True: the reference's in-place aliasing makes the fuse a no-op — the
    evolved (already L2-normalized) features are taken as-is.
    parity=False: proper ``normalize(α·original + (1−α)·evolved)``.
    """
    if parity:
        fused = evolved
    else:
        mix = alpha * original + (1.0 - alpha) * evolved
        fused = l2_normalize(mix)
    keep = (proto_mask > 0) & updated_any
    return jnp.where(keep[:, :, None], fused, original)


@jax.jit
def sync_class_prototypes(
    proto_state: jax.Array,
    proto_mask: jax.Array,
    img_prototypes: jax.Array,
    adult_weight: float = 1.5,
) -> jax.Array:
    """Weighted class-prototype sync (reference ``utils/inc_net.py:600-617``):
    adult stage (state 4) weighted ``adult_weight``, result L2-normalized; classes
    with no state prototypes keep their old class prototype."""
    c, s, d = proto_state.shape
    w = jnp.where(jnp.arange(s) == 4, adult_weight, 1.0)[None, :] * proto_mask
    total = jnp.sum(w, axis=1, keepdims=True)
    mixed = jnp.sum(proto_state * w[:, :, None], axis=1) / jnp.maximum(total, 1e-12)
    mixed = l2_normalize(mixed)
    has_any = total[:, 0] > 0
    return jnp.where(has_any[:, None], mixed, img_prototypes)
