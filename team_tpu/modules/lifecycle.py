"""Lifecycle-model secondary paths.

The live evolution path is :mod:`team_tpu.modules.evolution`. This module covers
the remaining ``InsectLifecycleModel`` capability surface (reference
``models/state_evolution.py``):

* per-class evolution-graph construction (``_build_evolution_graph``, ``:68-125``
  and ``build_class_lifecycle_graph``, ``:547-622``) in dense-mask form;
* evolution-trajectory simulation between states (``model_evolution_trajectory``,
  ``:127-175``; dead in the reference because the projector dict is never
  populated — here the projectors are first-class and initialisable);
* the lifecycle-type detector MLP (``:37-43``) with a working forward (the
  reference ``forward`` references undefined members, SURVEY.md §5 quirk 2).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from team_tpu.modules.evolution import LARVA_TO_ADULT, NYMPH_TO_ADULT

from team_tpu.utils.jmath import l2_normalize


def _linear(key, d_in, d_out):
    bound = 1.0 / jnp.sqrt(jnp.asarray(float(d_in)))
    kw, kb = jax.random.split(key)
    return {"w": jax.random.uniform(kw, (d_in, d_out), minval=-bound, maxval=bound),
            "b": jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound)}


def init_evolution_projectors(key: jax.Array, feature_dim: int) -> Dict[str, Dict]:
    """Per-transition projector MLPs. Keys mirror the reference's `"src-dst"`
    naming for the two supported transitions (larva→adult, nymph→adult)."""
    k1, k2 = jax.random.split(key)
    return {"1-4": _linear(k1, feature_dim, feature_dim),
            "3-4": _linear(k2, feature_dim, feature_dim)}


def class_evolution_graph(proto_mask_row: jax.Array, lifecycle_type: jax.Array
                          ) -> Tuple[jax.Array, jax.Array]:
    """Single-class evolution edges in dense ``[S, S]`` form (reference
    ``_build_evolution_graph``: one directed edge src-stage → adult with weight
    1.0 when the lifecycle supports it)."""
    s = proto_mask_row.shape[0]
    adj = jnp.zeros((s, s))
    has = proto_mask_row > 0
    larva_edge = (lifecycle_type == LARVA_TO_ADULT) & has[1] & has[4]
    nymph_edge = (lifecycle_type == NYMPH_TO_ADULT) & has[3] & has[4]
    adj = adj.at[4, 1].set(jnp.where(larva_edge, 1.0, 0.0))
    adj = adj.at[4, 3].set(jnp.where(nymph_edge, 1.0, 0.0))
    valid = larva_edge | nymph_edge
    return adj, valid


def evolution_trajectory(projectors: Dict[str, Dict], src_state: int,
                         src_feat: jax.Array, dst_state: int = 4,
                         num_steps: int = 10
                         ) -> Optional[Tuple[jax.Array, jax.Array]]:
    """Simulate the feature trajectory src→adult (reference ``:127-175``):
    step i blends ``feat + projector(feat)·(α/2)`` with α = i/(n−1),
    re-normalized; returns (``[num_steps, D]``, attention weights)."""
    if dst_state != 4 or src_state not in (1, 3):
        return None
    key = f"{src_state}-{dst_state}"
    if key not in projectors:
        return None
    p = projectors[key]

    def step(feat, i):
        alpha = i / (num_steps - 1)
        delta = (feat @ p["w"] + p["b"]) * (alpha / 2.0)
        evolved = feat + delta
        evolved = l2_normalize(evolved, axis=None, keepdims=False)
        # step 0 keeps the original feature
        out = jnp.where(i == 0, feat, evolved)
        nxt = jnp.where(i < num_steps - 1, out, feat)
        return nxt, (out, alpha)

    _, (feats, alphas) = jax.lax.scan(step, src_feat, jnp.arange(num_steps, dtype=jnp.float32))
    return feats, alphas


def init_evolution_detector(key: jax.Array, feature_dim: int, hidden_dim: int) -> Dict:
    """Lifecycle-type detector MLP (reference ``:37-43``):
    Linear(2D→H) → LayerNorm → ReLU → Linear(H→3) → Softmax."""
    k1, k2 = jax.random.split(key)
    return {
        "fc1": _linear(k1, 2 * feature_dim, hidden_dim),
        "ln": {"scale": jnp.ones((hidden_dim,)), "bias": jnp.zeros((hidden_dim,))},
        "fc2": _linear(k2, hidden_dim, 3),
    }


def evolution_detector_forward(params: Dict, feat_pair: jax.Array) -> jax.Array:
    """``[B, 2D]`` (early/late-stage feature pair) -> lifecycle-type probs
    (complete / incomplete metamorphosis / direct development)."""
    h = feat_pair @ params["fc1"]["w"] + params["fc1"]["b"]
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.var(h, axis=-1, keepdims=True)
    h = (h - mu) * jax.lax.rsqrt(var + 1e-5)
    h = h * params["ln"]["scale"] + params["ln"]["bias"]
    h = jax.nn.relu(h)
    return jax.nn.softmax(h @ params["fc2"]["w"] + params["fc2"]["b"], axis=-1)


def integrate_with_state_distance(projectors: Dict[str, Dict],
                                  distance_matrix: jax.Array,
                                  scale: float = 0.1) -> Dict[str, Dict]:
    """Scale projector biases by state similarity (reference ``:520-544``):
    higher similarity between the transition's endpoints shrinks the bias,
    easing feature transfer. (In the reference this is a no-op because the
    projector dict is empty; here it acts on the real projectors.)"""
    sim = 1.0 - jnp.clip(distance_matrix / jnp.max(distance_matrix), 0.0, 1.0)
    out = {}
    for key_name, p in projectors.items():
        src, dst = map(int, key_name.split("-"))
        factor = 1.0 - scale * sim[src, dst]
        out[key_name] = {"w": p["w"], "b": p["b"] * factor}
    return out
