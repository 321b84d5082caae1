"""Temporal state graph-convolution network, vectorized for the MXU.

Counterpart of the reference ``TemporalStateGCN`` / ``TemporalGCNBlock``
(``models/dynamic_modal_graph.py:210-337``), which performs message passing with a
per-edge Python loop (``:311-321``). Here edges live in a dense weighted adjacency
``adj[dst, src]`` (0 = no edge) and the whole message tensor is computed with two
rank-factored matmuls:

``message(s→d) = ReLU(LN(W·[x_s ; x_d] + b)) * w_{sd}`` — since the first layer is
linear in the concatenation, ``W·[x_s;x_d] = (X W_src)_s + (X W_dst)_d``, so only
the ``[N, N, H]`` post-activation tensor is materialized (never the ``2H`` concat).
Aggregation is a masked mean over sources, then the gated residual update —
identical math to the reference loop, N² edges in one shot.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from team_tpu.utils.jmath import l2_normalize

Params = Dict[str, Any]


def _init_linear(key, d_in, d_out):
    bound = 1.0 / jnp.sqrt(jnp.asarray(float(d_in)))
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound),
    }


def _init_ln(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def _ln(p, x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return ((x - mean) * jax.lax.rsqrt(var + 1e-5)) * p["scale"] + p["bias"]


def init_temporal_gcn(key: jax.Array, feature_dim: int, hidden_dim: int, num_layers: int = 2) -> Params:
    ks = jax.random.split(key, 3 + num_layers)
    h_t = hidden_dim + hidden_dim // 4
    blocks: List[Params] = []
    for i in range(num_layers):
        kb = jax.random.split(ks[3 + i], 3)
        blocks.append(
            {
                "message": {**_init_linear(kb[0], 2 * h_t, h_t), "ln": _init_ln(h_t)},
                "update": {**_init_linear(kb[1], 2 * h_t, h_t), "ln": _init_ln(h_t)},
                "gate": _init_linear(kb[2], h_t, 1),
            }
        )
    return {
        "node_encoder": {**_init_linear(ks[0], feature_dim, hidden_dim), "ln": _init_ln(hidden_dim)},
        "time_encoder": {**_init_linear(ks[1], 1, hidden_dim // 4), "ln": _init_ln(hidden_dim // 4)},
        "blocks": blocks,
        "output_proj": _init_linear(ks[2], h_t, feature_dim),
    }


def _block_forward(p: Params, x: jax.Array, adj: jax.Array, edge_mask: jax.Array) -> jax.Array:
    """One TemporalGCNBlock over ``x: [N, H]`` with ``adj: [N, N]`` weights and
    ``edge_mask: [N, N]`` existence (both [dst, src]).

    Existence is separate from weight on purpose: the reference's intra-class
    temporal edges carry weight ``1 − |Δt|``, which is exactly 0 for a 2-state
    class (Δt = 1) — a zero-message edge that still increments the in-degree
    used by the mean aggregation (``dynamic_modal_graph.py:311-325``)."""
    n, h = x.shape
    w = p["message"]["w"]
    w_src, w_dst = w[:h], w[h:]
    # pre-activation of message(s→d): rank-factored, [N_dst, N_src, H]
    pre = (x @ w_dst)[:, None, :] + (x @ w_src)[None, :, :] + p["message"]["b"]
    msg = jax.nn.relu(_ln(p["message"]["ln"], pre))
    em = edge_mask.astype(x.dtype)
    weighted = msg * (adj * em)[:, :, None]
    counts = jnp.sum(em, axis=1, keepdims=True)  # in-degree per dst
    messages = jnp.sum(weighted, axis=1) / (counts + 1e-8)
    messages = messages * (counts > 0).astype(x.dtype)

    gate = jax.nn.sigmoid(x @ p["gate"]["w"] + p["gate"]["b"])
    uw = p["update"]["w"]
    upd_pre = x @ uw[:h] + messages @ uw[h:] + p["update"]["b"]
    h_new = jax.nn.relu(_ln(p["update"]["ln"], upd_pre))
    return gate * h_new + (1.0 - gate) * x


def temporal_gcn_forward(
    params: Params,
    node_features: jax.Array,
    adj: jax.Array,
    time_steps: jax.Array,
    edge_mask: jax.Array | None = None,
    time_weight: float = 1.0,
) -> jax.Array:
    """``node_features: [N, D]``, ``adj: [N, N]`` weights (dst, src), ``time_steps:
    [N, 1]`` -> L2-normalized updated features ``[N, D]``.

    ``edge_mask`` marks which (dst, src) pairs are edges; defaults to ``adj > 0``
    (zero-weight edges still aggregate into the mean denominator when the mask
    says so). Nodes with no in/out edges still pass through encoders + the gated
    self-update, exactly as isolated nodes do in the reference loop.

    ``time_weight`` scales the encoded time features before concatenation —
    fix-mode honoring of the reference's declared-but-unread
    ``temporal_feature_weight`` config key (1.0 = reference behavior).
    """
    if edge_mask is None:
        edge_mask = adj > 0
    ne = params["node_encoder"]
    te = params["time_encoder"]
    h = jax.nn.relu(_ln(ne["ln"], node_features @ ne["w"] + ne["b"]))
    t = jax.nn.relu(_ln(te["ln"], time_steps @ te["w"] + te["b"]))
    x = jnp.concatenate([h, time_weight * t], axis=-1)
    for blk in params["blocks"]:
        x = _block_forward(blk, x, adj, edge_mask)
    op = params["output_proj"]
    out = x @ op["w"] + op["b"]
    return l2_normalize(out)
