"""Dynamic multimodal relation graph, vectorized.

Counterparts of reference ``models/dynamic_modal_graph.py:5-208``:
* ``DynamicRelationModeler`` (``:5-106``) — 4 relation-scoring MLPs + sigmoid
  topology gate over all node pairs. The reference loops O(N²) pairs in Python
  (``:69-87``); here every pair is scored in one batched pass and the edge set
  is a dense mask (score of the strongest relation, thresholded).
* ``DynamicGCN`` (``:108-163``) — per-layer linear + ReLU, weighted-sum message
  passing (``:149-157`` accumulates ``w·h_src`` into ``h_dst``), LayerNorm.
* ``GlobalConnectivityExtractor`` (``:165-208``) — 2-layer 8-head transformer
  encoder + mean pool + projection.

These power the DMIG capability surface (reference ``models/proof.py:686-702``,
defined but never instantiated) and the lifecycle model's secondary paths.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from team_tpu.ops.attention import multi_head_attention


def _linear(key, d_in, d_out):
    bound = 1.0 / jnp.sqrt(jnp.asarray(float(d_in)))
    kw, kb = jax.random.split(key)
    return {"w": jax.random.uniform(kw, (d_in, d_out), minval=-bound, maxval=bound),
            "b": jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound)}


def _ln_init(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _ln(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return ((x - mu) * jax.lax.rsqrt(var + eps)) * p["scale"] + p["bias"]


def _mlp2(key, d_in, d_h, d_out):
    k1, k2 = jax.random.split(key)
    return {"fc1": _linear(k1, d_in, d_h), "ln": _ln_init(d_h), "fc2": _linear(k2, d_h, d_out)}


def _mlp2_fwd(p, x):
    h = jax.nn.relu(_ln(p["ln"], x @ p["fc1"]["w"] + p["fc1"]["b"]))
    return h @ p["fc2"]["w"] + p["fc2"]["b"]


# ---------------------------------------------------------------------------
# DynamicRelationModeler
# ---------------------------------------------------------------------------

def init_relation_modeler(key: jax.Array, feature_dim: int, hidden_dim: int,
                          num_relations: int = 4) -> Dict:
    ks = jax.random.split(key, num_relations + 2)
    return {
        "relation_projectors": [_mlp2(ks[i], 2 * feature_dim, hidden_dim, 1)
                                for i in range(num_relations)],
        "topology_gate": _mlp2(ks[-2], 2 * feature_dim, hidden_dim, 1),
        "global_aggregator": _mlp2(ks[-1], feature_dim, hidden_dim, feature_dim),
    }


def relation_graph(params: Dict, node_features: jax.Array,
                   node_mask: Optional[jax.Array] = None,
                   relation_threshold: float = 0.2
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Score all ordered node pairs; returns (adj_weights [N,N] indexed
    [dst, src], edge_type [N,N] int, edge_mask [N,N] bool).

    The strongest of the ``num_relations`` scores forms an edge i→j when above
    ``relation_threshold`` (reference semantics ``:77-87``, vectorized: each
    relation MLP is linear in [x_i ; x_j] before its LayerNorm, so the pair
    tensor factorizes into two [N, H] matmuls).
    """
    n, d = node_features.shape
    scores = []
    for proj in params["relation_projectors"]:
        w = proj["fc1"]["w"]
        src_part = node_features @ w[:d]
        dst_part = node_features @ w[d:]
        pre = src_part[:, None, :] + dst_part[None, :, :] + proj["fc1"]["b"]
        h = jax.nn.relu(_ln(proj["ln"], pre))
        s = h @ proj["fc2"]["w"] + proj["fc2"]["b"]  # [N, N, 1]
        scores.append(s[..., 0])
    stacked = jnp.stack(scores, axis=-1)               # [N_src, N_dst, R]
    best = jnp.max(stacked, axis=-1)
    best_type = jnp.argmax(stacked, axis=-1)
    mask = best > relation_threshold
    mask = mask & ~jnp.eye(n, dtype=bool)
    if node_mask is not None:
        pv = (node_mask > 0)
        mask = mask & pv[:, None] & pv[None, :]
    adj = jnp.where(mask, best, 0.0).T  # [dst, src]
    return adj, best_type.T, mask.T


def global_feature(params: Dict, node_features: jax.Array) -> jax.Array:
    """Mean-pool + aggregator MLP (reference ``get_global_feature``, ``:99-106``)."""
    pooled = jnp.mean(node_features, axis=0, keepdims=True)
    return _mlp2_fwd(params["global_aggregator"], pooled)


# ---------------------------------------------------------------------------
# DynamicGCN
# ---------------------------------------------------------------------------

def init_dynamic_gcn(key: jax.Array, in_dim: int, hidden_dim: int, out_dim: int,
                     num_layers: int = 2) -> Dict:
    dims: List[Tuple[int, int]] = []
    if num_layers == 1:
        dims = [(in_dim, out_dim)]
    else:
        dims.append((in_dim, hidden_dim))
        for _ in range(num_layers - 2):
            dims.append((hidden_dim, hidden_dim))
        dims.append((hidden_dim, out_dim))
    ks = jax.random.split(key, len(dims))
    return {
        "layers": [{"lin": _linear(ks[i], a, b), "ln": _ln_init(b)} for i, (a, b) in enumerate(dims)],
    }


def dynamic_gcn_forward(params: Dict, x: jax.Array,
                        adj: Optional[jax.Array] = None) -> jax.Array:
    """Per-layer: h = ReLU(W x); h_dst += Σ_src adj[dst,src]·h_src; LN.
    ``adj=None`` reduces to plain feature transform (reference ``:131-139``;
    dropout is eval-mode identity)."""
    for layer in params["layers"]:
        h = jax.nn.relu(x @ layer["lin"]["w"] + layer["lin"]["b"])
        if adj is not None:
            h = h + adj @ h
        x = _ln(layer["ln"], h)
    return x


# ---------------------------------------------------------------------------
# GlobalConnectivityExtractor
# ---------------------------------------------------------------------------

def init_connectivity_extractor(key: jax.Array, feature_dim: int, n_heads: int = 8,
                                num_layers: int = 2) -> Dict:
    def enc_layer(k):
        k = jax.random.split(k, 6)
        d, ff = feature_dim, feature_dim * 4
        return {
            "qkv_w": jax.random.normal(k[0], (d, 3 * d)) * (d ** -0.5),
            "qkv_b": jnp.zeros((3 * d,)),
            "out_w": jax.random.normal(k[1], (d, d)) * (d ** -0.5),
            "out_b": jnp.zeros((d,)),
            "ln1": _ln_init(d),
            "ff1": _linear(k[2], d, ff),
            "ff2": _linear(k[3], ff, d),
            "ln2": _ln_init(d),
        }

    ks = jax.random.split(key, num_layers + 1)
    return {
        "layers": [enc_layer(ks[i]) for i in range(num_layers)],
        "n_heads": n_heads,
        "output": {"lin": _linear(ks[-1], feature_dim, feature_dim), "ln": _ln_init(feature_dim)},
    }


def connectivity_forward(params: Dict, node_features: jax.Array) -> jax.Array:
    """[N, D] -> pooled global feature [1, D] through a post-LN transformer
    encoder (torch ``nn.TransformerEncoderLayer`` default layout)."""
    x = node_features[None]  # [1, N, D]
    h_count = params["n_heads"]
    b, s, d = x.shape
    dh = d // h_count
    for layer in params["layers"]:
        qkv = x @ layer["qkv_w"] + layer["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, s, h_count, dh).transpose(0, 2, 1, 3)

        o = multi_head_attention(heads(q), heads(k), heads(v), s, impl="xla")
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        x = _ln(layer["ln1"], x + o @ layer["out_w"] + layer["out_b"])
        ff = jax.nn.relu(x @ layer["ff1"]["w"] + layer["ff1"]["b"])
        ff = ff @ layer["ff2"]["w"] + layer["ff2"]["b"]
        x = _ln(layer["ln2"], x + ff)
    pooled = jnp.mean(x, axis=1)
    out = pooled @ params["output"]["lin"]["w"] + params["output"]["lin"]["b"]
    return _ln(params["output"]["ln"], out)


# ---------------------------------------------------------------------------
# DMIG composite (reference models/proof.py:686-702, never instantiated there)
# ---------------------------------------------------------------------------

def init_dmig(key: jax.Array, feature_dim: int, hidden_dim: int) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "relation_modeler": init_relation_modeler(k1, feature_dim, hidden_dim),
        "graph_network": init_dynamic_gcn(k2, feature_dim, hidden_dim, feature_dim),
        "global_extractor": init_connectivity_extractor(k3, feature_dim),
    }


def dmig_forward(params: Dict, features: Dict[str, jax.Array],
                 relation_threshold: float = 0.2) -> jax.Array:
    """Concatenate modal feature sets into one node list, build the dynamic
    relation graph, run the GCN, and pool a global feature."""
    nodes = jnp.concatenate(list(features.values()), axis=0)
    adj, _, _ = relation_graph(params["relation_modeler"], nodes,
                               relation_threshold=relation_threshold)
    updated = dynamic_gcn_forward(params["graph_network"], nodes, adj)
    return connectivity_forward(params["global_extractor"], updated)
