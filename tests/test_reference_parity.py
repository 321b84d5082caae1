"""Cross-implementation parity vs the ACTUAL torch reference (CPU).

Round-1 goldens verified JAX modules against the builder's own numpy
re-derivations — internally consistent, but a shared misreading would pass.
These tests execute the real reference code from ``/root/reference`` (torch
CPU), transplant seeded state dicts into the JAX counterparts, and assert the
outputs match on random inputs including the edge cases (2-state classes,
singleton classes, zero-weight temporal edges, isolated nodes).

Covered reference modules:
* ``models/dynamic_modal_graph.py``: TemporalStateGCN/TemporalGCNBlock,
  DynamicGCN, DynamicRelationModeler, GlobalConnectivityExtractor
* ``utils/state_distance.py``: AdaptiveStateDistanceMatrix (getter + EMA fwd)
* ``convs/linears.py``: CosineLinear (proxies), SplitCosineLinear
* ``convs/projections.py``: MultiHeadAttention (fusion layer)
* ``models/proof.py:21-191``: unicl_loss (exec-extracted — its module imports
  open_clip, unavailable offline)
* ``models/state_evolution.py:239-367``: InsectLifecycleModel.evolve_and_update
* ``utils/toolkit.py``: accuracy, ClipLoss (single-process path)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

os.environ.setdefault("MPLBACKEND", "Agg")
REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

torch.manual_seed(0)

ATOL = 1e-5
RTOL = 1e-5


def t2j(t):
    return jnp.asarray(t.detach().cpu().numpy())


def lin_p(mod):
    """torch nn.Linear -> {'w': [in, out], 'b': [out]}."""
    p = {"w": t2j(mod.weight).T}
    p["b"] = t2j(mod.bias) if mod.bias is not None else jnp.zeros((mod.weight.shape[0],))
    return p


def ln_p(mod):
    return {"scale": t2j(mod.weight), "bias": t2j(mod.bias)}


def allclose(a, b, atol=ATOL, rtol=RTOL, msg=""):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol,
                               err_msg=msg)


# ===========================================================================
# TemporalStateGCN / TemporalGCNBlock (dynamic_modal_graph.py:210-337)
# ===========================================================================

def _transplant_tgcn(ref):
    return {
        "node_encoder": {**lin_p(ref.node_encoder[0]), "ln": ln_p(ref.node_encoder[1])},
        "time_encoder": {**lin_p(ref.time_encoder[0]), "ln": ln_p(ref.time_encoder[1])},
        "blocks": [
            {
                "message": {**lin_p(b.message_net[0]), "ln": ln_p(b.message_net[1])},
                "update": {**lin_p(b.update_net[0]), "ln": ln_p(b.update_net[1])},
                "gate": lin_p(b.temporal_gate[0]),
            }
            for b in ref.temporal_blocks
        ],
        "output_proj": lin_p(ref.output_proj),
    }


def _edges_to_dense(edge_index, edge_weights, n):
    """Reference edge list ([2, E] src/dst) -> dense adj/mask indexed [dst, src]."""
    adj = np.zeros((n, n), np.float32)
    mask = np.zeros((n, n), bool)
    for e in range(edge_index.shape[1]):
        s, d = int(edge_index[0, e]), int(edge_index[1, e])
        adj[d, s] += float(edge_weights[e])
        mask[d, s] = True
    return jnp.asarray(adj), jnp.asarray(mask)


def test_temporal_gcn_parity(rng):
    from models.dynamic_modal_graph import TemporalStateGCN
    from team_tpu.modules.temporal_gcn import temporal_gcn_forward

    D, H, N = 32, 24, 7
    ref = TemporalStateGCN(feature_dim=D, hidden_dim=H, num_layers=2).eval()
    params = _transplant_tgcn(ref)

    nodes = rng.standard_normal((N, D)).astype(np.float32)
    times = rng.uniform(0, 1, (N, 1)).astype(np.float32)
    # edges incl. a ZERO-WEIGHT edge (2-state class: 1-|dt|=0) and an isolated
    # node (node 6 gets no edges at all)
    edges = [(0, 1, 0.5), (1, 2, 1.0), (2, 0, 0.25), (3, 4, 0.0), (4, 3, 0.7),
             (0, 5, 0.9)]
    ei = torch.tensor([[s for s, d, w in edges], [d for s, d, w in edges]])
    ew = torch.tensor([w for s, d, w in edges], dtype=torch.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(nodes), ei, ew, torch.from_numpy(times)).numpy()

    adj, mask = _edges_to_dense(ei.numpy(), ew.numpy(), N)
    got = temporal_gcn_forward(params, jnp.asarray(nodes), adj, jnp.asarray(times), mask)
    allclose(got, want, msg="TemporalStateGCN forward")


def test_temporal_gcn_block_edge_cases(rng):
    """Zero-weight edges must still enter the mean denominator; gate math."""
    from models.dynamic_modal_graph import TemporalGCNBlock
    from team_tpu.modules.temporal_gcn import _block_forward

    H = 30  # hidden_dim + hidden_dim//4 shape used inside TemporalStateGCN
    ref = TemporalGCNBlock(H).eval()
    params = {
        "message": {**lin_p(ref.message_net[0]), "ln": ln_p(ref.message_net[1])},
        "update": {**lin_p(ref.update_net[0]), "ln": ln_p(ref.update_net[1])},
        "gate": lin_p(ref.temporal_gate[0]),
    }
    N = 5
    x = rng.standard_normal((N, H)).astype(np.float32)
    # node 3: only a zero-weight in-edge; node 4: isolated
    edges = [(0, 1, 0.3), (1, 0, 0.3), (2, 1, 0.8), (0, 3, 0.0)]
    ei = torch.tensor([[s for s, d, w in edges], [d for s, d, w in edges]])
    ew = torch.tensor([w for s, d, w in edges], dtype=torch.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), ei, ew).numpy()
    adj, mask = _edges_to_dense(ei.numpy(), ew.numpy(), N)
    got = _block_forward(params, jnp.asarray(x), adj, mask)
    allclose(got, want, msg="TemporalGCNBlock (zero-weight edge + isolated node)")


# ===========================================================================
# AdaptiveStateDistanceMatrix (utils/state_distance.py)
# ===========================================================================

def test_state_distance_getter_parity():
    from utils.state_distance import AdaptiveStateDistanceMatrix
    from team_tpu.modules.state_distance import StateDistanceMatrix

    ref = AdaptiveStateDistanceMatrix(num_states=10, feature_dim=64)
    mine = StateDistanceMatrix(num_states=10, feature_dim=64)
    allclose(mine.distance_factors, ref.distance_factors.detach().numpy(),
             msg="biological prior init")
    allclose(mine.get_distance_matrix(), ref.get_distance_matrix().detach().numpy(),
             msg="symmetrized getter")


def test_state_distance_ema_forward_parity(rng):
    """The reference forward() EMA-updates every present off-diagonal pair TWICE
    (both loop orders write both cells), so the effective step is
    decay^2*old + (1-decay^2)*new."""
    from utils.state_distance import AdaptiveStateDistanceMatrix
    from team_tpu.modules.state_distance import StateDistanceMatrix

    B, D = 24, 64
    feats = rng.standard_normal((B, D)).astype(np.float32)
    # states incl. 0 (excluded by the reference's range(1, S) loop) and a
    # state (7) appearing once
    sids = np.array([0, 0, 1, 1, 1, 2, 2, 4, 4, 4, 4, 7] + [1, 2, 4] * 4)

    ref = AdaptiveStateDistanceMatrix(num_states=10, feature_dim=D,
                                      update_interval=1, decay_factor=0.9)
    with torch.no_grad():
        ret_ref = ref(torch.from_numpy(feats), torch.from_numpy(sids)).numpy()

    mine = StateDistanceMatrix(num_states=10, feature_dim=D,
                               update_interval=1, decay_factor=0.9)
    ret_mine = mine.ema_update_from_batch(jnp.asarray(feats), jnp.asarray(sids))

    allclose(ret_mine, ret_ref, msg="forward() returns the PRE-update matrix")
    allclose(mine.distance_factors, ref.distance_factors.detach().numpy(),
             atol=1e-4, rtol=1e-4, msg="post-update distance factors (double EMA)")


# ===========================================================================
# CosineLinear / SplitCosineLinear (convs/linears.py)
# ===========================================================================

def test_cosine_linear_parity(rng):
    from convs.linears import CosineLinear
    from team_tpu.modules.heads import cosine_proxy_forward

    B, D, C, P = 9, 48, 6, 3
    ref = CosineLinear(D, C, nb_proxy=P, to_reduce=True, sigma=True).eval()
    with torch.no_grad():
        ref.sigma.fill_(1.7)
    x = rng.standard_normal((B, D)).astype(np.float32)
    want = ref(torch.from_numpy(x))["logits"].detach().numpy()

    params = {"weight": t2j(ref.weight), "sigma": jnp.asarray(1.7), "nb_proxy": P}
    got = cosine_proxy_forward(params, jnp.asarray(x), to_reduce=True)
    allclose(got, want, msg="CosineLinear with proxy reduction")


def test_split_cosine_linear_parity(rng):
    from convs.linears import SplitCosineLinear
    from team_tpu.modules.heads import split_cosine_forward

    B, D, C1, C2, P = 7, 32, 4, 2, 2
    ref = SplitCosineLinear(D, C1, C2, nb_proxy=P, sigma=True).eval()
    with torch.no_grad():
        ref.sigma.fill_(0.8)
    x = rng.standard_normal((B, D)).astype(np.float32)
    want = ref(torch.from_numpy(x))
    got = split_cosine_forward(
        {"weight": t2j(ref.fc1.weight)}, {"weight": t2j(ref.fc2.weight)},
        jnp.asarray(0.8), jnp.asarray(x), nb_proxy=P)
    for key in ("old_scores", "new_scores", "logits"):
        allclose(got[key], want[key].detach().numpy(), msg=f"SplitCosineLinear {key}")


# ===========================================================================
# MultiHeadAttention fusion (convs/projections.py:41-87)
# ===========================================================================

@pytest.mark.parametrize("n_head", [1, 2])
def test_fusion_mha_parity(rng, n_head):
    from convs.projections import MultiHeadAttention
    from team_tpu.modules.fusion import fusion_attention

    B, S, D = 4, 11, 64
    d_k = d_v = D // n_head
    ref = MultiHeadAttention(n_head, D, d_k, d_v, dropout=0.1).eval()
    params = {
        "w_qs": t2j(ref.w_qs.weight).T,
        "w_ks": t2j(ref.w_ks.weight).T,
        "w_vs": t2j(ref.w_vs.weight).T,
        "fc_w": t2j(ref.fc.weight).T,
        "fc_b": t2j(ref.fc.bias),
        "ln": ln_p(ref.layer_norm),
    }
    x = rng.standard_normal((B, S, D)).astype(np.float32)
    with torch.no_grad():
        want = ref(*([torch.from_numpy(x)] * 3)).numpy()
    got = fusion_attention(params, jnp.asarray(x), jnp.ones((S,)), n_head=n_head,
                           deterministic=True)
    allclose(got, want, atol=2e-5, rtol=2e-5, msg="fusion MultiHeadAttention")


# ===========================================================================
# unicl_loss (models/proof.py:21-191) — exec-extracted
# ===========================================================================

def _load_ref_unicl():
    src = open(os.path.join(REF, "models", "proof.py")).read()
    start = src.index("def unicl_loss")
    end = src.index("\nclass Learner")
    import logging as _logging
    import math as _math

    ns = {"torch": torch, "nn": torch.nn, "F": torch.nn.functional,
          "math": _math, "logging": _logging, "np": np}
    exec(compile(src[start:end], "ref_unicl", "exec"), ns)
    return ns["unicl_loss"]


def _unicl_case(rng, with_evo: bool, epoch=None, max_epoch=None):
    from team_tpu.losses.unicl import unicl_loss

    ref_unicl = _load_ref_unicl()
    D, C = 32, 5
    # class 0: 3 samples over 2 states (one duplicated state)
    # class 1: singleton; class 2: no evolution feature (None)
    # class 3: 2 samples SAME state (multi-sample but u=1 -> no enhancement)
    # class 4: 3 samples, 3 distinct states
    labels = np.array([0, 0, 0, 1, 2, 2, 3, 3, 4, 4, 4])
    sids = np.array([1, 4, 1, 4, 1, 2, 4, 4, 1, 2, 4])
    b = len(labels)
    img = rng.standard_normal((b, D)).astype(np.float32)
    txt = rng.standard_normal((b, D)).astype(np.float32)
    st = rng.standard_normal((b, D)).astype(np.float32)
    evo = rng.standard_normal((C, D)).astype(np.float32)
    evo_valid = np.array([True, True, False, True, True])

    if with_evo:
        evo_list = [None if not evo_valid[c] else torch.from_numpy(evo[c])
                    for c in range(C)]
    else:
        evo_list = None
    want, want_parts = ref_unicl(
        torch.from_numpy(img), torch.from_numpy(txt), torch.from_numpy(st),
        torch.from_numpy(labels), torch.from_numpy(sids),
        temperature=0.07, epoch=epoch, max_epoch=max_epoch,
        evolution_features=evo_list)

    kw = {}
    if with_evo:
        kw = dict(evolution_embeddings=jnp.asarray(evo),
                  evolution_valid=jnp.asarray(evo_valid))
    got, got_parts = unicl_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(st),
        jnp.asarray(labels), jnp.asarray(sids), temperature=0.07,
        epoch=None if epoch is None else jnp.asarray(epoch),
        max_epoch=max_epoch, **kw)
    allclose(got, float(want), atol=1e-5, rtol=1e-4, msg="unicl total")
    allclose(got_parts["instance_loss"], want_parts["instance_loss"],
             atol=1e-5, rtol=1e-4, msg="unicl instance term")
    allclose(got_parts["category_loss"], want_parts["category_loss"],
             atol=1e-5, rtol=1e-4, msg="unicl category term")


def test_unicl_parity_plain(rng):
    _unicl_case(rng, with_evo=False)


def test_unicl_parity_dynamic_temperature(rng):
    _unicl_case(rng, with_evo=False, epoch=3, max_epoch=10)


def test_unicl_parity_evolution_enhancement(rng):
    _unicl_case(rng, with_evo=True, epoch=7, max_epoch=20)


# ===========================================================================
# DynamicGCN / DynamicRelationModeler / GlobalConnectivityExtractor
# ===========================================================================

def test_dynamic_gcn_parity(rng):
    from models.dynamic_modal_graph import DynamicGCN
    from team_tpu.modules.dynamic_graph import dynamic_gcn_forward as dynamic_gcn_ref_forward

    IN, HID, OUT, N = 24, 20, 16, 6
    ref = DynamicGCN(IN, HID, OUT, num_layers=2, dropout=0.1).eval()
    params = {
        "layers": [
            {"lin": lin_p(l), "ln": ln_p(n)}
            for l, n in zip(ref.layers, ref.norms)
        ]
    }
    x = rng.standard_normal((N, IN)).astype(np.float32)
    edges = [(0, 1, 0.4), (2, 3, 0.9), (3, 2, 0.9), (1, 4, 0.1)]
    ei = torch.tensor([[s for s, d, w in edges], [d for s, d, w in edges]])
    ew = torch.tensor([w for s, d, w in edges], dtype=torch.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), ei, ew).numpy()
    adj, _ = _edges_to_dense(ei.numpy(), ew.numpy(), N)
    got = dynamic_gcn_ref_forward(params, jnp.asarray(x), adj)
    allclose(got, want, msg="DynamicGCN with message passing")

    with torch.no_grad():
        want_ne = ref(torch.from_numpy(x)).numpy()
    got_ne = dynamic_gcn_ref_forward(params, jnp.asarray(x), None)
    allclose(got_ne, want_ne, msg="DynamicGCN no-edge path")


def test_relation_modeler_parity(rng):
    from models.dynamic_modal_graph import DynamicRelationModeler
    from team_tpu.modules.dynamic_graph import relation_graph

    D, HID, N = 24, 16, 5
    ref = DynamicRelationModeler(D, HID, num_relations=4).eval()
    params = {
        "relation_projectors": [
            {"fc1": lin_p(p[0]), "ln": ln_p(p[1]), "fc2": lin_p(p[3])}
            for p in ref.relation_projector
        ],
        "topology_gate": {"fc1": lin_p(ref.topology_gate[0]),
                          "ln": ln_p(ref.topology_gate[1]),
                          "fc2": lin_p(ref.topology_gate[3])},
        "global_aggregator": {"fc1": lin_p(ref.global_aggregator[0]),
                              "ln": ln_p(ref.global_aggregator[1]),
                              "fc2": lin_p(ref.global_aggregator[3])},
    }
    feats = rng.standard_normal((N, D)).astype(np.float32)
    # reference consumes a features dict; one modality is enough for edge math
    with torch.no_grad():
        nf, ei, ew, ntypes, etypes = ref({"img": torch.from_numpy(feats)},
                                         relation_threshold=0.1)
    want_adj = np.zeros((N, N), np.float32)
    want_type = -np.ones((N, N), np.int64)
    if ei is not None:
        for e in range(ei.shape[1]):
            s, d = int(ei[0, e]), int(ei[1, e])
            want_adj[d, s] = float(ew[e])
            want_type[d, s] = int(etypes[e])

    adj, etype, mask = relation_graph(params, jnp.asarray(feats),
                                      relation_threshold=0.1)
    allclose(adj, want_adj, atol=2e-5, rtol=2e-5, msg="relation adjacency")
    got_type = np.where(np.asarray(mask), np.asarray(etype), -1)
    assert np.array_equal(got_type, want_type), "relation edge types"

    from team_tpu.modules.dynamic_graph import global_feature
    with torch.no_grad():
        want_gf = ref.get_global_feature(torch.from_numpy(feats)).numpy()
    allclose(global_feature(params, jnp.asarray(feats)), want_gf,
             msg="global aggregator")


def test_connectivity_extractor_parity(rng):
    from models.dynamic_modal_graph import GlobalConnectivityExtractor
    from team_tpu.modules.dynamic_graph import connectivity_forward

    D, N = 64, 9
    ref = GlobalConnectivityExtractor(D, dropout=0.1).eval()

    def enc_layer(l):
        return {
            "qkv_w": t2j(l.self_attn.in_proj_weight).T,
            "qkv_b": t2j(l.self_attn.in_proj_bias),
            "out_w": t2j(l.self_attn.out_proj.weight).T,
            "out_b": t2j(l.self_attn.out_proj.bias),
            "ln1": ln_p(l.norm1),
            "ff1": lin_p(l.linear1),
            "ff2": lin_p(l.linear2),
            "ln2": ln_p(l.norm2),
        }

    params = {
        "layers": [enc_layer(l) for l in ref.connectivity_transformer.layers],
        "n_heads": 8,
        "output": {"lin": lin_p(ref.output_proj[0]), "ln": ln_p(ref.output_proj[1])},
    }
    x = rng.standard_normal((N, D)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = connectivity_forward(params, jnp.asarray(x))
    allclose(got, want, atol=2e-5, rtol=2e-5, msg="GlobalConnectivityExtractor")


# ===========================================================================
# evolve_and_update (models/state_evolution.py:239-367) — end to end
# ===========================================================================

def test_evolve_and_update_parity(rng):
    from models.state_evolution import InsectLifecycleModel
    from team_tpu.modules.evolution import evolve_and_update, UNKNOWN

    D, HID, S, C = 32, 24, 10, 4
    ref = InsectLifecycleModel(feature_dim=D, hidden_dim=HID, num_states=S).eval()
    params = _transplant_tgcn(ref.temporal_gcn)

    # class 0: larva->pupa->adult (3 states); class 1: nymph->adult (2 states,
    # zero-weight temporal edge); class 2: single state (excluded, <2 states);
    # class 3: larva->adult (shares lifecycle type with class 0 -> inter edges)
    present = {0: [1, 2, 4], 1: [3, 4], 2: [4], 3: [1, 4]}
    protos = np.zeros((C, S, D), np.float32)
    mask = np.zeros((C, S), np.float32)
    ref_dict = {}
    for c, states in present.items():
        ref_dict[c] = {}
        for s in states:
            v = rng.standard_normal(D).astype(np.float32)
            protos[c, s] = v
            mask[c, s] = 1.0
            ref_dict[c][s] = torch.from_numpy(v.copy())

    with torch.no_grad():
        want = ref.evolve_and_update({c: dict(d) for c, d in ref_dict.items()})

    got = evolve_and_update(params, jnp.asarray(protos), jnp.asarray(mask),
                            jnp.full((C,), UNKNOWN, dtype=jnp.int32))

    for c, states in present.items():
        for s in states:
            if len(states) >= 2:
                allclose(got.prototypes[c, s], want["prototypes"][c][s].numpy(),
                         msg=f"evolved prototype class {c} state {s}")
            else:
                allclose(got.prototypes[c, s], protos[c, s],
                         msg=f"non-participating prototype class {c} must not move")

    for c in range(C):
        if c in present and len(present[c]) >= 2:
            assert bool(got.embed_valid[c])
            allclose(got.embeddings[c], want["embeddings"][c].numpy(),
                     msg=f"class embedding {c}")
            allclose(got.lifecycle_features[c], want["lifecycle_features"][c].numpy(),
                     msg=f"lifecycle features {c}")
        else:
            assert not bool(got.embed_valid[c])

    for s1, inner in want["distances"].items():
        for s2, dval in inner.items():
            assert bool(got.dist_valid[s1, s2]), f"distance ({s1},{s2}) missing"
            allclose(got.distances[s1, s2], dval, atol=1e-4, rtol=1e-4,
                     msg=f"state distance ({s1},{s2})")


# ===========================================================================
# toolkit: accuracy + ClipLoss (utils/toolkit.py)
# ===========================================================================

def test_accuracy_parity(rng):
    from utils.toolkit import accuracy as ref_accuracy
    from team_tpu.utils.toolkit import accuracy

    y_true = rng.integers(0, 20, 400)
    y_pred = np.where(rng.uniform(size=400) < 0.5, y_true, rng.integers(0, 20, 400))
    want = ref_accuracy(y_pred, y_true, nb_old=12, increment=10)
    got = accuracy(y_pred, y_true, nb_old=12, increment=10)
    assert set(want.keys()) == set(got.keys())
    for k in want:
        assert abs(float(want[k]) - float(got[k])) < 1e-9, k


def test_clip_loss_parity(rng):
    from utils.toolkit import ClipLoss
    from team_tpu.losses.clip_loss import clip_loss

    B, D = 16, 32
    img = rng.standard_normal((B, D)).astype(np.float32)
    txt = rng.standard_normal((B, D)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    scale = 42.7
    ref = ClipLoss()
    with torch.no_grad():
        want = ref(torch.from_numpy(img), torch.from_numpy(txt),
                   torch.tensor(scale)).item()
    got = clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(scale))
    allclose(got, want, atol=1e-5, rtol=1e-5, msg="ClipLoss single-process")


# ===========================================================================
# Augment op library (utils/ops.py:5-121)
# ===========================================================================

def test_augment_ops_match_reference(rng):
    """Every PIL op must match the reference op class pixel-for-pixel at a
    fixed magnitude (the reference folds a random sign into each op; ours take
    the signed magnitude — compared here at positive sign via random.seed)."""
    import random as _random

    from PIL import Image
    from utils import ops as ref_ops

    from team_tpu.data import augment as aug

    img = Image.fromarray(rng.integers(0, 255, (48, 40, 3), dtype=np.uint8))

    def ref(op_cls, magnitude, sign=1):
        # reference ops draw random.choice([-1, 1]); pin it via seeding
        while True:
            state = _random.getstate()
            if _random.choice([-1, 1]) == sign:
                _random.setstate(state)
                return op_cls()(img, magnitude)
            # retry until the next draw yields the wanted sign
            continue

    cases = [
        (aug.shear_x(img, 0.2), ref(ref_ops.ShearX, 0.2)),
        (aug.shear_y(img, 0.15), ref(ref_ops.ShearY, 0.15)),
        (aug.translate_x(img, 0.25), ref(ref_ops.TranslateX, 0.25)),
        (aug.translate_y(img, 0.1), ref(ref_ops.TranslateY, 0.1)),
        (aug.rotate(img, 20.0), ref(ref_ops.Rotate, 20.0)),
        (aug.color(img, 1.5), ref(ref_ops.Color, 0.5)),
        (aug.posterize(img, 4), ref(ref_ops.Posterize, 4)),
        (aug.solarize(img, 128), ref(ref_ops.Solarize, 128)),
        (aug.contrast(img, 1.3), ref(ref_ops.Contrast, 0.3)),
        (aug.sharpness(img, 1.7), ref(ref_ops.Sharpness, 0.7)),
        (aug.brightness(img, 1.2), ref(ref_ops.Brightness, 0.2)),
        (aug.auto_contrast(img), ref_ops.AutoContrast()(img, 0)),
        (aug.equalize(img), ref_ops.Equalize()(img, 0)),
        (aug.invert(img), ref_ops.Invert()(img, 0)),
    ]
    for i, (got, want) in enumerate(cases):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"augment case {i}")


def test_cutout_matches_reference_geometry(rng):
    """Cutout square side must be 2*(length//2) around the center, like the
    reference's tensor Cutout (utils/ops.py:10-30)."""
    import torch as _torch

    from utils.ops import Cutout as RefCutout

    from team_tpu.data.augment import cutout

    h = w = 32
    length = 10
    img = rng.integers(1, 255, (h, w, 3), dtype=np.uint8)
    from PIL import Image as _I

    # pin numpy's legacy RNG (the reference draws the hole center from it)
    np.random.seed(7)
    ref_img = _torch.from_numpy(img.transpose(2, 0, 1).astype(np.float32))
    want = RefCutout(1, length)(ref_img).numpy().transpose(1, 2, 0)
    np.random.seed(7)
    y, x = np.random.randint(h), np.random.randint(w)

    got = np.asarray(cutout(_I.fromarray(img), length,
                            rng=_FixedRng(y, x))).astype(np.float32)
    np.testing.assert_array_equal(got, want)


class _FixedRng:
    def __init__(self, *vals):
        self._vals = list(vals)

    def integers(self, _n):
        return self._vals.pop(0)
