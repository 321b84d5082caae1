"""Unit tests for the numeric modules: projection banks, fusion attention,
cosine head, temporal GCN (vs a naive loop reference), state distance matrix,
and the evolution pass."""

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.modules.evolution import (
    ADULT_ONLY, LARVA_TO_ADULT, NYMPH_TO_ADULT, UNKNOWN,
    detect_lifecycle_types, evolve_and_update, state_time_steps, sync_class_prototypes,
)
from team_tpu.modules.fusion import fusion_attention, init_fusion
from team_tpu.modules.linears import cosine_linear_forward, init_cosine_linear, set_class_weights
from team_tpu.modules.projections import apply_projection_bank, init_projection_bank
from team_tpu.modules.state_distance import StateDistanceMatrix, biological_prior_matrix
from team_tpu.modules.temporal_gcn import init_temporal_gcn, temporal_gcn_forward


# ---------------------------------------------------------------------------
# projection banks
# ---------------------------------------------------------------------------

def test_projection_bank_sum_and_masking(rng):
    d, t = 8, 4
    bank = init_projection_bank(jax.random.PRNGKey(0), t, d)
    x = jnp.asarray(rng.standard_normal((3, d)).astype(np.float32))
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    out = apply_projection_bank(bank, x, mask)
    expected = (x @ bank["w"][0] + bank["b"][0]) + (x @ bank["w"][1] + bank["b"][1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_projection_bank_grads_current_task_only(rng):
    d, t = 6, 3
    bank = init_projection_bank(jax.random.PRNGKey(1), t, d)
    x = jnp.asarray(rng.standard_normal((2, d)).astype(np.float32))
    mask = jnp.asarray([1.0, 1.0, 0.0])
    cur = jnp.asarray([0.0, 1.0, 0.0])

    def loss(b):
        return jnp.sum(apply_projection_bank(b, x, mask, cur) ** 2)

    g = jax.grad(loss)(bank)
    assert float(jnp.abs(g["w"][0]).max()) == 0.0  # frozen old task
    assert float(jnp.abs(g["w"][1]).max()) > 0.0   # current task trains
    assert float(jnp.abs(g["w"][2]).max()) == 0.0  # inactive task


# ---------------------------------------------------------------------------
# fusion attention
# ---------------------------------------------------------------------------

def test_fusion_attention_key_mask_excludes_padded_tokens(rng):
    d = 16
    p = init_fusion(jax.random.PRNGKey(0), 1, d, d, d)
    x = rng.standard_normal((2, 5, d)).astype(np.float32)
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])
    out1 = fusion_attention(p, jnp.asarray(x), mask)
    # changing masked-key tokens must not affect valid positions
    x2 = x.copy()
    x2[:, 3:] = rng.standard_normal((2, 2, d))
    out2 = fusion_attention(p, jnp.asarray(x2), mask)
    np.testing.assert_allclose(np.asarray(out1[:, :3]), np.asarray(out2[:, :3]), atol=1e-5)


def test_fusion_attention_matches_manual_single_head(rng):
    d = 8
    p = init_fusion(jax.random.PRNGKey(1), 1, d, d, d)
    x = rng.standard_normal((1, 4, d)).astype(np.float32)
    out = np.asarray(fusion_attention(p, jnp.asarray(x), jnp.ones(4)))
    q = x @ np.asarray(p["w_qs"]); k = x @ np.asarray(p["w_ks"]); v = x @ np.asarray(p["w_vs"])
    logits = q[0] @ k[0].T / np.sqrt(d)
    a = np.exp(logits - logits.max(-1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    o = a @ v[0]
    o = o @ np.asarray(p["fc_w"]) + np.asarray(p["fc_b"]) + x[0]
    mu, var = o.mean(-1, keepdims=True), o.var(-1, keepdims=True)
    expected = (o - mu) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(out[0], expected, atol=1e-4)


# ---------------------------------------------------------------------------
# cosine head
# ---------------------------------------------------------------------------

def test_cosine_linear_prototype_classification(rng):
    d, c = 16, 4
    params = init_cosine_linear(jax.random.PRNGKey(0), 8, d)
    protos = rng.standard_normal((c, d)).astype(np.float32)
    params = set_class_weights(params, jnp.asarray(protos), jnp.arange(c))
    mask = jnp.zeros(8).at[:c].set(1.0)
    logits = cosine_linear_forward(params, jnp.asarray(protos), mask)
    # each prototype must classify to itself; inactive classes get -inf
    assert (np.asarray(jnp.argmax(logits, 1)) == np.arange(c)).all()
    assert float(logits[0, c]) < -1e20


# ---------------------------------------------------------------------------
# temporal GCN vs naive loop
# ---------------------------------------------------------------------------

def _naive_gcn(params, x, adj, t):
    def lin(p, v):
        return v @ np.asarray(p["w"]) + np.asarray(p["b"])

    def ln(p, v):
        mu, var = v.mean(-1, keepdims=True), v.var(-1, keepdims=True)
        return (v - mu) / np.sqrt(var + 1e-5) * np.asarray(p["scale"]) + np.asarray(p["bias"])

    h = np.maximum(ln(params["node_encoder"]["ln"], lin(params["node_encoder"], x)), 0)
    tt = np.maximum(ln(params["time_encoder"]["ln"], lin(params["time_encoder"], t)), 0)
    h = np.concatenate([h, tt], -1)
    n, hd = h.shape
    for blk in params["blocks"]:
        messages = np.zeros((n, hd))
        counts = np.zeros((n, 1))
        for dst in range(n):
            for src in range(n):
                w = adj[dst, src]
                if w > 0:
                    m = np.concatenate([h[src], h[dst]])
                    m = np.maximum(ln(blk["message"]["ln"], lin(blk["message"], m[None])), 0)[0] * w
                    messages[dst] += m
                    counts[dst] += 1
        valid = (counts > 0).astype(float)
        messages = messages / (counts + 1e-8) * valid
        gate = 1 / (1 + np.exp(-lin(blk["gate"], h)))
        upd = np.maximum(ln(blk["update"]["ln"], lin(blk["update"], np.concatenate([h, messages], -1))), 0)
        h = gate * upd + (1 - gate) * h
    out = lin(params["output_proj"], h)
    return out / np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


def test_temporal_gcn_matches_naive(rng):
    d, hidden, n = 12, 8, 5
    params = init_temporal_gcn(jax.random.PRNGKey(0), d, hidden, 2)
    x = rng.standard_normal((n, d)).astype(np.float32)
    t = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    adj = np.zeros((n, n), np.float32)
    adj[1, 0] = 0.8
    adj[2, 0] = 0.5
    adj[4, 3] = 1.0
    out = np.asarray(temporal_gcn_forward(params, jnp.asarray(x), jnp.asarray(adj), jnp.asarray(t)))
    ref = _naive_gcn(jax.tree_util.tree_map(np.asarray, params), x, adj, t)
    np.testing.assert_allclose(out, ref, atol=1e-4)


# ---------------------------------------------------------------------------
# state distance matrix
# ---------------------------------------------------------------------------

def test_biological_prior():
    m = biological_prior_matrix()
    assert m[1, 4] == m[4, 1] == 2.0
    assert m[3, 4] == 0.7
    assert m[1, 2] == 1.5
    assert m[0, 5] == 1.8 and m[0, 0] == 1.0


def test_distance_matrix_symmetric_unit_diag():
    sd = StateDistanceMatrix()
    m = np.asarray(sd.get_distance_matrix())
    np.testing.assert_allclose(m, m.T)
    np.testing.assert_allclose(np.diag(m), 1.0)


def test_merge_gcn_distances_double_ema():
    sd = StateDistanceMatrix(init_with_prior=False)  # all ones
    gcn = np.zeros((10, 10), np.float32)
    gcn[1, 4] = gcn[4, 1] = 0.2
    valid = np.zeros((10, 10), np.float32)
    valid[1, 4] = valid[4, 1] = 1.0
    sd.merge_gcn_distances(jnp.asarray(gcn), jnp.asarray(valid), weight=0.3)
    # off-diagonal pairs get the EMA applied twice: 0.49*1 + 0.51*0.2
    np.testing.assert_allclose(float(sd.distance_factors[1, 4]), 0.49 + 0.51 * 0.2, rtol=1e-6)
    assert float(sd.distance_factors[2, 3]) == 1.0  # untouched
    assert len(sd.update_history) == 1


def test_ema_update_from_batch(rng):
    sd = StateDistanceMatrix(update_interval=1, decay_factor=0.9)
    feats = rng.standard_normal((8, 512)).astype(np.float32)
    states = np.asarray([1, 1, 4, 4, 3, 3, 1, 4])
    before = np.asarray(sd.distance_factors).copy()
    sd.ema_update_from_batch(jnp.asarray(feats), jnp.asarray(states))
    after = np.asarray(sd.distance_factors)
    assert not np.allclose(before[1, 4], after[1, 4])
    assert np.allclose(before[0, 2], after[0, 2])  # state 0 excluded, 2 absent


# ---------------------------------------------------------------------------
# evolution
# ---------------------------------------------------------------------------

def _mk_buffers(rng, c=4, s=10, d=16):
    protos = rng.standard_normal((c, s, d)).astype(np.float32)
    protos /= np.linalg.norm(protos, axis=-1, keepdims=True)
    mask = np.zeros((c, s), np.float32)
    return protos, mask


def test_detect_lifecycle_types():
    mask = np.zeros((5, 10))
    mask[0, [1, 4]] = 1   # larva + adult
    mask[1, [3, 4]] = 1   # nymph + adult
    mask[2, [4]] = 1      # adult only
    mask[3, [2]] = 1      # pupa only -> unknown
    mask[4, [1, 3, 4]] = 1  # larva priority
    types = np.asarray(detect_lifecycle_types(jnp.asarray(mask)))
    assert list(types) == [LARVA_TO_ADULT, NYMPH_TO_ADULT, ADULT_ONLY, UNKNOWN, LARVA_TO_ADULT]


def test_state_time_steps():
    mask = np.zeros((2, 10))
    mask[0, [1, 4]] = 1
    mask[1, [1, 2, 4]] = 1
    t = np.asarray(state_time_steps(jnp.asarray(mask)))
    assert t[0, 1] == 0.0 and t[0, 4] == 1.0
    np.testing.assert_allclose([t[1, 1], t[1, 2], t[1, 4]], [0.0, 0.5, 1.0])


def test_evolve_and_update_changes_only_participating(rng):
    protos, mask = _mk_buffers(rng)
    mask[0, 1] = mask[0, 4] = 1      # participates (2 states)
    mask[1, 4] = 1                   # single state: excluded
    mask[2, 1] = mask[2, 4] = 1      # participates
    gcn = init_temporal_gcn(jax.random.PRNGKey(0), 16, 8, 2)
    types = jnp.full((4,), UNKNOWN, jnp.int32)
    res = evolve_and_update(gcn, jnp.asarray(protos), jnp.asarray(mask), types)
    out = np.asarray(res.prototypes)
    assert not np.allclose(out[0, 1], protos[0, 1])       # updated
    np.testing.assert_allclose(out[1, 4], protos[1, 4])   # single-state untouched
    np.testing.assert_allclose(out[3], protos[3])         # absent class untouched
    ev = np.asarray(res.embed_valid)
    assert ev[0] and ev[2] and not ev[1] and not ev[3]
    # updated features are L2-normalized (GCN output norm)
    np.testing.assert_allclose(np.linalg.norm(out[0, 1]), 1.0, rtol=1e-5)
    # distances exist for (1,4) and (4,1) and the (1,1)/(4,4) same-state pairs
    dv = np.asarray(res.dist_valid)
    assert dv[1, 4] and dv[4, 1] and dv[1, 1] and dv[4, 4]
    # lifecycle types updated for participating classes
    lt = np.asarray(res.lifecycle_types)
    assert lt[0] == LARVA_TO_ADULT and lt[2] == LARVA_TO_ADULT
    assert lt[1] == UNKNOWN  # non-participating keeps previous


def test_evolve_no_edges_is_noop(rng):
    protos, mask = _mk_buffers(rng)
    mask[0, 4] = 1  # every class single-state -> no nodes/edges
    gcn = init_temporal_gcn(jax.random.PRNGKey(0), 16, 8, 2)
    res = evolve_and_update(gcn, jnp.asarray(protos), jnp.asarray(mask),
                            jnp.full((4,), UNKNOWN, jnp.int32))
    np.testing.assert_allclose(np.asarray(res.prototypes), protos)
    assert not np.asarray(res.embed_valid).any()
    assert not np.asarray(res.dist_valid).any()


def test_sync_class_prototypes_adult_weighting(rng):
    protos, mask = _mk_buffers(rng, c=2)
    mask[0, 1] = mask[0, 4] = 1
    img = rng.standard_normal((2, 16)).astype(np.float32)
    out = np.asarray(sync_class_prototypes(jnp.asarray(protos), jnp.asarray(mask),
                                           jnp.asarray(img), 1.5))
    expected = (1.0 * protos[0, 1] + 1.5 * protos[0, 4]) / 2.5
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(out[0], expected, atol=1e-5)
    np.testing.assert_allclose(out[1], img[1])  # class without states keeps old proto


def test_analysis_plots_render(tmp_path, rng):
    """Plot artifacts render headlessly (distance heatmap, t-SNE atlas, paths)."""
    from team_tpu.analysis.plots import (
        analyze_state_evolution, visualize_distance_matrix, visualize_evolution_path,
    )
    from team_tpu.learners.proof_net import ProofDims, init_buffers

    sd = StateDistanceMatrix()
    p1 = str(tmp_path / "dist.png")
    visualize_distance_matrix(sd, p1)
    import os
    assert os.path.isfile(p1)

    dims = ProofDims(feature_dim=8, max_classes=4, max_tasks=2)
    buf = init_buffers(dims)
    protos = rng.standard_normal((4, 10, 8)).astype(np.float32)
    mask = np.zeros((4, 10), np.float32)
    mask[0, [1, 4]] = 1
    mask[1, [3, 4]] = 1
    mask[2, [1, 4]] = 1
    buf = buf._replace(proto_state=jnp.asarray(protos), proto_mask=jnp.asarray(mask))
    out = analyze_state_evolution(buf, [f"c{i}" for i in range(4)], save_dir=str(tmp_path))
    assert out and os.path.isfile(out)
    visualize_evolution_path(buf, save_dir=str(tmp_path / "evo"))
    assert os.path.isfile(str(tmp_path / "evo" / "class_0_evolution.png"))


def test_temporal_gcn_zero_weight_edges_count(rng):
    """Zero-weight edges contribute to the in-degree denominator (the reference
    appends weight-0 intra edges for 2-state classes): results must differ from
    omitting the edge entirely."""
    d, hidden, n = 12, 8, 3
    params = init_temporal_gcn(jax.random.PRNGKey(0), d, hidden, 2)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, (n, 1)).astype(np.float32))
    adj = jnp.zeros((n, n)).at[1, 0].set(0.5)  # real edge 0->1
    mask_with_zero = (adj > 0).at[1, 2].set(True)  # plus a 0-weight edge 2->1
    out_zero_edge = np.asarray(temporal_gcn_forward(params, x, adj, t, mask_with_zero))
    out_plain = np.asarray(temporal_gcn_forward(params, x, adj, t))
    assert not np.allclose(out_zero_edge[1], out_plain[1])  # denominator 2 vs 1
    np.testing.assert_allclose(out_zero_edge[0], out_plain[0], atol=1e-6)


def test_evolution_two_state_class_zero_weight_intra_edge(rng):
    """A single 2-state class has only weight-0 intra edges — they must still be
    treated as existing (prototypes get updated, has_edges true)."""
    protos, mask = _mk_buffers(rng, c=1)
    mask[0, 1] = mask[0, 4] = 1
    gcn = init_temporal_gcn(jax.random.PRNGKey(0), 16, 8, 2)
    res = evolve_and_update(gcn, jnp.asarray(protos), jnp.asarray(mask),
                            jnp.full((1,), UNKNOWN, jnp.int32))
    assert not np.allclose(np.asarray(res.prototypes[0, 1]), protos[0, 1])
    assert bool(res.embed_valid[0])


def test_lifecycle_semantics_require_five_states():
    """The lifecycle semantics hard-code state ids 1/3/4 (larva/nymph/adult,
    as the reference does); num_states < 5 must fail loudly instead of
    mis-indexing or silently mis-weighting."""
    import pytest

    from team_tpu.modules.evolution import detect_lifecycle_types
    from team_tpu.modules.state_distance import biological_prior_matrix

    with pytest.raises(ValueError, match="num_states"):
        biological_prior_matrix(4)
    with pytest.raises(ValueError, match="num_states"):
        detect_lifecycle_types(jnp.ones((3, 4)))
    # >= 5 still works
    assert biological_prior_matrix(5).shape == (5, 5)
    assert detect_lifecycle_types(jnp.ones((3, 5))).shape == (3,)
