"""Tests for secondary heads, the dynamic modal graph, lifecycle extras,
augmentation ops, and toolkit helpers."""

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from team_tpu.data.augment import AUGMENT_OPS, cutout, cutout_batch, random_augment
from team_tpu.modules.dynamic_graph import (
    connectivity_forward,
    dmig_forward,
    dynamic_gcn_forward,
    global_feature,
    init_connectivity_extractor,
    init_dmig,
    init_dynamic_gcn,
    init_relation_modeler,
    relation_graph,
)
from team_tpu.modules.heads import (
    bias_layer_forward,
    cosine_proxy_forward,
    init_bias_layer,
    init_cosine_proxy_linear,
    init_simple_linear,
    reduce_proxies,
    simple_linear_forward,
    split_cosine_forward,
    weight_align,
)
from team_tpu.modules.lifecycle import (
    class_evolution_graph,
    evolution_detector_forward,
    evolution_trajectory,
    init_evolution_detector,
    init_evolution_projectors,
    integrate_with_state_distance,
)
from team_tpu.utils.toolkit import split_images_labels, target2onehot, tensor2numpy


def test_simple_linear_and_mask(rng):
    p = init_simple_linear(jax.random.PRNGKey(0), 8, 5)
    x = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))
    logits = simple_linear_forward(p, x, jnp.asarray([1, 1, 1, 0, 0], jnp.float32))
    assert logits.shape == (3, 5)
    assert float(logits[0, 4]) < -1e20


def test_reduce_proxies_softmax_attention(rng):
    out = jnp.asarray(rng.standard_normal((2, 6)).astype(np.float32))  # 3 classes x 2 proxies
    red = np.asarray(reduce_proxies(out, 2))
    o = np.asarray(out).reshape(2, 3, 2)
    att = np.exp(o) / np.exp(o).sum(-1, keepdims=True)
    np.testing.assert_allclose(red, (att * o).sum(-1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(reduce_proxies(out, 1)), np.asarray(out))


def test_cosine_proxy_and_split(rng):
    p = init_cosine_proxy_linear(jax.random.PRNGKey(0), 8, 3, nb_proxy=2)
    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    out = cosine_proxy_forward(p, x)
    assert out.shape == (4, 3)
    old = init_cosine_proxy_linear(jax.random.PRNGKey(1), 8, 2, nb_proxy=1)
    new = init_cosine_proxy_linear(jax.random.PRNGKey(2), 8, 2, nb_proxy=1)
    res = split_cosine_forward(old, new, jnp.ones(()), x)
    assert res["logits"].shape == (4, 4)
    assert res["old_scores"].shape == (4, 2)


def test_weight_align_normalizes_new_rows(rng):
    w = np.concatenate([rng.standard_normal((4, 8)), 5.0 * rng.standard_normal((2, 8))])
    out = np.asarray(weight_align(jnp.asarray(w.astype(np.float32)), 2))
    old_mean = np.linalg.norm(out[:4], axis=1).mean()
    new_mean = np.linalg.norm(out[4:], axis=1).mean()
    np.testing.assert_allclose(old_mean, new_mean, rtol=1e-5)


def test_bias_layer_affects_only_range(rng):
    p = init_bias_layer()
    p = {"alpha": jnp.asarray([2.0]), "beta": jnp.asarray([1.0])}
    logits = jnp.asarray(rng.standard_normal((2, 6)).astype(np.float32))
    out = np.asarray(bias_layer_forward(p, logits, 2, 4))
    np.testing.assert_allclose(out[:, :2], np.asarray(logits[:, :2]))
    np.testing.assert_allclose(out[:, 2:4], 2 * np.asarray(logits[:, 2:4]) + 1, atol=1e-6)


# ---------------------------------------------------------------------------

def test_relation_graph_threshold_and_shapes(rng):
    p = init_relation_modeler(jax.random.PRNGKey(0), 8, 16)
    nodes = jnp.asarray(rng.standard_normal((5, 8)).astype(np.float32))
    adj, etype, mask = relation_graph(p, nodes, relation_threshold=-1e9)
    assert adj.shape == (5, 5)
    assert not np.asarray(mask).diagonal().any()  # no self edges
    adj2, _, mask2 = relation_graph(p, nodes, relation_threshold=1e9)
    assert not np.asarray(mask2).any()
    g = global_feature(p, nodes)
    assert g.shape == (1, 8)


def test_dynamic_gcn_message_passing(rng):
    p = init_dynamic_gcn(jax.random.PRNGKey(0), 8, 16, 8, num_layers=2)
    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    out_no_edges = dynamic_gcn_forward(p, x, None)
    adj = jnp.zeros((4, 4)).at[1, 0].set(0.7)
    out_edges = dynamic_gcn_forward(p, x, adj)
    assert out_edges.shape == (4, 8)
    # node 0 has no incoming edges; nodes independent except via messages
    assert not np.allclose(np.asarray(out_edges[1]), np.asarray(out_no_edges[1]))


def test_connectivity_and_dmig(rng):
    p = init_connectivity_extractor(jax.random.PRNGKey(0), 16)
    nodes = jnp.asarray(rng.standard_normal((6, 16)).astype(np.float32))
    g = connectivity_forward(p, nodes)
    assert g.shape == (1, 16)
    dmig = init_dmig(jax.random.PRNGKey(1), 16, 8)
    feats = {"image": nodes[:3], "text": nodes[3:5], "state": nodes[5:]}
    out = dmig_forward(dmig, feats, relation_threshold=-1e9)
    assert out.shape == (1, 16)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------

def test_class_evolution_graph():
    mask = jnp.zeros(10).at[1].set(1).at[4].set(1)
    adj, valid = class_evolution_graph(mask, jnp.asarray(0))  # larva type
    assert bool(valid)
    assert float(adj[4, 1]) == 1.0 and float(adj[1, 4]) == 0.0
    adj2, valid2 = class_evolution_graph(jnp.zeros(10).at[4].set(1), jnp.asarray(2))
    assert not bool(valid2)


def test_evolution_trajectory(rng):
    projs = init_evolution_projectors(jax.random.PRNGKey(0), 8)
    feat = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    feats, alphas = evolution_trajectory(projs, 1, feat, 4)
    assert feats.shape == (10, 8)
    np.testing.assert_allclose(np.asarray(feats[0]), np.asarray(feat))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats[5])), 1.0, rtol=1e-5)
    assert evolution_trajectory(projs, 2, feat, 4) is None  # pupa has no projector


def test_evolution_detector_and_integration(rng):
    det = init_evolution_detector(jax.random.PRNGKey(0), 8, 4)
    pair = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))
    probs = np.asarray(evolution_detector_forward(det, pair))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    projs = init_evolution_projectors(jax.random.PRNGKey(1), 8)
    dist = jnp.ones((10, 10)).at[1, 4].set(2.0)
    out = integrate_with_state_distance(projs, dist)
    assert not np.allclose(np.asarray(out["3-4"]["b"]), np.asarray(projs["3-4"]["b"]))


# ---------------------------------------------------------------------------

def test_augment_ops_run(rng):
    img = Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    for name, (fn, vr) in AUGMENT_OPS.items():
        out = fn(img, 0.5 * (vr[0] + vr[1])) if vr else fn(img)
        assert out.size == (32, 32), name
    out = random_augment(img, rng, n=3)
    assert out.size == (32, 32)
    cut = cutout(img, 4, rng)
    assert (np.asarray(cut) == 0).any()


def test_cutout_batch_zeroes_square(rng):
    imgs = jnp.ones((2, 16, 16, 3))
    out = np.asarray(cutout_batch(imgs, np.asarray([4, 4]), seed=0))
    assert (out == 0).any() and (out == 1).any()


def test_toolkit_helpers():
    oh = target2onehot([0, 2], 3)
    np.testing.assert_array_equal(oh, [[1, 0, 0], [0, 0, 1]])
    assert tensor2numpy(jnp.ones(3)).shape == (3,)
    imgs, labels = split_images_labels([("a.jpg", 0), ("b.jpg", 1)])
    assert list(labels) == [0, 1]


def test_grad_cam_saliency(rng):
    from team_tpu.analysis.gradcam import grad_cam
    from team_tpu.backbone.clip import CLIPConfig, init_clip_params

    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(rng.standard_normal(
        (2, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal(cfg.embed_dim).astype(np.float32))
    cam = np.asarray(grad_cam(params, imgs, target, cfg))
    g = cfg.vision.grid
    assert cam.shape == (2, g, g)
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6
