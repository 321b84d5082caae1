"""Unit tests: CLIP loss math, LR schedule, config surface, accuracy metrics,
PROOF net building blocks."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.config import Config, load_config
from team_tpu.learners.proof_net import (
    ProofDims,
    TaskContext,
    classification_logits,
    cosine_lr,
    init_buffers,
    init_proof_params,
    restore_frozen_slices,
    tri_modal_forward,
)
from team_tpu.losses.clip_loss import clip_loss
from team_tpu.utils.toolkit import accuracy, topk_accuracy


def test_clip_loss_matches_manual(rng):
    n, d = 6, 8
    img = rng.standard_normal((n, d)).astype(np.float32)
    txt = rng.standard_normal((n, d)).astype(np.float32)
    scale = 7.0
    out = float(clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(scale)))

    li = scale * img @ txt.T
    lt = scale * txt @ img.T

    def xent(logits):
        p = np.exp(logits - logits.max(1, keepdims=True))
        p /= p.sum(1, keepdims=True)
        return -np.mean(np.log(p[np.arange(n), np.arange(n)]))

    np.testing.assert_allclose(out, (xent(li) + xent(lt)) / 2, rtol=1e-5)


def test_clip_loss_perfect_alignment_low(rng):
    d = 8
    img = np.eye(d, dtype=np.float32)[:4]
    out_aligned = float(clip_loss(jnp.asarray(img), jnp.asarray(img), jnp.asarray(100.0)))
    shuffled = img[[1, 0, 3, 2]]
    out_shuffled = float(clip_loss(jnp.asarray(img), jnp.asarray(shuffled), jnp.asarray(100.0)))
    assert out_aligned < 1e-3 < out_shuffled


def test_cosine_lr_schedule():
    cfg = Config(init_lr=0.004, min_lr=0.0, tuned_epoch=20)
    assert np.isclose(cosine_lr(cfg, 0), 0.004)
    assert np.isclose(cosine_lr(cfg, 10), 0.002)
    assert np.isclose(cosine_lr(cfg, 20), 0.0)
    cfg2 = Config(init_lr=0.01, min_lr=0.001, tuned_epoch=10)
    assert np.isclose(cosine_lr(cfg2, 10), 0.001)


def test_config_json_roundtrip(tmp_path):
    p = tmp_path / "exp.json"
    p.write_text(json.dumps({
        "dataset": "iiminsects202", "tuned_epoch": 7, "batch_size": 4,
        "custom_extra_knob": 42, "seed": [1, 2],
    }))
    cfg = load_config(str(p), overrides={"tuned_epoch": 99, "model_name": "proof"})
    assert cfg.tuned_epoch == 7              # JSON wins over CLI (main.py:16 semantics)
    assert cfg.model_name == "proof"
    assert cfg.get("custom_extra_knob", None) == 42
    assert "custom_extra_knob" in cfg
    assert cfg["batch_size"] == 4
    d = cfg.to_dict()
    assert d["custom_extra_knob"] == 42


def test_accuracy_grouped_old_new_harmonic():
    y_true = np.array([0, 1, 2, 3, 10, 11, 12, 13])
    y_pred = np.array([0, 1, 2, 0, 10, 11, 0, 0])
    acc = accuracy(y_pred, y_true, nb_old=10, increment=10)
    assert acc["total"] == 62.5
    assert acc["old"] == 75.0
    assert acc["new"] == 50.0
    assert np.isclose(acc["harmonic"], 2 * 75 * 50 / 125)
    assert acc["00-09"] == 75.0
    assert topk_accuracy(np.array([[0, 5], [9, 1]]), np.array([5, 2])) == 50.0


def _tiny_setup():
    dims = ProofDims(feature_dim=8, max_classes=6, max_tasks=3, ctx_len=2)
    tr, aux = init_proof_params(jax.random.PRNGKey(0), dims, 2.0)
    ctx = TaskContext(
        task_mask=jnp.asarray([1.0, 1.0, 0.0]),
        cur_onehot=jnp.asarray([0.0, 1.0, 0.0]),
        class_mask=jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32),
        class_text_basic=jax.random.normal(jax.random.PRNGKey(1), (6, 8)),
    )
    return dims, tr, aux, ctx


def test_classification_logits_masked(rng):
    dims, tr, aux, ctx = _tiny_setup()
    x = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))
    logits = classification_logits(tr, x, ctx)
    assert logits.shape == (3, 6)
    assert float(logits[0, 4]) < -1e20 and float(logits[0, 5]) < -1e20
    assert np.isfinite(np.asarray(logits[:, :4])).all()


def test_tri_modal_forward_shapes_and_padding_invariance(rng):
    dims, tr, aux, ctx = _tiny_setup()
    buffers = init_buffers(dims)
    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    txt = ctx.class_text_basic[jnp.asarray([0, 1, 2, 3])]
    states = jnp.asarray([1, 4, 3, 4])
    img_f, txt_f, st_f, proto_f, scale = tri_modal_forward(
        tr, x, txt, states, buffers.img_prototypes, ctx)
    assert img_f.shape == (4, 8) and st_f.shape == (4, 8) and proto_f.shape == (4, 8)
    assert np.isclose(float(scale), np.exp(2.0))
    # corrupting an inactive class prototype must not change outputs
    protos2 = buffers.img_prototypes.at[5].set(100.0)
    img_f2, *_ = tri_modal_forward(tr, x, txt, states, protos2, ctx)
    np.testing.assert_allclose(np.asarray(img_f), np.asarray(img_f2), atol=1e-5)


def test_restore_frozen_slices(rng):
    dims, tr, aux, ctx = _tiny_setup()
    new_tr = jax.tree_util.tree_map(lambda x: x + 1.0, tr)
    restored = restore_frozen_slices(new_tr, tr, ctx.cur_onehot)
    # task 1 (current) keeps the update; tasks 0 and 2 restored
    np.testing.assert_allclose(np.asarray(restored["proj_img"]["w"][0]),
                               np.asarray(tr["proj_img"]["w"][0]))
    np.testing.assert_allclose(np.asarray(restored["proj_img"]["w"][1]),
                               np.asarray(tr["proj_img"]["w"][1] + 1.0))
    np.testing.assert_allclose(np.asarray(restored["context_prompts"][2]),
                               np.asarray(tr["context_prompts"][2]))
    # non-bank leaves keep the update (sel_attn, state_embed, logit_scale)
    np.testing.assert_allclose(np.asarray(restored["state_embed"]),
                               np.asarray(tr["state_embed"] + 1.0))


def test_evaluate_zs_pads_when_fewer_classes_than_topk():
    """Zero-shot eval with fewer total classes than topk: y_pred has k<topk
    columns; the tiled top-k comparison must pad (as _eval_cnn does) instead
    of crashing on a shape mismatch."""
    from team_tpu.learners.base import BaseLearner

    class _Z:  # duck-typed host for the method under test
        _total_classes = 2
        topk = 4

    y_true = np.asarray([0, 1, 1])
    y_pred = np.asarray([[0, 1], [0, 1], [1, 0]])  # only 2 class columns
    ret = BaseLearner._evaluate_zs(_Z(), y_pred, y_true)
    assert ret["top4"] == 100.0  # every label is inside the 2 real columns
    assert 0.0 <= ret["top1"] <= 100.0
