"""Fix-mode config honoring (VERDICT r1 item 7).

``parity_mode=True`` reproduces the reference's hard-coded behavior;
``parity_mode=False`` must HONOR the JSON keys the reference declares but never
reads. Each knob is tested at its owning module, plus an end-to-end run
toggling several at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from team_tpu.config import Config


def _cfg(**kw):
    base = dict(
        prefix="fix", dataset="synthetic_insects", model_name="proof",
        convnet_type="clip", init_cls=3, increment=3, memory_size=12,
        tuned_epoch=2, batch_size=16, init_lr=0.01, optimizer="adam",
        context_prompt_length_per_task=2, seed=[3], shuffle=True,
        log_dir="/tmp/team_logs_fix",
        extras={"tiny_backbone": True,
                "dataset_kwargs": {"num_classes": 6, "img_size": 32}},
    )
    base.update(kw)
    return Config(**base)


# ---------------------------------------------------------------------------
# lr_scheduler / milestones / gamma
# ---------------------------------------------------------------------------

def test_lr_schedule_steplr_and_constant():
    from team_tpu.learners.proof_net import cosine_lr, lr_schedule

    cfg = _cfg(parity_mode=False, lr_scheduler="steplr", init_lr=0.1,
               milestones=[1, 3], gamma=0.5, tuned_epoch=5)
    assert lr_schedule(cfg, 0) == pytest.approx(0.1)
    assert lr_schedule(cfg, 1) == pytest.approx(0.05)
    assert lr_schedule(cfg, 2) == pytest.approx(0.05)
    assert lr_schedule(cfg, 3) == pytest.approx(0.025)

    cfg_const = _cfg(parity_mode=False, lr_scheduler="constant", init_lr=0.1)
    assert lr_schedule(cfg_const, 7) == pytest.approx(0.1)

    # parity mode ignores lr_scheduler and keeps cosine (reference proof.py:363)
    cfg_par = _cfg(parity_mode=True, lr_scheduler="steplr", init_lr=0.1,
                   milestones=[1], gamma=0.5, tuned_epoch=5)
    assert lr_schedule(cfg_par, 2) == pytest.approx(cosine_lr(cfg_par, 2))


# ---------------------------------------------------------------------------
# temporal graph knobs
# ---------------------------------------------------------------------------

def _two_state_bank(rng, d=16):
    protos = np.zeros((2, 10, d), np.float32)
    mask = np.zeros((2, 10), np.float32)
    for c, states in ((0, (1, 4)), (1, (1, 4))):
        for s in states:
            protos[c, s] = rng.standard_normal(d)
            mask[c, s] = 1.0
    return jnp.asarray(protos), jnp.asarray(mask)


def test_temporal_relation_threshold_drops_weak_edges(rng):
    """A 2-state class's temporal edge has weight 1-|dt| = 0; with a positive
    threshold and no inter-class edges, nothing evolves."""
    from team_tpu.modules.evolution import UNKNOWN, evolve_and_update
    from team_tpu.modules.temporal_gcn import init_temporal_gcn

    d = 16
    params = init_temporal_gcn(jax.random.PRNGKey(0), d, 8)
    protos, mask = _two_state_bank(rng, d)
    # make the two classes different lifecycle types to kill inter-class edges
    mask_mixed = np.asarray(mask).copy()
    protos_mixed = np.asarray(protos).copy()
    protos_mixed[1, 3] = protos_mixed[1, 1]
    mask_mixed[1, 3], mask_mixed[1, 1] = 1.0, 0.0  # class 1: nymph lifecycle
    types0 = jnp.full((2,), UNKNOWN, jnp.int32)

    res = evolve_and_update(params, jnp.asarray(protos_mixed),
                            jnp.asarray(mask_mixed), types0,
                            intra_edge_threshold=0.2)
    np.testing.assert_array_equal(np.asarray(res.prototypes), protos_mixed)

    # default (parity) keeps the zero-weight edge -> prototypes DO move
    res_par = evolve_and_update(params, jnp.asarray(protos_mixed),
                                jnp.asarray(mask_mixed), types0)
    assert not np.allclose(np.asarray(res_par.prototypes), protos_mixed)


def test_inter_edge_weight_changes_evolution(rng):
    from team_tpu.modules.evolution import UNKNOWN, evolve_and_update
    from team_tpu.modules.temporal_gcn import init_temporal_gcn

    d = 16
    params = init_temporal_gcn(jax.random.PRNGKey(0), d, 8)
    protos, mask = _two_state_bank(rng, d)
    types0 = jnp.full((2,), UNKNOWN, jnp.int32)
    a = evolve_and_update(params, protos, mask, types0)
    b = evolve_and_update(params, protos, mask, types0, inter_edge_weight=0.05)
    assert not np.allclose(np.asarray(a.prototypes), np.asarray(b.prototypes))


def test_time_weight_changes_gcn_output(rng):
    from team_tpu.modules.temporal_gcn import init_temporal_gcn, temporal_gcn_forward

    d = 16
    params = init_temporal_gcn(jax.random.PRNGKey(1), d, 8)
    x = jnp.asarray(rng.standard_normal((4, d)).astype(np.float32))
    adj = jnp.zeros((4, 4)).at[1, 0].set(0.8)
    t = jnp.asarray(rng.uniform(0, 1, (4, 1)).astype(np.float32))
    a = temporal_gcn_forward(params, x, adj, t)
    b = temporal_gcn_forward(params, x, adj, t, time_weight=0.25)
    assert not np.allclose(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# exemplar strategy / lifecycle projectors
# ---------------------------------------------------------------------------

def test_exemplar_selection_strategies(rng):
    from team_tpu.learners.simplecil import Learner

    vectors = rng.standard_normal((30, 8)).astype(np.float32)
    mean = vectors.mean(axis=0)

    l_closest = Learner(_cfg(parity_mode=False,
                             exemplar_selection_strategy="closest"))
    idx = l_closest._select_exemplars(vectors, mean, 5)
    d = np.linalg.norm(vectors - mean[None], axis=1)
    np.testing.assert_array_equal(np.sort(d[idx]), np.sort(d)[ :5])

    l_random = Learner(_cfg(parity_mode=False,
                            exemplar_selection_strategy="random"))
    ridx = l_random._select_exemplars(vectors, mean, 5)
    assert len(np.unique(ridx)) == 5

    # parity mode herds regardless of the key
    l_par = Learner(_cfg(parity_mode=True, exemplar_selection_strategy="random"))
    from team_tpu.learners.base import herding_selection
    np.testing.assert_array_equal(
        l_par._select_exemplars(vectors, mean, 5),
        herding_selection(vectors, mean, 5))


def test_fix_mode_lifecycle_integration(rng):
    """Fix mode routes integrate_with_state_distance to the REAL projectors
    and honors lifecycle_weight + state_evolution_steps."""
    from team_tpu.learners.factory import get_model

    cfg = _cfg(parity_mode=False, lifecycle_weight=0.5, state_evolution_steps=4)
    learner = get_model("proof", cfg)
    learner.dims = type("D", (), {"feature_dim": 8})()
    learner.integrate_with_state_distance()
    assert learner._evo_projectors is not None
    # the prior distance for 1-4 is the matrix max (sim 0 -> factor 1), so the
    # observable scaling lives on the 3-4 transition (sim 0.65 under the prior)
    b_before = np.asarray(learner._evo_projectors["3-4"]["b"]).copy()
    learner.integrate_with_state_distance()
    b_after = np.asarray(learner._evo_projectors["3-4"]["b"])
    assert not np.allclose(b_before, b_after)  # biases actually scaled

    traj = learner.evolution_trajectory(1, jnp.asarray(rng.standard_normal(8)))
    feats, alphas = traj
    assert feats.shape == (4, 8)  # state_evolution_steps honored

    # parity mode: no-op, no projectors
    par = get_model("proof", _cfg(parity_mode=True))
    par.integrate_with_state_distance()
    assert getattr(par, "_evo_projectors", None) is None


# ---------------------------------------------------------------------------
# per-shard CLIP loss (global_clip_loss=False)
# ---------------------------------------------------------------------------

def test_per_shard_clip_loss_value(rng):
    from team_tpu.learners.proof_net import (
        ProofDims, TaskContext, init_buffers, init_proof_params, proof_loss,
    )

    dims = ProofDims(feature_dim=8, max_classes=6, max_tasks=2, ctx_len=2)
    tr, _ = init_proof_params(jax.random.PRNGKey(0), dims, 2.0)
    ctx = TaskContext(
        task_mask=jnp.asarray([1.0, 0.0]), cur_onehot=jnp.asarray([1.0, 0.0]),
        class_mask=jnp.asarray([1, 1, 1, 0, 0, 0], jnp.float32),
        class_text_basic=jax.random.normal(jax.random.PRNGKey(1), (6, 8)),
    )
    buffers = init_buffers(dims)
    batch = {
        "feat": jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 3, 8).astype(np.int32)),
        "stage_id": jnp.asarray(rng.integers(1, 5, 8).astype(np.int32)),
    }
    kw = dict(max_epoch=2, temperature=0.07, instance_weight=1.0,
              category_weight=0.5, unicl_weight=0.3, num_states=10,
              parity_no_grad_ce=True)
    rng_key = jax.random.PRNGKey(2)
    _, s_global = proof_loss(tr, batch, ctx, buffers, rng_key, jnp.asarray(0),
                             clip_shards=1, **kw)
    _, s_shard = proof_loss(tr, batch, ctx, buffers, rng_key, jnp.asarray(0),
                            clip_shards=4, **kw)
    # per-shard negatives differ from global ones -> a different (finite) loss
    assert np.isfinite(float(s_shard.clip_loss))
    assert abs(float(s_shard.clip_loss) - float(s_global.clip_loss)) > 1e-6
    # ce/unicl identical (the knob only touches the contrastive term)
    np.testing.assert_allclose(float(s_shard.ce_loss), float(s_global.ce_loss),
                               rtol=1e-6)


def test_per_shard_clip_loss_ignores_pure_padding_shards(rng):
    """Pad-don't-drop under clip_shards>1: per-shard losses aggregate weighted
    by VALID counts, so tail shards made entirely of padding carry zero weight
    — the padded batch's clip term equals the unpadded batch's under the same
    real-row shard layout (a plain mean would scale it by the non-empty
    fraction)."""
    from team_tpu.learners.proof_net import (
        ProofDims, TaskContext, init_buffers, init_proof_params, proof_loss,
    )

    dims = ProofDims(feature_dim=8, max_classes=6, max_tasks=2, ctx_len=2)
    tr, _ = init_proof_params(jax.random.PRNGKey(0), dims, 2.0)
    ctx = TaskContext(
        task_mask=jnp.asarray([1.0, 0.0]), cur_onehot=jnp.asarray([1.0, 0.0]),
        class_mask=jnp.asarray([1, 1, 1, 0, 0, 0], jnp.float32),
        class_text_basic=jax.random.normal(jax.random.PRNGKey(1), (6, 8)),
    )
    buffers = init_buffers(dims)
    feat = rng.standard_normal((8, 8)).astype(np.float32)
    label = rng.integers(0, 3, 8).astype(np.int32)
    stage = rng.integers(1, 5, 8).astype(np.int32)
    kw = dict(max_epoch=2, temperature=0.07, instance_weight=1.0,
              category_weight=0.5, unicl_weight=0.3, num_states=10,
              parity_no_grad_ce=True)
    rng_key = jax.random.PRNGKey(2)
    # unpadded: 8 real rows in 2 shards of 4
    _, s_ref = proof_loss(
        tr, {"feat": jnp.asarray(feat), "label": jnp.asarray(label),
             "stage_id": jnp.asarray(stage)},
        ctx, buffers, rng_key, jnp.asarray(0), clip_shards=2, **kw)
    # padded to 16 rows in 4 shards of 4: shards 2-3 are pure padding
    pad = {
        "feat": jnp.asarray(np.concatenate([feat, np.zeros_like(feat)])),
        "label": jnp.asarray(np.concatenate([label, np.zeros_like(label)])),
        "stage_id": jnp.asarray(np.concatenate([stage, np.ones_like(stage)])),
        "valid_mask": jnp.asarray([1.0] * 8 + [0.0] * 8),
    }
    _, s_pad = proof_loss(tr, pad, ctx, buffers, rng_key, jnp.asarray(0),
                          clip_shards=4, **kw)
    np.testing.assert_allclose(float(s_pad.clip_loss), float(s_ref.clip_loss),
                               rtol=1e-5)


# ---------------------------------------------------------------------------
# end-to-end: several fix-mode knobs at once
# ---------------------------------------------------------------------------

def test_fix_mode_end_to_end():
    from team_tpu.trainer import train

    cfg = _cfg(
        parity_mode=False,
        lr_scheduler="steplr", milestones=[1], gamma=0.5,
        exemplar_selection_strategy="random",
        stage_first_replay=True,
        temporal_relation_threshold=0.1,
        class_lifecycle_consistency=0.8,
        temporal_feature_weight=0.5,
        temperature=0.05, unicl_instance_weight=0.8, unicl_category_weight=0.4,
        temporal_gcn_hidden_dim=16,
    )
    res = train(cfg)
    assert len(res["cnn_top1"]) == 2
    for acc in res["cnn_top1"]:
        assert 0.0 <= acc <= 100.0


def test_fix_mode_temporal_disabled():
    """temporal_enabled=false must skip every evolution pass (fix mode)."""
    from team_tpu.data.manager import DataManager
    from team_tpu.learners.factory import get_model

    cfg = _cfg(parity_mode=False, temporal_enabled=False)
    dm = DataManager(cfg.dataset, cfg.shuffle, 3, cfg.init_cls, cfg.increment,
                     **cfg.get("dataset_kwargs", {}))
    learner = get_model("proof", cfg)
    learner.incremental_train(dm)
    # no evolution ran: evolution embeddings never became valid
    assert not bool(np.asarray(learner.buffers.evolution_valid).any())
    assert learner.state_distance.update_history == []


def test_stage_first_replay_respects_memory_budget():
    """Fix-mode stage_first_replay without fixed_memory must still honor the
    TOTAL memory_size budget (old classes' quotas shrink as classes arrive)."""
    from team_tpu.data.manager import DataManager
    from team_tpu.learners.factory import get_model

    cfg = _cfg(parity_mode=False, stage_first_replay=True, memory_size=12,
               fixed_memory=False)
    dm = DataManager(cfg.dataset, cfg.shuffle, 3, cfg.init_cls, cfg.increment,
                     **cfg.get("dataset_kwargs", {}))
    learner = get_model("proof", cfg)
    for _ in range(2):
        learner.incremental_train(dm)
        learner.after_task()
        # budget: samples_per_class * total_classes <= memory_size (+ rounding)
        per_class = learner.samples_per_class
        assert learner.exemplar_size <= per_class * learner._total_classes, (
            learner.exemplar_size, per_class, learner._total_classes)
        assert learner.exemplar_size <= cfg.memory_size


def test_stage_first_replay_budget_with_more_states_than_slots():
    """The overflow case: per-class quota m=1 but every synthetic class has 2
    lifecycle states present. The reference's max(m//n_states, 1) floor would
    store 2 exemplars per class (2x the budget); the fix-mode total-budget
    path must cap the class total at m."""
    from team_tpu.data.manager import DataManager
    from team_tpu.learners.factory import get_model

    cfg = _cfg(parity_mode=False, stage_first_replay=True, memory_size=4,
               fixed_memory=False)
    dm = DataManager(cfg.dataset, cfg.shuffle, 3, cfg.init_cls, cfg.increment,
                     **cfg.get("dataset_kwargs", {}))
    learner = get_model("proof", cfg)
    learner.incremental_train(dm)
    learner.after_task()
    assert learner.samples_per_class == 1
    assert learner.exemplar_size <= cfg.memory_size, learner.exemplar_size
