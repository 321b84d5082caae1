"""End-to-end incremental training on a tiny synthetic nested dataset with the
tiny CLIP backbone — the integration tier of SURVEY.md §4's test pyramid."""

import numpy as np
import pytest

from team_tpu.config import Config
from team_tpu.data.manager import DataManager
from team_tpu.trainer import train


def tiny_cfg(model_name: str, **kw) -> Config:
    base = dict(
        prefix="t",
        dataset="synthetic_insects",
        model_name=model_name,
        convnet_type="clip",
        init_cls=2,
        increment=2,
        memory_size=12,
        tuned_epoch=2,
        batch_size=8,
        init_lr=0.01,
        optimizer="adam",
        context_prompt_length_per_task=3,
        seed=[1],
        shuffle=True,
        log_dir="/tmp/team_logs",
        extras={"tiny_backbone": True, "dataset_kwargs": {"num_classes": 6, "img_size": 32}},
    )
    base.update(kw)
    cfg = Config(**base)
    return cfg


def test_data_manager_task_split():
    dm = DataManager("synthetic_insects", shuffle=True, seed=1, init_cls=2, increment=2,
                     num_classes=6, img_size=32)
    assert dm.nb_tasks == 3
    assert [dm.get_task_size(t) for t in range(3)] == [2, 2, 2]
    assert dm.get_total_classnum() == 6
    # class order shuffle is seeded & targets remapped to 0..C-1 contiguous
    assert sorted(np.unique(dm._train_targets)) == list(range(6))
    ds = dm.get_multimodal_dataset(np.arange(0, 2), source="train", mode="train")
    assert set(np.unique(ds.labels)) == {0, 1}
    assert len(ds.stages) == len(ds.labels)


def test_zs_clip_end_to_end():
    res = train(tiny_cfg("zs_clip"))
    assert len(res["cnn_top1"]) == 3
    for acc in res["cnn_top1"]:
        assert 0.0 <= acc <= 100.0


def test_simplecil_end_to_end():
    res = train(tiny_cfg("simplecil"))
    assert len(res["cnn_top1"]) == 3
    # prototype classifier on class-coded synthetic images should beat chance
    assert res["cnn_top1"][-1] > 100.0 / 6


def test_proof_end_to_end():
    import jax
    import jax.numpy as jnp

    from team_tpu.data.manager import DataManager
    from team_tpu.learners.factory import get_model

    cfg = tiny_cfg("proof")
    dm = DataManager("synthetic_insects", shuffle=True, seed=1, init_cls=2, increment=2,
                     num_classes=6, img_size=32)
    model = get_model("proof", cfg)
    curves = []
    for task in range(dm.nb_tasks):
        model.incremental_train(dm)
        cnn_accy, nme_accy, *_ = model.eval_task()
        model.after_task()
        model.update_state_distance_matrix(dm)
        curves.append(cnn_accy["top1"])
        assert nme_accy is not None
    assert len(curves) == 3
    for acc in curves:
        assert 0.0 <= acc <= 100.0
    # numerical health: all trained params and buffers stay finite
    for leaf in jax.tree_util.tree_leaves(model.trainable):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    for leaf in jax.tree_util.tree_leaves(tuple(model.buffers)):
        if leaf.dtype.kind == "f":
            assert bool(jnp.all(jnp.isfinite(leaf)))


@pytest.mark.parametrize("fixed", [True])
def test_proof_fixed_memory_per_state(fixed):
    cfg = tiny_cfg("proof", fixed_memory=fixed, memory_per_class=4, tuned_epoch=1)
    res = train(cfg)
    assert len(res["cnn_top1"]) == 3


def test_compute_accuracy_helpers():
    """zs_clip and simplecil expose the reference _compute_accuracy surface."""
    from team_tpu.learners.factory import get_model
    from team_tpu.data.manager import DataManager

    cfg = tiny_cfg("zs_clip")
    dm = DataManager("synthetic_insects", shuffle=True, seed=1, init_cls=2, increment=2,
                     num_classes=6, img_size=32)
    m = get_model("zs_clip", cfg)
    m.incremental_train(dm)
    acc = m._compute_accuracy(m.test_loader)
    assert 0.0 <= acc <= 100.0

    m2 = get_model("simplecil", tiny_cfg("simplecil"))
    m2.incremental_train(dm)
    acc2 = m2._compute_accuracy(m2.test_loader)
    assert 0.0 <= acc2 <= 100.0


def test_profile_dir_writes_trace(tmp_path):
    cfg = tiny_cfg("zs_clip", profile_dir=str(tmp_path / "prof"), init_cls=3, increment=3)
    res = train(cfg)
    assert len(res["cnn_top1"]) == 2
    import os
    assert os.path.isdir(str(tmp_path / "prof"))


def test_full_protocol_ten_tasks():
    """The full IIMinsects-style protocol shape: 20 classes, init 2 + inc 2 ->
    10 tasks, multi-seed loop, metrics stream written."""
    import glob
    import json
    import os

    cfg = tiny_cfg(
        "proof", init_cls=2, increment=2, tuned_epoch=1, memory_size=40, seed=[1, 2],
        extras={"tiny_backbone": True,
                "dataset_kwargs": {"num_classes": 20, "img_size": 32,
                                   "train_per_stage": 3, "test_per_stage": 2}},
    )
    res = train(cfg)
    assert len(res["cnn_top1"]) == 10
    # learning-signal regression floor (round-1 verdict item 10): this config
    # measures ~17.8% avg vs 5% chance; a silent numerics regression that stops
    # the contrastive alignment from learning drops it to chance level.
    avg = float(np.mean(res["cnn_top1"]))
    assert avg >= 12.0, f"10-task avg accuracy {avg} fell below the 12% floor (chance 5%)"
    assert res["cnn_top1"][0] >= 40.0, "first task stopped learning"
    # multi-seed: EVERY seed's result is returned, not just the last run's
    assert set(res["per_seed"]) == {1, 2}
    for seed_res in res["per_seed"].values():
        assert len(seed_res["cnn_top1"]) == 10
    logs = glob.glob("/tmp/team_logs/proof/synthetic_insects/0/2/metrics.jsonl")
    assert logs
    lines = [json.loads(l) for l in open(logs[0])]
    assert len(lines) >= 10
    assert {"task", "top1", "zs_harmonic", "avg_acc"} <= set(lines[-1])


def test_host_shard_indices():
    from team_tpu.parallel.mesh import host_shard_indices

    parts = [host_shard_indices(10, h, 3) for h in range(3)]
    merged = np.sort(np.concatenate(parts))
    np.testing.assert_array_equal(merged, np.arange(10))
    assert abs(len(parts[0]) - len(parts[2])) <= 1


def test_proof_fix_mode_honors_config_knobs():
    """parity_mode=False honors the reference's dead config keys: config
    temperature/unicl weights are used and CE actually carries gradients."""
    cfg = tiny_cfg("proof", parity_mode=False, temperature=0.05,
                   unicl_instance_weight=0.6, unicl_category_weight=0.4,
                   temporal_gcn_layers=3, tuned_epoch=2)
    res = train(cfg)
    assert len(res["cnn_top1"]) == 3
    for acc in res["cnn_top1"]:
        assert 0.0 <= acc <= 100.0
