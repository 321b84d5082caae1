"""Config-knob fuzz: arbitrary (seeded) combinations of the fix-mode and
runtime knobs must train end-to-end without crashing and produce finite
metrics. Every knob here is one the reference declares (SURVEY.md §5 config)
or a TPU-native addition; single-knob semantics are covered by
tests/test_fix_mode.py — this guards the CROSS-PRODUCT, where wiring bugs
(a knob assumed default by another path) actually live."""

import numpy as np
import pytest

from team_tpu.config import Config
from team_tpu.trainer import train


def _fuzz_cfg(draw: np.random.Generator, tmp: str) -> Config:
    opt = draw.choice(["sgd", "adam"])
    return Config(
        prefix="fz",
        dataset="synthetic_insects",
        model_name="proof",
        convnet_type="clip",
        init_cls=int(draw.choice([2, 3])),
        increment=2,
        memory_size=int(draw.choice([8, 12])),
        memory_per_class=int(draw.choice([2, 4])),
        fixed_memory=bool(draw.integers(0, 2)),
        tuned_epoch=int(draw.choice([1, 2])),
        batch_size=int(draw.choice([4, 8])),
        optimizer=str(opt),
        init_lr=float(draw.choice([0.01, 0.004])),
        min_lr=0.0,
        lr_scheduler=str(draw.choice(["cosine", "steplr", "constant"])),
        milestones=[1],
        gamma=0.5,
        context_prompt_length_per_task=int(draw.choice([2, 3])),
        seed=[int(draw.integers(0, 100))],
        shuffle=bool(draw.integers(0, 2)),
        parity_mode=False,
        temperature=float(draw.choice([0.05, 0.07])),
        unicl_instance_weight=float(draw.choice([0.5, 1.0])),
        unicl_category_weight=float(draw.choice([0.25, 0.5])),
        unicl_loss_weight=float(draw.choice([0.1, 0.3])),
        temporal_enabled=bool(draw.integers(0, 2)),
        lifecycle_modeling_enabled=bool(draw.integers(0, 2)),
        lifecycle_weight=float(draw.choice([0.1, 0.4])),
        temporal_relation_threshold=float(draw.choice([0.0, 0.2, 0.5])),
        class_lifecycle_consistency=float(draw.choice([0.5, 0.7])),
        temporal_feature_weight=float(draw.choice([0.1, 0.25])),
        state_evolution_steps=int(draw.choice([2, 5])),
        update_state_distance_interval=int(draw.choice([1, 2])),
        state_distance_decay_factor=float(draw.choice([0.7, 0.9])),
        stage_first_replay=bool(draw.integers(0, 2)),
        exemplar_selection_strategy=str(
            draw.choice(["herding", "random", "closest"])),
        global_clip_loss=bool(draw.integers(0, 2)),
        local_loss=bool(draw.integers(0, 2)),
        temporal_gcn_layers=int(draw.choice([1, 2])),
        temporal_gcn_hidden_dim=int(draw.choice([8, 16])),
        log_dir=tmp,
        extras={
            "tiny_backbone": True,
            "dataset_kwargs": {"num_classes": 6, "img_size": 32},
        },
    )


@pytest.mark.parametrize("trial", range(4))
def test_fuzzed_fix_mode_configs_train(trial, tmp_path):
    draw = np.random.default_rng(1000 + trial)
    cfg = _fuzz_cfg(draw, str(tmp_path))
    res = train(cfg)
    # last task may be smaller than `increment` (reference data_manager.py:28-38)
    nb_tasks = 1 + -(-(6 - cfg.init_cls) // cfg.increment)
    assert len(res["cnn_top1"]) == nb_tasks
    for curve in (res["cnn_top1"], res["cnn_top5"], res["nme_top1"]):
        for v in curve:
            assert np.isfinite(v) and 0.0 <= v <= 100.0
