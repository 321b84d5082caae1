"""Shared runner for the golden tiny-protocol regression test: a fully
deterministic 3-task PROOF run (tiny backbone, synthetic nested data, fixed
seeds) whose per-task curves and per-epoch losses are pinned to committed
goldens (round-2 verdict weak #3 / next-round item 9: replace the loose >=12%
floor with tight curves now that full-loop parity pins the semantics)."""

from __future__ import annotations

from team_tpu.config import Config
from team_tpu.data.manager import DataManager
from team_tpu.learners.factory import get_model


def run_golden_protocol():
    cfg = Config(
        prefix="golden", dataset="synthetic_insects", model_name="proof",
        convnet_type="clip", init_cls=2, increment=2, memory_size=12,
        tuned_epoch=2, batch_size=8, init_lr=0.01, optimizer="adam",
        context_prompt_length_per_task=3, seed=[7], shuffle=True,
        log_dir="/tmp/team_golden_logs",
        extras={"tiny_backbone": True,
                "dataset_kwargs": {"num_classes": 6, "img_size": 32}},
    )
    dm = DataManager("synthetic_insects", shuffle=True, seed=7, init_cls=2,
                     increment=2, num_classes=6, img_size=32)
    model = get_model("proof", cfg)
    stats = []
    model._epoch_stats_hook = lambda t, e, d: stats.append(
        [t, e, {k: float(v) for k, v in d.items()}])
    curves = {"top1": [], "top4": [], "nme_top1": []}
    for task in range(dm.nb_tasks):
        model.incremental_train(dm)
        cnn, nme, *_ = model.eval_task()
        model.after_task()
        model.update_state_distance_matrix(dm)
        curves["top1"].append(float(cnn["top1"]))
        curves["top4"].append(float(cnn["top4"]))
        curves["nme_top1"].append(float(nme["top1"]) if nme else None)
    return curves, stats
