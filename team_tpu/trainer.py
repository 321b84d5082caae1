"""Task-loop trainer.

Counterpart of reference ``trainer.py:14-167``: seed loop, logging setup,
DataManager init, per-task incremental_train → eval_task → after_task →
state-distance update, top1/top-"5" accuracy curves and running average.

Reference quirk reproduced on purpose: the ``topk=4`` metric is reported under
the name "top5" (reference ``models/base.py:22`` + ``trainer.py:110-117``,
SURVEY.md §5 quirk 5).
"""

from __future__ import annotations

import copy
import logging
import time
from typing import Dict, List

from team_tpu.utils.jax_cache import enable as _enable_xla_cache
_enable_xla_cache()
from team_tpu.config import Config
from team_tpu.data.manager import DataManager
from team_tpu.learners.factory import get_model
from team_tpu.parallel.mesh import describe_devices
from team_tpu.utils.toolkit import count_parameters, set_random, setup_logging


def train(cfg: Config) -> Dict[str, List[float]]:
    """Run the protocol once per seed (reference ``trainer.py:10-14``).

    Returns the LAST seed's metric dict (curves, avg acc — unchanged shape
    for single-seed callers) plus ``"per_seed"``: every seed's full result,
    so multi-seed runs don't silently drop all but the final run."""
    seed_list = copy.deepcopy(cfg.seed)
    if not isinstance(seed_list, (list, tuple)):
        seed_list = [seed_list]
    result: Dict = {}
    per_seed: Dict = {}
    for seed in seed_list:
        run_cfg = copy.deepcopy(cfg)
        run_cfg.seed = [seed]
        result = _train(run_cfg)
        per_seed[int(seed)] = result
    if len(per_seed) > 1:
        result = dict(result)
        result["per_seed"] = per_seed
    return result


def _train(cfg: Config) -> Dict[str, List[float]]:
    logs_name = setup_logging(cfg)
    set_random(cfg.seed[0])
    describe_devices()
    for key, value in cfg.to_dict().items():
        logging.info("%s: %s", key, value)

    data_manager = DataManager(
        cfg.dataset, cfg.shuffle, cfg.seed[0], cfg.init_cls, cfg.increment,
        data_root=cfg.data_root, **cfg.get("dataset_kwargs", {}) or {},
    )
    logging.info("dataset: %s", cfg.dataset)
    logging.info("total classes: %d", data_manager.get_total_classnum())
    logging.info("tasks: %d", data_manager.nb_tasks)

    model = get_model(cfg.model_name, cfg)
    model.save_dir = logs_name

    cnn_curve: Dict[str, List[float]] = {"top1": [], "top5": []}
    nme_curve: Dict[str, List[float]] = {"top1": [], "top5": []}
    checkpointer = None
    if cfg.checkpoint_dir:
        from team_tpu.checkpoint import TaskCheckpointer

        checkpointer = TaskCheckpointer(cfg.checkpoint_dir)
        if cfg.resume:
            restored = checkpointer.restore_latest(model, cnn_curve, nme_curve)
            if restored is not None:
                logging.info("resumed from task %d", restored)

    start_task = model._cur_task + 1
    avg_acc = 0.0
    for task in range(start_task, data_manager.nb_tasks):
        logging.info("=" * 50)
        logging.info("task %d/%d", task + 1, data_manager.nb_tasks)
        if model.__dict__.get("trainable") is not None:
            logging.info("total params: %d", count_parameters(model.trainable))
        start_time = time.time()

        from team_tpu.analysis.profiler import trace
        from team_tpu.utils.phase_timer import phase

        with trace(cfg.profile_dir, name=f"task_{task}"):
            with phase("incremental_train"):
                model.incremental_train(data_manager)
        with phase("eval_task"):
            cnn_accy, nme_accy, zs_seen, zs_unseen, zs_harmonic, zs_total = model.eval_task()
        with phase("after_task"):
            model.after_task()
        if hasattr(model, "update_state_distance_matrix"):
            logging.info("updating state distance matrix...")
            with phase("distance_matrix"):
                model.update_state_distance_matrix(data_manager)

        elapsed = time.time() - start_time
        logging.info("task %d took %.2fs", task + 1, elapsed)
        logging.info("CNN grouped: %s", cnn_accy["grouped"])
        logging.info("zero-shot seen/unseen/harmonic/total: %s/%s/%s/%s",
                     zs_seen, zs_unseen, zs_harmonic, zs_total)

        cnn_curve["top1"].append(cnn_accy["top1"])
        cnn_curve["top5"].append(cnn_accy["top4"])  # top4-as-top5 (quirk 5)
        if nme_accy is not None:
            nme_curve["top1"].append(nme_accy["top1"])
            nme_curve["top5"].append(nme_accy["top4"])

        logging.info("CNN top1 curve: %s", cnn_curve["top1"])
        logging.info("CNN top5 curve: %s", cnn_curve["top5"])
        avg_acc = sum(cnn_curve["top1"]) / len(cnn_curve["top1"])
        logging.info("average accuracy: %.4f", avg_acc)

        if cfg.enable_plots and hasattr(model, "state_distance"):
            try:
                from team_tpu.analysis.plots import visualize_distance_matrix

                visualize_distance_matrix(
                    model.state_distance, f"{logs_name}/task{task}_state_distance.png"
                )
            except Exception as e:
                logging.error("distance-matrix visualization failed: %s", e)

        if checkpointer is not None:
            checkpointer.save(task, model, cnn_curve, nme_curve)

        # machine-readable metrics stream (one JSON object per task)
        import json

        with open(f"{logs_name}/metrics.jsonl", "a", encoding="utf-8") as f:
            f.write(json.dumps({
                "task": task,
                "seconds": round(elapsed, 2),
                "top1": float(cnn_accy["top1"]),
                "top4_as_top5": float(cnn_accy["top4"]),
                "grouped": {k: float(v) for k, v in cnn_accy["grouped"].items()},
                "nme_top1": float(nme_accy["top1"]) if nme_accy else None,
                "zs_seen": float(zs_seen), "zs_unseen": float(zs_unseen),
                "zs_harmonic": float(zs_harmonic), "zs_total": float(zs_total),
                "avg_acc": float(avg_acc),
            }) + "\n")

    logging.info("=" * 50)
    logging.info("final CNN top1 curve: %s", cnn_curve["top1"])
    logging.info("final average accuracy: %.4f", avg_acc)
    return {"cnn_top1": cnn_curve["top1"], "cnn_top5": cnn_curve["top5"],
            "avg_acc": [avg_acc], "nme_top1": nme_curve["top1"]}
