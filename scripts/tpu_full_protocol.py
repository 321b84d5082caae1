"""Full IIMinsects-protocol-shaped run at production scale on TPU:
20 classes, init 2 + increment 2 -> 10 tasks, 20 epochs/task, ViT-B/16 bf16."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from team_tpu.config import Config
from team_tpu.trainer import train


def main():
    cfg = Config(
        prefix="tpu_full", dataset="synthetic_insects", model_name="proof",
        convnet_type="clip", init_cls=2, increment=2, memory_size=120,
        tuned_epoch=20, batch_size=16, init_lr=0.004, optimizer="adam",
        context_prompt_length_per_task=10, seed=[42], shuffle=True,
        compute_dtype="bfloat16", log_dir="/tmp/team_tpu_full_logs",
        encoder_quant=os.environ.get("TEAM_ENCODER_QUANT", "bf16"),
        extras={"dataset_kwargs": {"num_classes": 20, "img_size": 224,
                                   "train_per_stage": 16, "test_per_stage": 4},
                # patch-major uint8 ingest (round 4): loaders ship the ViT
                # patch-pixel layout, the device does zero spatial reorder
                "patch_major_io": os.environ.get("TEAM_PATCH_MAJOR", "1") == "1"},
    )
    t0 = time.time()
    res = train(cfg)
    print(f"full protocol done in {time.time() - t0:.1f}s")
    print("top1 curve:", res["cnn_top1"])
    avg = float(np.mean(res["avg_acc"]))  # one entry per seed
    print("avg:", avg)
    # learning-signal regression floor (round-1 verdict item 10): this config
    # measures ~27% avg incremental accuracy vs 5% chance (docs/BENCH.md); a
    # silent numerics regression must turn this run red.
    assert avg >= 20.0, f"avg accuracy {avg} fell below the 20% floor (chance 5%)"
    print("regression floor (>=20% avg) OK")


if __name__ == "__main__":
    main()
