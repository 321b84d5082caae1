"""Real-scale TPU smoke: full ViT-B/16 PROOF/TEAM training on synthetic data.

Runs the complete incremental pipeline (backbone feature extraction, projection
training with the epoch-scan runner, temporal evolution, herding memory, all
evals) at production shapes on the actual chip. Synthetic data (no dataset
download needed); random backbone init (no egress).

Usage: python scripts/tpu_smoke.py
"""

import sys
import time

sys.path.insert(0, ".")

from team_tpu.config import Config  # noqa: E402
from team_tpu.trainer import train  # noqa: E402


def main():
    cfg = Config(
        prefix="tpu_smoke",
        dataset="synthetic_insects",
        model_name="proof",
        convnet_type="clip",
        init_cls=2,
        increment=2,
        memory_size=24,
        tuned_epoch=2,
        batch_size=16,
        init_lr=0.004,
        optimizer="adam",
        context_prompt_length_per_task=10,
        seed=[42],
        shuffle=True,
        compute_dtype="bfloat16",
        log_dir="/tmp/team_tpu_smoke_logs",
        extras={"dataset_kwargs": {"num_classes": 4, "img_size": 224,
                                   "train_per_stage": 32, "test_per_stage": 8}},
    )
    t0 = time.time()
    res = train(cfg)
    print(f"TPU smoke done in {time.time() - t0:.1f}s")
    print("top1 curve:", res["cnn_top1"], "avg:", res["avg_acc"])


if __name__ == "__main__":
    main()
