"""Production ingest validation on the REAL chip with REAL image files.

Generates an IIMinsects202-layout JPEG dataset on disk, then runs one PROOF
task at production shape (ViT-B/16 bf16) with the full native ingest stack:
C++ decode+resize to uint8 (team_io_load_batch_u8), /255+CLIP-normalize fused
on device, run-wide feature cache, packed attention. Asserts the native-u8
loader path was actually taken and that features match the PIL/host pipeline.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from team_tpu.utils.jax_cache import enable as _enable
_enable()

import numpy as np
from PIL import Image


def make_dataset(root: str, classes: int = 4, per_stage: int = 8) -> None:
    rng = np.random.default_rng(0)
    for split, n in (("train", per_stage), ("test", max(2, per_stage // 2))):
        for c in range(classes):
            for stage in ((1, 4) if c % 2 == 0 else (3, 4)):
                d = os.path.join(root, split, f"species_{c}", str(stage))
                os.makedirs(d, exist_ok=True)
                base = rng.integers(0, 200, size=3)
                for i in range(n):
                    arr = np.clip(base[None, None, :] + 10 * stage
                                  + rng.normal(0, 25, size=(300, 260, 3)),
                                  0, 255).astype(np.uint8)
                    Image.fromarray(arr).save(os.path.join(d, f"img_{i}.jpg"),
                                              quality=92)


def main():
    import tempfile

    root = tempfile.mkdtemp(prefix="team_native_ingest_")
    make_dataset(root)

    from team_tpu.config import Config
    from team_tpu.data import native_io
    from team_tpu.data.loader import ArrayLoader
    from team_tpu.data.manager import DataManager
    from team_tpu.trainer import train

    assert native_io.available(), "native team_io must build on this machine"

    # loader-level check: the u8 native path triggers and matches PIL+device
    dm = DataManager("iiminsects202", shuffle=False, seed=0, init_cls=2,
                     increment=2, data_root=root)
    ds = dm.get_multimodal_dataset(np.arange(0, 2), source="test", mode="test")
    nat = ArrayLoader(ds, batch_size=8, image_size=224, use_native=True,
                      device_normalize=True, prefetch=0)
    assert nat._native and nat._device_normalize
    b_nat = next(iter(nat))
    assert b_nat["image"].dtype == np.uint8, "native u8 path not taken"
    pil = ArrayLoader(ds, batch_size=8, image_size=224, prefetch=0)
    b_pil = next(iter(pil))
    import jax.numpy as jnp

    from team_tpu.ops.preprocess import preprocess_batch

    dev = np.asarray(preprocess_batch(jnp.asarray(b_nat["image"]), 224))
    # native bicubic taps differ slightly from PIL's adaptive downscale filter
    diff = np.abs(dev - b_pil["image"]).mean()
    print(f"[ingest] native-u8+device-normalize vs PIL host: mean |diff| = {diff:.4f}")
    assert diff < 0.1, "native ingest diverged from the PIL pipeline"

    cfg = Config(
        prefix="native_ingest", dataset="iiminsects202", model_name="proof",
        convnet_type="clip", init_cls=2, increment=2, memory_size=16,
        tuned_epoch=2, batch_size=16, init_lr=0.004, optimizer="adam",
        context_prompt_length_per_task=10, seed=[42], shuffle=True,
        compute_dtype="bfloat16", data_root=root,
        log_dir="/tmp/team_native_ingest_logs",
        extras={"use_native_io": True},
    )
    t0 = time.time()
    res = train(cfg)
    print(f"[ingest] 2-task production-shape run with native u8 ingest: "
          f"{time.time() - t0:.1f}s, curves {res['cnn_top1']}")
    print("[ingest] OK")


if __name__ == "__main__":
    main()
