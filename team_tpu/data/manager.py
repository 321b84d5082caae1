"""Incremental task DataManager.

Counterpart of reference ``utils/data_manager.py:12-234``: loads class-name and
prompt-template assets, splits classes into incremental tasks, applies the seeded
class-order shuffle + target remap, and serves per-task (multimodal) datasets.

TPU-native deltas:
* datasets are lightweight descriptors (paths/arrays + stage ids + transform
  mode); batching/decoding happens in :class:`team_tpu.data.loader.ArrayLoader`;
* stage ids travel WITH the samples (including rehearsal appendents) instead of
  being re-derived through path/basename lookup tables (reference
  ``data_manager.py:488-567``) — identical results for path-backed datasets,
  and correct (rather than default-adult) for array-backed ones.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from team_tpu.data.datasets import get_idata

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets")


class TeamDataset:
    """A split of samples + transform mode. ``images`` is an object array of
    paths (``use_path``) or a uint8 array stack."""

    def __init__(self, images, labels, stages, mode: str, use_path: bool,
                 deterministic_train: bool = True, multimodal: bool = False):
        assert len(images) == len(labels) == len(stages), "Data size error!"
        self.images = images
        self.labels = np.asarray(labels)
        self.stages = np.asarray(stages)
        self.mode = mode
        self.use_path = use_path
        self.deterministic_train = deterministic_train
        self.multimodal = multimodal

    def __len__(self):
        return len(self.labels)


class DataManager:
    def __init__(self, dataset_name: str, shuffle: bool, seed: int, init_cls: int,
                 increment: int, data_root: Optional[str] = None, **dataset_kwargs):
        self.dataset_name = dataset_name
        self.idata = get_idata(dataset_name, data_root, **dataset_kwargs)
        self._load_assets(dataset_name)
        self._setup_data(shuffle, seed)

        # task split (reference ``data_manager.py:28-38``)
        if init_cls > len(self._class_order):
            logging.warning("No enough classes.")
            self._increments = [len(self._class_order)]
        else:
            self._increments = [init_cls]
        while sum(self._increments) + increment < len(self._class_order):
            self._increments.append(increment)
        offset = len(self._class_order) - sum(self._increments)
        if offset > 0:
            self._increments.append(offset)
        logging.info("Training class stages: %s", self._increments)

    # ------------------------------------------------------------------
    def _load_assets(self, dataset_name: str) -> None:
        with open(os.path.join(_ASSET_DIR, "labels.json"), "r", encoding="utf-8") as f:
            labels = json.load(f).get(dataset_name)
        with open(os.path.join(_ASSET_DIR, "templates.json"), "r", encoding="utf-8") as f:
            tmpl = json.load(f)
        self._data_to_prompt = tmpl.get(dataset_name, ["a photo of {}"])
        self._state_templates = tmpl.get("states", {})
        self._class_to_label = labels  # may be None for synthetic; filled in _setup_data

    def _setup_data(self, shuffle: bool, seed: int) -> None:
        self.idata.download_data()
        self._train_data, self._train_targets = self.idata.train_data, self.idata.train_targets
        self._test_data, self._test_targets = self.idata.test_data, self.idata.test_targets
        self._train_stages = getattr(self.idata, "train_stages", np.full(len(self._train_targets), 4))
        self._test_stages = getattr(self.idata, "test_stages", np.full(len(self._test_targets), 4))
        self.use_path = self.idata.use_path

        num_classes = len(np.unique(self._train_targets))
        if self._class_to_label is None:
            self._class_to_label = [f"insect species {i}" for i in range(num_classes)]

        order = list(range(num_classes))
        if shuffle:
            np.random.seed(seed)
            order = np.random.permutation(len(order)).tolist()
        elif self.idata.class_order and len(self.idata.class_order) == num_classes:
            order = self.idata.class_order
        self._class_order = order
        logging.info("class order: %s", self._class_order)

        self._train_targets = _map_new_class_index(self._train_targets, self._class_order)
        self._test_targets = _map_new_class_index(self._test_targets, self._class_order)
        self._class_to_label = [self._class_to_label[i] for i in self._class_order]

    # ------------------------------------------------------------------
    @property
    def nb_tasks(self) -> int:
        return len(self._increments)

    def get_task_size(self, task: int) -> int:
        return self._increments[task]

    def get_total_classnum(self) -> int:
        return len(self._class_order)

    def getlen(self, index: int) -> int:
        return int(np.sum(self._train_targets == index))

    # ------------------------------------------------------------------
    def _split(self, source: str):
        if source == "train":
            return self._train_data, self._train_targets, self._train_stages
        if source == "test":
            return self._test_data, self._test_targets, self._test_stages
        raise ValueError(f"Unknown data source {source}.")

    def get_dataset(self, indices: Sequence[int], source: str, mode: str,
                    appendent: Optional[Tuple] = None, ret_data: bool = False,
                    m_rate: Optional[float] = None, multimodal: bool = False):
        if mode not in ("train", "test", "flip"):
            raise ValueError(f"Unknown mode {mode}.")
        x, y, s = self._split(source)
        data, targets, stages = [], [], []
        for idx in indices:
            if m_rate is None:
                cd, ct, cs = _select(x, y, s, idx, idx + 1)
            else:
                cd, ct, cs = _select_rmm(x, y, s, idx, idx + 1, m_rate)
            data.append(cd)
            targets.append(ct)
            stages.append(cs)

        if appendent is not None and len(appendent) != 0:
            if len(appendent) == 3:
                ad, at, ast = appendent
            else:
                ad, at = appendent
                ast = self._lookup_stages(ad)
            data.append(np.asarray(ad))
            targets.append(np.asarray(at))
            stages.append(np.asarray(ast))

        data = np.concatenate(data) if data else np.array([])
        targets = np.concatenate(targets) if targets else np.array([], dtype=np.int64)
        stages = np.concatenate(stages) if stages else np.array([], dtype=np.int64)

        ds = TeamDataset(data, targets, stages, mode, self.use_path,
                         getattr(self.idata, "deterministic_train", True), multimodal)
        if ret_data:
            return data, targets, ds
        return ds

    def get_multimodal_dataset(self, indices, source, mode, appendent=None, ret_data=False):
        """Stage-id-carrying dataset (reference ``get_multimodal_dataset``,
        ``data_manager.py:210-217`` + ``InsectsMultiModalDataset``)."""
        return self.get_dataset(indices, source, mode, appendent=appendent,
                                ret_data=ret_data, multimodal=True)

    def get_dataset_with_split(self, indices, source, mode, appendent=None,
                               val_samples_per_class: int = 0):
        """Train/val split variant (reference ``data_manager.py:101-141``)."""
        x, y, s = self._split(source)
        tr_d, tr_t, tr_s, va_d, va_t, va_s = [], [], [], [], [], []
        for idx in indices:
            cd, ct, cs = _select(x, y, s, idx, idx + 1)
            val_idx = np.random.choice(len(cd), val_samples_per_class, replace=False)
            train_idx = sorted(set(range(len(cd))) - set(val_idx.tolist()))
            va_d.append(cd[val_idx]); va_t.append(ct[val_idx]); va_s.append(cs[val_idx])
            tr_d.append(cd[train_idx]); tr_t.append(ct[train_idx]); tr_s.append(cs[train_idx])
        if appendent is not None:
            ad, at = appendent[0], appendent[1]
            ast = appendent[2] if len(appendent) == 3 else self._lookup_stages(ad)
            ad, at, ast = np.asarray(ad), np.asarray(at), np.asarray(ast)
            for idx in range(0, int(np.max(at)) + 1):
                mask = np.where((at >= idx) & (at < idx + 1))[0]
                cd, ct, cs = ad[mask], at[mask], ast[mask]
                val_idx = np.random.choice(len(cd), val_samples_per_class, replace=False)
                train_idx = sorted(set(range(len(cd))) - set(val_idx.tolist()))
                va_d.append(cd[val_idx]); va_t.append(ct[val_idx]); va_s.append(cs[val_idx])
                tr_d.append(cd[train_idx]); tr_t.append(ct[train_idx]); tr_s.append(cs[train_idx])
        det = getattr(self.idata, "deterministic_train", True)
        train = TeamDataset(np.concatenate(tr_d), np.concatenate(tr_t), np.concatenate(tr_s),
                            mode, self.use_path, det)
        val = TeamDataset(np.concatenate(va_d), np.concatenate(va_t), np.concatenate(va_s),
                          mode, self.use_path, det)
        return train, val

    # ------------------------------------------------------------------
    def _lookup_stages(self, data) -> np.ndarray:
        """Recover stage ids for appendent samples without explicit stages.
        Path-backed: index into the loaded stage arrays via path match (the
        reference's map-based recovery); otherwise default to adult (4)."""
        data = np.asarray(data)
        if not self.use_path:
            return np.full(len(data), 4)
        path_to_stage = {}
        for p, st in zip(self._train_data, self._train_stages):
            path_to_stage[os.path.normpath(str(p)).replace("\\", "/").lower()] = int(st)
        for p, st in zip(self._test_data, self._test_stages):
            path_to_stage.setdefault(os.path.normpath(str(p)).replace("\\", "/").lower(), int(st))
        return np.asarray([
            path_to_stage.get(os.path.normpath(str(p)).replace("\\", "/").lower(), 4) for p in data
        ])

    def get_stage_prompt(self, class_idx: int, stage_id: int) -> str:
        """Stage-aware prompt (reference ``data_manager.py:219-234``)."""
        class_name = self._class_to_label[class_idx]
        stage_name = self.idata.get_stage_description(stage_id)
        template = np.random.choice(self._data_to_prompt)
        return template.replace("{类别}", class_name).replace("{虫态}", stage_name).format(class_name)


def _map_new_class_index(y, order) -> np.ndarray:
    return np.array(list(map(lambda x: order.index(x), y)))


def _select(x, y, s, low, high):
    x = np.asarray(x)
    idx = np.where((y >= low) & (y < high))[0]
    return x[idx], y[idx], s[idx]


def _select_rmm(x, y, s, low, high, m_rate):
    assert m_rate is not None
    x = np.asarray(x)
    if m_rate != 0:
        idx = np.where((y >= low) & (y < high))[0]
        sel = np.random.randint(0, len(idx), size=int((1 - m_rate) * len(idx)))
        new_idx = np.sort(idx[sel])
    else:
        new_idx = np.where((y >= low) & (y < high))[0]
    return x[new_idx], y[new_idx], s[new_idx]
