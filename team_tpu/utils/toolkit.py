"""Metric and utility helpers.

TPU-native counterpart of reference ``utils/toolkit.py`` (accuracy, parameter
counting) with the same reported quantities: total / per-group / old / new /
harmonic accuracy (reference ``utils/toolkit.py:32-53``).
"""

from __future__ import annotations

import logging
import os
import random
import sys
from datetime import datetime
from typing import Any, Dict

import jax
import numpy as np


def accuracy(y_pred: np.ndarray, y_true: np.ndarray, nb_old: int, increment: int = 10) -> Dict[str, float]:
    """Grouped CIL accuracy (reference ``utils/toolkit.py:32-53``).

    ``y_pred``/``y_true`` are 1-D int arrays; returns percentages rounded to 2
    decimals with per-``increment``-class-group splits and old/new/harmonic means.
    """
    y_pred = np.asarray(y_pred)
    y_true = np.asarray(y_true)
    assert len(y_pred) == len(y_true), "Data length error."
    all_acc: Dict[str, float] = {}
    all_acc["total"] = np.around((y_pred == y_true).sum() * 100 / len(y_true), decimals=2)

    for class_id in range(0, int(np.max(y_true)), increment):
        idxes = np.where(np.logical_and(y_true >= class_id, y_true < class_id + increment))[0]
        label = "{}-{}".format(str(class_id).rjust(2, "0"), str(class_id + increment - 1).rjust(2, "0"))
        all_acc[label] = np.around((y_pred[idxes] == y_true[idxes]).sum() * 100 / len(idxes), decimals=2)

    idxes = np.where(y_true < nb_old)[0]
    all_acc["old"] = (
        0 if len(idxes) == 0
        else np.around((y_pred[idxes] == y_true[idxes]).sum() * 100 / len(idxes), decimals=2)
    )
    idxes = np.where(y_true >= nb_old)[0]
    all_acc["new"] = (
        0 if len(idxes) == 0
        else np.around((y_pred[idxes] == y_true[idxes]).sum() * 100 / len(idxes), decimals=2)
    )
    denom = all_acc["old"] + all_acc["new"]
    all_acc["harmonic"] = (
        0.0 if denom == 0 else np.around(2 * all_acc["old"] * all_acc["new"] / denom, decimals=2)
    )
    return all_acc


def topk_accuracy(topk_pred: np.ndarray, y_true: np.ndarray) -> float:
    """Top-k accuracy from a ``[N, k]`` prediction matrix (reference ``models/base.py:79-88``)."""
    correct = sum(1 for i in range(len(y_true)) if y_true[i] in topk_pred[i])
    return float(np.around(correct * 100.0 / len(y_true), decimals=2))


def count_parameters(params: Any, trainable_mask: Any = None) -> int:
    """Count leaves' elements in a pytree; with ``trainable_mask`` (same-structure
    pytree of bools) count only trainable ones (reference ``utils/toolkit.py:7-10``)."""
    if trainable_mask is None:
        return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    total = 0
    for leaf, m in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(trainable_mask)):
        if m:
            total += int(np.prod(leaf.shape))
    return total


def tensor2numpy(x) -> np.ndarray:
    """Any array-ish (jax/numpy/list) -> numpy (reference ``utils/toolkit.py:13-18``)."""
    return np.asarray(x)


def target2onehot(targets, n_classes: int) -> np.ndarray:
    """Int targets -> one-hot matrix (reference ``utils/toolkit.py:21-24``)."""
    targets = np.asarray(targets)
    onehot = np.zeros((targets.shape[0], n_classes), dtype=np.float32)
    onehot[np.arange(targets.shape[0]), targets.astype(int)] = 1.0
    return onehot


def split_images_labels(imgs):
    """Split an ImageFolder-style (path, label) list (reference ``:56-64``)."""
    images = [item[0] for item in imgs]
    labels = [item[1] for item in imgs]
    return np.array(images), np.array(labels)


def set_random(seed: int = 1) -> None:
    """Seed host-side RNGs (reference ``trainer.py:156-162``). Device randomness in
    JAX is explicit via PRNG keys, so this only covers numpy/python host code."""
    np.random.seed(seed)
    random.seed(seed)


def setup_logging(cfg) -> str:
    """Timestamped file+stdout logging (reference ``trainer.py:27-47``)."""
    init_cls = 0 if cfg.init_cls == cfg.increment else cfg.init_cls
    logs_name = os.path.join(cfg.log_dir, cfg.model_name, cfg.dataset, str(init_cls), str(cfg.increment))
    os.makedirs(logs_name, exist_ok=True)
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    seed = cfg.seed[0] if isinstance(cfg.seed, (list, tuple)) else cfg.seed
    logfilename = os.path.join(
        logs_name, "{}_{}_{}_{}".format(cfg.prefix, seed, cfg.convnet_type, timestamp)
    )
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s [%(filename)s] => %(message)s",
        handlers=[
            logging.FileHandler(filename=logfilename + ".log"),
            logging.StreamHandler(sys.stdout),
        ],
    )
    return logs_name
