"""Dataset registry.

Counterpart of the reference ``iData`` hierarchy (``utils/data.py:7-613``) with
the hardcoded absolute roots (``:493-494``, a Windows path!) replaced by a
``data_root`` config / ``TEAM_DATA_ROOT`` env var.

Supported:
* ``iiminsects202`` — the 3-level ``class/stage_id/images`` nested layout
  (reference ``utils/data.py:473-610``) with per-image stage ids.
* ``synthetic_insects`` — an in-memory generated nested dataset for tests and
  benches (no disk/network), same structure and stage semantics.
* ``cifar224`` — array-backed CIFAR-100 at 224 px when a local copy exists.
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

STAGE_DESCRIPTIONS = {1: "larva", 2: "pupa", 3: "nymph", 4: "adult", 5: "egg"}


class iData:
    use_path = False
    deterministic_train = True  # IIMinsects202 uses the CLIP pipeline for train too
    class_order: Optional[List[int]] = None
    _data_loaded = False

    def download_data(self):  # pragma: no cover - interface
        raise NotImplementedError

    def get_stage_description(self, stage_id: int) -> str:
        return STAGE_DESCRIPTIONS.get(int(stage_id), "unknown")


class IIMinsects202(iData):
    """20-class insect dataset, ``train|test/class/stage_id/*.jpg`` layout."""

    use_path = True
    class_order = list(range(20))

    def __init__(self, data_root: Optional[str] = None):
        self.data_root = data_root or os.environ.get("TEAM_DATA_ROOT", "./data/IIMinsects202")

    def download_data(self):
        if self._data_loaded:
            return
        train_dir = os.path.join(self.data_root, "train")
        test_dir = os.path.join(self.data_root, "test")
        self.train_data, self.train_targets, class_map, self.train_stages = load_nested_dataset(train_dir)
        self.test_data, self.test_targets, _, self.test_stages = load_nested_dataset(test_dir, class_map=class_map)
        self.class_map = class_map
        self.inverse_class_map = {v: k for k, v in class_map.items()}
        self._data_loaded = True
        logging.info(
            "IIMinsects202: %d train / %d test images, %d classes",
            len(self.train_data), len(self.test_data), len(class_map),
        )


def load_nested_dataset(root_dir: str, class_map: Optional[Dict[str, int]] = None
                        ) -> Tuple[List[str], np.ndarray, Dict[str, int], np.ndarray]:
    """Walk the ``class/stage_id/images`` tree (reference ``utils/data.py:545-598``)."""
    images: List[str] = []
    targets: List[int] = []
    stages: List[int] = []
    if class_map is None:
        class_map = {}
    for class_folder in sorted(os.listdir(root_dir)):
        class_path = os.path.join(root_dir, class_folder)
        if not os.path.isdir(class_path) or class_folder.startswith("."):
            continue
        if class_folder not in class_map:
            class_map[class_folder] = len(class_map)
        label = class_map[class_folder]
        stage_folders = sorted(
            os.listdir(class_path), key=lambda x: int(x) if x.isdigit() else float("inf")
        )
        for stage_folder in stage_folders:
            stage_path = os.path.join(class_path, stage_folder)
            if not os.path.isdir(stage_path) or stage_folder.startswith("."):
                continue
            if not stage_folder.isdigit():
                logging.warning("skipping non-numeric stage folder: %s", stage_folder)
                continue
            stage_id = int(stage_folder)
            for ext in ("*.jpg", "*.jpeg", "*.png", "*.bmp"):
                for img_path in sorted(glob.glob(os.path.join(stage_path, ext))):
                    if os.path.isfile(img_path) and not os.path.basename(img_path).startswith("."):
                        images.append(img_path)
                        targets.append(label)
                        stages.append(stage_id)
    return images, np.asarray(targets), class_map, np.asarray(stages)


class SyntheticInsects(iData):
    """In-memory nested synthetic dataset mirroring IIMinsects202 semantics.

    Images are class/stage-coded uint8 arrays so prototype math has real signal:
    each (class, stage) gets a distinct mean color + structured noise.
    """

    use_path = False

    def __init__(self, num_classes: int = 6, stages_per_class=(1, 4), img_size: int = 32,
                 train_per_stage: int = 6, test_per_stage: int = 3, seed: int = 0):
        self.num_classes = num_classes
        self.stages_per_class = list(stages_per_class)
        self.img_size = img_size
        self.train_per_stage = train_per_stage
        self.test_per_stage = test_per_stage
        self.seed = seed
        self.class_order = list(range(num_classes))

    def _gen_split(self, rng, per_stage):
        data, targets, stages = [], [], []
        for c in range(self.num_classes):
            # vary the lifecycle: even classes larva->adult, odd nymph->adult
            cls_stages = [1, 4] if c % 2 == 0 else [3, 4]
            if self.stages_per_class != [1, 4]:
                cls_stages = self.stages_per_class
            for s in cls_stages:
                base = rng.integers(0, 200, size=3)
                for _ in range(per_stage):
                    img = np.clip(
                        base[None, None, :]
                        + 10 * s
                        + rng.normal(0, 25, size=(self.img_size, self.img_size, 3)),
                        0, 255,
                    ).astype(np.uint8)
                    data.append(img)
                    targets.append(c)
                    stages.append(s)
        return np.stack(data), np.asarray(targets), np.asarray(stages)

    def download_data(self):
        if self._data_loaded:
            return
        rng = np.random.default_rng(self.seed)
        self.train_data, self.train_targets, self.train_stages = self._gen_split(rng, self.train_per_stage)
        self.test_data, self.test_targets, self.test_stages = self._gen_split(rng, self.test_per_stage)
        self._data_loaded = True


class iCIFAR224(iData):
    """CIFAR-100 rendered at 224 px (reference ``utils/data.py:104-...``); array-backed."""

    use_path = False
    deterministic_train = True
    class_order = list(range(100))

    def __init__(self, data_root: Optional[str] = None):
        self.data_root = data_root or os.environ.get("TEAM_DATA_ROOT", "./data/cifar100")

    def download_data(self):
        if self._data_loaded:
            return
        import pickle

        def _load(split):
            with open(os.path.join(self.data_root, split), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            data = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
            return data, np.asarray(d[b"fine_labels"])

        self.train_data, self.train_targets = _load("train")
        self.test_data, self.test_targets = _load("test")
        self.train_stages = np.full(len(self.train_targets), 4)
        self.test_stages = np.full(len(self.test_targets), 4)
        self._data_loaded = True


class iCIFAR(iData):
    """Array-backed CIFAR-10/100 from local pickle batches (reference
    ``utils/data.py:14-67``; their 32-px random-crop/color-jitter pipelines feed
    the reference's image-only registry, unused by the CLIP learners — kept for
    registry completeness)."""

    use_path = False

    def __init__(self, data_root: Optional[str] = None, fine: bool = True):
        self.fine = fine
        name = "cifar100" if fine else "cifar10"
        self.data_root = data_root or os.environ.get("TEAM_DATA_ROOT", f"./data/{name}")

    def download_data(self):
        if self._data_loaded:
            return
        import pickle

        label_key = b"fine_labels" if self.fine else b"labels"

        def _load(split):
            with open(os.path.join(self.data_root, split), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            data = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
            return data, np.asarray(d[label_key])

        self.train_data, self.train_targets = _load("train")
        self.test_data, self.test_targets = _load("test")
        self.train_stages = np.full(len(self.train_targets), 4)
        self.test_stages = np.full(len(self.test_targets), 4)
        self.class_order = list(range(100 if self.fine else 10))
        self._data_loaded = True


class ImageFolderDataset(iData):
    """Generic ``root/{train,test}/class_x/*.jpg`` dataset covering the
    reference's ImageFolder-backed registry entries (imagenet-r/a, cub,
    objectnet, food101, flowers, aircraft, ucf101, cars, sun, omnibenchmark,
    vtab, caltech101 — reference ``utils/data.py:104-470``). Stage ids default
    to adult (4), matching the reference multimodal fallback."""

    use_path = True

    def __init__(self, data_root: Optional[str] = None, name: str = "imagefolder",
                 deterministic_train: bool = True, train_dir: str = "train",
                 test_dir: str = "test"):
        self.name = name
        self.data_root = data_root or os.environ.get("TEAM_DATA_ROOT", f"./data/{name}")
        self.deterministic_train = deterministic_train
        self.train_dir = train_dir
        self.test_dir = test_dir

    @staticmethod
    def _walk(split_dir: str, class_map: Dict[str, int]):
        images, targets = [], []
        for class_folder in sorted(os.listdir(split_dir)):
            class_path = os.path.join(split_dir, class_folder)
            if not os.path.isdir(class_path) or class_folder.startswith("."):
                continue
            if class_folder not in class_map:
                class_map[class_folder] = len(class_map)
            label = class_map[class_folder]
            for ext in ("*.jpg", "*.jpeg", "*.png", "*.bmp", "*.JPEG"):
                for p in sorted(glob.glob(os.path.join(class_path, ext))):
                    images.append(p)
                    targets.append(label)
        return images, np.asarray(targets)

    def download_data(self):
        if self._data_loaded:
            return
        class_map: Dict[str, int] = {}
        self.train_data, self.train_targets = self._walk(
            os.path.join(self.data_root, self.train_dir), class_map)
        self.test_data, self.test_targets = self._walk(
            os.path.join(self.data_root, self.test_dir), class_map)
        self.train_stages = np.full(len(self.train_targets), 4)
        self.test_stages = np.full(len(self.test_targets), 4)
        self.class_map = class_map
        self.class_order = list(range(len(class_map)))
        self._data_loaded = True
        logging.info("%s: %d train / %d test, %d classes", self.name,
                     len(self.train_data), len(self.test_data), len(class_map))


# reference registry names served by the generic folder dataset
# (reference utils/data.py:104-470 — per-name transform variants collapse onto
# the deterministic CLIP pipeline or the ViT random-crop pipeline)
_FOLDER_DATASETS = {
    # imagenet1000/100 use the reference's train/val split layout and the
    # torchvision random-resized-crop train pipeline (utils/data.py:122-180)
    "imagenet1000": dict(deterministic_train=False, test_dir="val"),
    "imagenet100": dict(deterministic_train=False, test_dir="val"),
    "imagenetr": dict(deterministic_train=False),
    "imageneta": dict(deterministic_train=False),
    "cub": dict(deterministic_train=False),
    "objectnet": dict(deterministic_train=False),
    "omnibenchmark": dict(deterministic_train=False),
    "vtab": dict(deterministic_train=False),
    "caltech101": dict(deterministic_train=True),
    "food101": dict(deterministic_train=True),
    "flowers": dict(deterministic_train=True),
    "aircraft": dict(deterministic_train=True),
    "ucf101": dict(deterministic_train=True),
    "cars": dict(deterministic_train=True),
    "sun": dict(deterministic_train=True),
}


class LaionData:
    """Image+caption pair dataset from a ``path caption_file`` text list
    (reference ``utils/data_manager.py:366-389``, imported by learners but never
    used there; provided for the contrastive-pretraining capability surface).

    ``__getitem__`` returns ``(image_path, caption_string)``; decoding and the
    CLIP preprocess happen in the loader / native IO runtime.
    """

    def __init__(self, txt_path: str):
        with open(txt_path, "r", encoding="utf-8") as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        self.img_list = [ln.split()[0] for ln in lines]
        self.txt_list = [ln.split()[1] for ln in lines]

    def __len__(self) -> int:
        return len(self.img_list)

    def __getitem__(self, index: int):
        with open(self.txt_list[index], "r", encoding="utf-8") as f:
            caption = f.read().strip()
        return self.img_list[index], caption


_REGISTRY = {}


def get_idata(name: str, data_root: Optional[str] = None, **kwargs) -> iData:
    """Dataset factory with per-name instance caching (the reference reuses a
    loaded instance via its ``_data_loaded`` flag, ``data_manager.py:146-151``)."""
    key = (name.lower(), data_root, tuple(sorted((k, repr(v)) for k, v in kwargs.items())))
    if key in _REGISTRY:
        return _REGISTRY[key]
    n = name.lower()
    if n == "iiminsects202":
        ds = IIMinsects202(data_root)
    elif n == "synthetic_insects":
        ds = SyntheticInsects(**kwargs)
    elif n == "cifar224":
        ds = iCIFAR224(data_root)
    elif n == "cifar100":
        ds = iCIFAR(data_root, fine=True)
    elif n == "cifar10":
        ds = iCIFAR(data_root, fine=False)
    elif n in _FOLDER_DATASETS:
        ds = ImageFolderDataset(data_root, name=n, **_FOLDER_DATASETS[n])
    elif n == "imagefolder":
        ds = ImageFolderDataset(data_root, **kwargs)
    else:
        raise NotImplementedError(f"Unknown dataset {name}.")
    _REGISTRY[key] = ds
    return ds
