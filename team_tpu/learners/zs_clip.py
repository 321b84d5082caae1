"""Zero-shot CLIP learner.

Counterpart of reference ``models/zs_clip.py:20-163``: no training at all; the
incremental loop only widens the set of known classes. Evaluation builds
template-ensembled per-class text features (normalized mean over all prompt
templates, re-normalized) and scores ``imageᵀ·text``.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.config import Config
from team_tpu.learners.backbone_runtime import BackboneRuntime
from team_tpu.learners.base import BaseLearner


class Learner(BaseLearner):
    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.backbone = BackboneRuntime(cfg)
        self.image_size = self.backbone.clip_cfg.vision.image_size

    @property
    def feature_dim(self) -> int:
        return self.backbone.out_dim

    # -- base hooks -----------------------------------------------------
    def encode_image(self, images):
        return self.backbone.encode_image(images)

    def encode_text_labels(self, texts):
        return self.backbone.encode_texts(texts)

    def extract_vector(self, images):
        return self.backbone.encode_image(images)

    # ------------------------------------------------------------------
    def incremental_train(self, data_manager) -> None:
        self._cur_task += 1
        self._total_classes = self._known_classes + data_manager.get_task_size(self._cur_task)
        self.data_manager = data_manager
        logging.info("Learning on %d-%d", self._known_classes, self._total_classes)
        test_ds = data_manager.get_dataset(np.arange(0, self._total_classes), source="test", mode="test")
        self.test_loader = self._loader(test_ds, batch_size=128)  # EVAL batch: single tower compile shape

    def _known_text_features(self) -> jnp.ndarray:
        class_to_label = self.data_manager._class_to_label
        templates = self.data_manager._data_to_prompt
        feats = []
        for label in class_to_label[: self._total_classes]:
            texts = [t.format(label) for t in templates]
            emb = self.encode_text_labels(texts)
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            mean = emb.mean(axis=0)
            feats.append(mean / jnp.linalg.norm(mean))
        return jnp.stack(feats)

    def _eval_cnn(self, loader):
        from team_tpu.learners.base import _fetch_concat

        text_features = self._known_text_features()
        y_pred, y_true = [], []
        k = min(self.topk, int(text_features.shape[0]))
        pending = []
        for batch in loader:  # dispatch all batches, then fetch ONCE
            v = int(batch.get("valid", len(batch["label"])))
            img = self.encode_image(jnp.asarray(batch["image"]))
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            logits = img @ text_features.T
            pending.append((v, batch["label"], jax.lax.top_k(logits, k)[1]))
        stacked, offs = _fetch_concat([p for _, _, p in pending])
        for (v, lab, p), o in zip(pending, offs):
            preds = stacked[o:o + p.shape[0]]
            if k < self.topk:  # pad to a fixed [N, topk] (reference proof.py:596-600)
                preds = np.concatenate(
                    [preds, np.zeros((preds.shape[0], self.topk - k), dtype=preds.dtype)], axis=1
                )
            y_pred.append(preds[:v])
            y_true.append(lab[:v])
        return np.concatenate(y_pred), np.concatenate(y_true)

    def _compute_accuracy(self, loader) -> float:
        text_features = self._known_text_features()
        correct, total = 0, 0
        for batch in loader:
            v = int(batch.get("valid", len(batch["label"])))
            img = self.encode_image(jnp.asarray(batch["image"]))
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            logits = img @ text_features.T
            preds = np.asarray(jnp.argmax(logits, axis=1))[:v]
            correct += int((preds == batch["label"][:v]).sum())
            total += v
        return float(np.around(correct * 100 / total, decimals=2))
