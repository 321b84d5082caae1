"""SimpleCIL learner: frozen features + class-mean prototype cosine head.

Counterpart of reference ``models/simplecil.py:17-88``: no gradient training —
for each new class the mean frozen-backbone embedding is written into the
corresponding ``CosineLinear`` row (``replace_fc``). The head here is a
preallocated ``[max_classes, D]`` bank with an active-class mask
(:mod:`team_tpu.modules.linears`), so the jitted eval never changes shape.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.config import Config
from team_tpu.learners.backbone_runtime import BackboneRuntime
from team_tpu.learners.base import BaseLearner
from team_tpu.modules.linears import cosine_linear_forward, init_cosine_linear, set_class_weights


class Learner(BaseLearner):
    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.backbone = BackboneRuntime(cfg)
        self.image_size = self.backbone.clip_cfg.vision.image_size
        self.fc = None  # initialized once capacity is known

    @property
    def feature_dim(self) -> int:
        return self.backbone.out_dim

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
        if self.fc is None:
            self.cfg.derive_capacity(data_manager.get_total_classnum(), data_manager.nb_tasks)
            self.fc = init_cosine_linear(
                jax.random.PRNGKey(0), self.cfg.max_classes, self.feature_dim
            )
        logging.info("Learning on %d-%d", self._known_classes, self._total_classes)

        train_ds = data_manager.get_dataset(
            np.arange(self._known_classes, self._total_classes), source="train", mode="train"
        )
        self.train_dataset = train_ds
        self.train_loader = self._loader(train_ds, shuffle=True)
        test_ds = data_manager.get_dataset(np.arange(0, self._total_classes), source="test", mode="test")
        self.test_loader = self._loader(test_ds, batch_size=128)  # EVAL batch: single tower compile shape
        proto_ds = data_manager.get_dataset(
            np.arange(self._known_classes, self._total_classes), source="train", mode="test"
        )
        self.train_loader_for_protonet = self._loader(proto_ds, shuffle=True)

        self.replace_fc(self.train_loader_for_protonet)

    def replace_fc(self, loader) -> None:
        """Write class-mean embeddings into head rows (reference ``:31-57``)."""
        vectors, targets = self._extract_vectors(loader)
        class_list = np.unique(self.train_dataset.labels)
        means, ids = [], []
        for class_index in class_list:
            logging.info("Replacing... %d", class_index)
            means.append(vectors[targets == class_index].mean(axis=0))
            ids.append(class_index)
        self.fc = set_class_weights(self.fc, jnp.asarray(np.stack(means)), jnp.asarray(ids))

    # ------------------------------------------------------------------
    def _class_mask(self) -> jnp.ndarray:
        mask = np.zeros(self.cfg.max_classes, dtype=np.float32)
        mask[: self._total_classes] = 1.0
        return jnp.asarray(mask)

    def _eval_cnn(self, loader):
        from team_tpu.learners.base import _fetch_concat

        mask = self._class_mask()
        y_pred, y_true = [], []
        k = min(self.topk, self._total_classes)
        pending = []
        for batch in loader:  # dispatch all batches, then fetch ONCE
            v = int(batch.get("valid", len(batch["label"])))
            feats = self.extract_vector(jnp.asarray(batch["image"]))
            logits = cosine_linear_forward(self.fc, feats, mask)
            pending.append((v, batch["label"], jax.lax.top_k(logits, k)[1]))
        stacked, offs = _fetch_concat([p for _, _, p in pending])
        for (v, lab, p), o in zip(pending, offs):
            preds = stacked[o:o + p.shape[0]]
            if k < self.topk:
                preds = np.concatenate(
                    [preds, np.zeros((preds.shape[0], self.topk - k), dtype=preds.dtype)], axis=1
                )
            y_pred.append(preds[:v])
            y_true.append(lab[:v])
        return np.concatenate(y_pred), np.concatenate(y_true)

    def _compute_accuracy(self, loader) -> float:
        mask = self._class_mask()
        correct, total = 0, 0
        for batch in loader:
            v = int(batch.get("valid", len(batch["label"])))
            feats = self.extract_vector(jnp.asarray(batch["image"]))
            logits = cosine_linear_forward(self.fc, feats, mask)
            preds = np.asarray(jnp.argmax(logits, axis=1))[:v]
            correct += int((preds == batch["label"][:v]).sum())
            total += v
        return float(np.around(correct * 100 / total, decimals=2))
