"""Shared frozen-CLIP runtime for all learners.

Counterpart of reference ``get_convnet`` (``utils/inc_net.py:12-36``): builds the
ViT-B/16 towers + tokenizer for convnet_type in {clip, clip_laion2b, openai_clip}
(pretrained weights load from ``TEAM_CLIP_CHECKPOINT`` when available — this
image has no network egress, so random init otherwise) and exposes jitted
``encode_image`` / ``encode_text`` with a text-feature cache keyed by the exact
prompt strings (valid because the backbone is frozen).
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.backbone.clip import CLIPConfig, encode_image, encode_text, init_clip_params
from team_tpu.backbone.tokenizer import Tokenizer
from team_tpu.config import Config

_KNOWN_TYPES = ("clip", "clip_laion2b", "openai_clip")


def clip_config_for(cfg: Config) -> CLIPConfig:
    if cfg.convnet_type.lower() not in _KNOWN_TYPES and "clip" not in cfg.convnet_type.lower():
        raise NotImplementedError(f"Unknown type {cfg.convnet_type}")
    if cfg.get("tiny_backbone", False):
        return CLIPConfig.tiny()
    return CLIPConfig.vit_b16()


class BackboneRuntime:
    def __init__(self, cfg: Config, seed: int = 0):
        self.cfg = cfg
        self.clip_cfg = clip_config_for(cfg)
        ckpt = os.environ.get("TEAM_CLIP_CHECKPOINT")
        pretrained = bool(ckpt and os.path.isfile(ckpt))
        if pretrained:
            from team_tpu.backbone.import_weights import load_clip_checkpoint

            logging.info("loading CLIP checkpoint from %s", ckpt)
            self.params = load_clip_checkpoint(ckpt, self.clip_cfg)
        else:
            logging.info("no CLIP checkpoint available; random init (offline image)")
            self.params = init_clip_params(jax.random.PRNGKey(seed), self.clip_cfg)
        # pretrained weights + byte-fallback ids would silently corrupt every
        # text feature: require the real BPE vocab unless explicitly waived
        self.tokenizer = Tokenizer(
            require_bpe=pretrained and not cfg.get("allow_byte_tokenizer", False))
        self.out_dim = self.clip_cfg.embed_dim
        self.compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.attn_impl = cfg.attention_impl
        self._text_cache: Dict[str, np.ndarray] = {}

        self._encode_image = jax.jit(
            partial(encode_image, cfg=self.clip_cfg, compute_dtype=self.compute_dtype,
                    attn_impl=self.attn_impl)
        )
        self._encode_text = jax.jit(
            partial(encode_text, cfg=self.clip_cfg, compute_dtype=self.compute_dtype,
                    attn_impl=self.attn_impl)
        )

        def _encode_u8(params, images_u8):
            # fused device-side preprocess (round-1 verdict item 3): uint8
            # arrives from the loader, /255 + CLIP-normalize fuses into the
            # tower's first HBM pass — numerically identical f32 math to the
            # host normalize, 4x less transfer.
            from team_tpu.ops.preprocess import preprocess_batch

            x = preprocess_batch(images_u8, self.clip_cfg.vision.image_size)
            return encode_image(params, x, cfg=self.clip_cfg,
                                compute_dtype=self.compute_dtype,
                                attn_impl=self.attn_impl)

        self._encode_image_u8 = jax.jit(_encode_u8)

        def _encode_pu8(params, patches_u8):
            # patch-major uint8 ingest (native load_batch_u8_patches layout):
            # zero device-side spatial reorder; normalize folds into the
            # patch dot prologue (docs/BENCH.md round-4 ingest audit)
            from team_tpu.backbone.clip import encode_image_patches_u8

            return encode_image_patches_u8(params, patches_u8,
                                           cfg=self.clip_cfg,
                                           compute_dtype=self.compute_dtype,
                                           attn_impl=self.attn_impl)

        self._encode_image_pu8 = jax.jit(_encode_pu8)

        # int8 static-W8A8 encode tier (cfg.encoder_quant="int8_static"):
        # calibrated lazily on the first batch, gated by a one-time cosine
        # check vs the bf16 tower (>= 0.999 or it falls back). Replaces the
        # reference's external CUDA encoder tier (utils/inc_net.py:19-32).
        self.encoder_quant = cfg.get("encoder_quant", "bf16")
        self._qvision = None
        self._qvision_pending = None
        self._calib_jit = None
        from team_tpu.ops.preprocess import preprocess_batch as _pp

        self._preprocess = jax.jit(
            lambda u8: _pp(u8, self.clip_cfg.vision.image_size))

        # production int8 GEMM tier: static3d_qi (round 4 — integer QK^T
        # attention + fused one-pass LN, 5576 img/s vs static3d_qa's 4973;
        # docs/BENCH.md); override via cfg extras int8_gemm_impl
        self._int8_impl = cfg.get("int8_gemm_impl", "static3d_qi")

        def _encode_int8(qv, x):
            from team_tpu.backbone.quant import encode_image_int8

            return encode_image_int8(qv, x, self.clip_cfg,
                                     attn_impl=self.attn_impl,
                                     gemm_impl=self._int8_impl)

        self._encode_int8 = jax.jit(_encode_int8)

        def _encode_int8_u8(qv, images_u8):
            # preprocess fused into the SAME jit: a separate preprocess
            # dispatch costs a full tunnel round trip per batch
            x = _pp(images_u8, self.clip_cfg.vision.image_size)
            from team_tpu.backbone.quant import encode_image_int8

            return encode_image_int8(qv, x, self.clip_cfg,
                                     attn_impl=self.attn_impl,
                                     gemm_impl=self._int8_impl)

        self._encode_int8_u8 = jax.jit(_encode_int8_u8)

        def _encode_int8_pu8(qv, patches_u8):
            from team_tpu.backbone.quant import encode_image_int8_patches

            return encode_image_int8_patches(qv, patches_u8, self.clip_cfg,
                                             attn_impl=self.attn_impl,
                                             gemm_impl=self._int8_impl)

        self._encode_int8_pu8 = jax.jit(_encode_int8_pu8)
        self._calib_patches_jit = None

    def _calib_forward(self, x: jnp.ndarray):
        """Calibration forward == the bf16 tower (stats + features in one
        graph); also serves as the bf16 encode while the gate is pending —
        no separate bf16 encode graph is ever built (each unique tower graph
        costs minutes of per-run warm-start on the axon tunnel)."""
        from team_tpu.backbone.quant import calibrate_vision_tower

        if self._calib_jit is None:
            self._calib_jit = jax.jit(lambda p, im: calibrate_vision_tower(
                p, im, self.clip_cfg, attn_impl=self.attn_impl,
                return_features=True))
        return self._calib_jit(self.params, x)

    def _calib_forward_patches(self, patches_u8: jnp.ndarray):
        """Calibration forward over a PATCH-MAJOR uint8 batch — in a
        patch-major run this is the only bf16 tower graph ever built (each
        unique tower graph costs minutes of per-run warm-start on the axon
        tunnel, so the image-major graphs must never be touched here)."""
        from team_tpu.backbone.quant import calibrate_vision_tower_patches

        if self._calib_patches_jit is None:
            self._calib_patches_jit = jax.jit(
                lambda p, px: calibrate_vision_tower_patches(
                    p, px, self.clip_cfg, attn_impl=self.attn_impl,
                    return_features=True))
        return self._calib_patches_jit(self.params, patches_u8)

    @staticmethod
    def _is_patch_major(images: jnp.ndarray) -> bool:
        return images.ndim == 3 and images.dtype == jnp.uint8

    def _calibrate_int8(self, images: jnp.ndarray) -> jnp.ndarray:
        """Calibrate the static-W8A8 tower on this batch and return the
        batch's bf16 features. The cosine gate is DEFERRED to the next encode
        call so it runs on held-out data (ADVICE r3 medium: gating on the
        calibration batch is optimistic — the scales were fit to exactly
        those activations, so calibration-distribution mismatch could never
        be detected)."""
        from team_tpu.backbone.quant import quantize_vision_tower_static

        if self._is_patch_major(images):
            calib, ref = self._calib_forward_patches(images)
        else:
            is_u8 = images.dtype == jnp.uint8
            x = self._preprocess(images) if is_u8 else images
            calib, ref = self._calib_forward(x)
        if jax.process_count() > 1:
            # multi-host: every process must build the IDENTICAL quantized
            # tower (ADVICE r3: per-host local calibration could diverge).
            # amax stats combine exactly under elementwise max.
            from jax.experimental import multihost_utils

            calib = jax.tree_util.tree_map(
                lambda a: jnp.max(multihost_utils.process_allgather(a), axis=0),
                calib)
        self._qvision_pending = quantize_vision_tower_static(
            self.params, calib, heads=self.clip_cfg.vision.heads)
        logging.info("int8_static calibrated; cosine gate pending on the "
                     "next (held-out) batch")
        return ref

    def _gate_int8(self, images: jnp.ndarray) -> jnp.ndarray:
        """Held-out cosine gate: compare the candidate quantized tower vs the
        bf16 tower on THIS (non-calibration) batch; commit or fall back."""
        qv = self._qvision_pending
        if self._is_patch_major(images):
            _, ref = self._calib_forward_patches(images)
            feats = self._encode_int8_pu8(qv, images)
        else:
            is_u8 = images.dtype == jnp.uint8
            x = self._preprocess(images) if is_u8 else images
            _, ref = self._calib_forward(x)
            feats = (self._encode_int8_u8(qv, images) if is_u8
                     else self._encode_int8(qv, images))
        a = np.asarray(ref, np.float64)
        b = np.asarray(feats, np.float64)
        cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                                 * np.linalg.norm(b, axis=-1) + 1e-30)
        cos_min = float(cos.min())
        if jax.process_count() > 1:
            # the gate decision must be identical on every host
            from jax.experimental import multihost_utils

            cos_min = float(np.min(multihost_utils.process_allgather(
                np.asarray([cos_min]))))
        self._qvision_pending = None
        if cos_min >= 0.999:
            self._qvision = qv
            logging.info("int8_static encoder enabled (held-out cosine "
                         "min %.6f)", cos_min)
            cache = self.cfg.get("int8_cache_dir")
            if cache and jax.process_index() == 0:
                from team_tpu.backbone.quant import save_quantized_tower

                save_quantized_tower(cache, qv)
                logging.info("validated quantized tower saved to %s", cache)
            return feats
        self.encoder_quant = "bf16"  # pragma: no cover — safety valve
        logging.warning("int8_static held-out cosine gate FAILED (min %.6f) "
                        "— falling back to bf16 encode", cos_min)
        return ref

    def _try_load_int8_cache(self) -> bool:
        """Load a previously VALIDATED quantized tower (skips calibration AND
        its per-run graph warm-start — minutes on the axon tunnel). Payloads
        are only written after passing the held-out cosine gate."""
        cache = self.cfg.get("int8_cache_dir")
        if not cache or not os.path.isdir(cache):
            return False
        try:
            from team_tpu.backbone.quant import load_quantized_tower

            self._qvision = load_quantized_tower(cache)
            logging.info("loaded validated quantized tower from %s "
                         "(calibration skipped)", cache)
            return True
        except Exception as e:  # pragma: no cover — fall back to calibration
            logging.warning("int8 cache load failed (%s); recalibrating", e)
            return False

    # -- frozen-backbone encodes ---------------------------------------
    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        if self.encoder_quant == "int8_static":
            if self._qvision is None and self._qvision_pending is None:
                self._try_load_int8_cache()
            if self._qvision is not None:
                if self._is_patch_major(images):
                    return self._encode_int8_pu8(self._qvision, images)
                if images.dtype == jnp.uint8:
                    return self._encode_int8_u8(self._qvision, images)
                return self._encode_int8(self._qvision, images)
            if self._qvision_pending is None:
                return self._calibrate_int8(images)
            return self._gate_int8(images)
        if self._is_patch_major(images):
            return self._encode_image_pu8(self.params, images)
        if images.dtype == jnp.uint8:
            return self._encode_image_u8(self.params, images)
        return self._encode_image(self.params, images)

    def encode_text_tokens(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self._encode_text(self.params, tokens)

    TEXT_BUCKET = 32  # pad text batches to a fixed size: one compile, not one per count

    def encode_texts(self, texts: Sequence[str], cache: bool = True) -> jnp.ndarray:
        """Encode strings; frozen backbone makes per-string caching exact.
        Batches are padded to ``TEXT_BUCKET`` so the jitted text tower compiles
        for a single shape (remote compiles are minutes each on this env)."""
        missing = [t for t in texts if t not in self._text_cache] if cache else list(texts)
        # de-dup while preserving order
        missing = list(dict.fromkeys(missing))
        feats_by_text = {}
        for start in range(0, len(missing), self.TEXT_BUCKET):
            chunk = missing[start : start + self.TEXT_BUCKET]
            toks = self.tokenizer(chunk)
            pad = self.TEXT_BUCKET - len(chunk)
            if pad:
                toks = np.concatenate([toks, np.repeat(toks[-1:], pad, axis=0)])
            feats = np.asarray(self.encode_text_tokens(jnp.asarray(toks)))[: len(chunk)]
            for t, f in zip(chunk, feats):
                feats_by_text[t] = f
                if cache:
                    self._text_cache[t] = f
        if cache:
            return jnp.asarray(np.stack([self._text_cache[t] for t in texts]))
        return jnp.asarray(np.stack([feats_by_text[t] for t in texts]))

    @property
    def logit_scale(self) -> jnp.ndarray:
        return self.params["logit_scale"]
