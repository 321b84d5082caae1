"""PROOF/TEAM learner — the flagship temporal-evolution-aware trainer.

Counterpart of reference ``models/proof.py:193-682`` (``Learner``): per-task
tri-modal projection training with replay, class/state prototype computation,
the per-epoch temporal-evolution call sequence, the adaptive state-distance
matrix updates, herding rehearsal memory, and topk evaluation.

Host-side orchestration only; every numeric path is a jitted device function
from :mod:`team_tpu.learners.proof_net` / :mod:`team_tpu.modules.evolution`.

The reference's per-epoch evolution sequence is reproduced call-for-call
(including the duplicated every-2-epochs block, ``proof.py:461-476``, and the
double ``evolve_and_update`` per epoch via ``update_state_distance_matrix``,
``:496-513`` — the GCN is not idempotent, so the duplication is semantic).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.config import Config
from team_tpu.learners.backbone_runtime import BackboneRuntime
from team_tpu.learners.base import BaseLearner
from team_tpu.learners.proof_net import (
    ProofBuffers,
    ProofDims,
    TaskContext,
    build_epoch_runner,
    lr_schedule,
    eval_correct_scan,
    eval_logits,
    init_buffers,
    init_proof_params,
    make_optimizer,
    project_image,
    project_text,
)
from team_tpu.modules.evolution import (
    evolve_and_update,
    fuse_evolved_prototypes,
    sync_class_prototypes,
)
from team_tpu.modules.state_distance import StateDistanceMatrix

EVAL_BATCH = 128


class Learner(BaseLearner):
    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.backbone = BackboneRuntime(cfg)
        self.image_size = self.backbone.clip_cfg.vision.image_size
        self.init_lr = cfg.init_lr
        self.tuned_epoch = cfg.tuned_epoch
        self.dims: Optional[ProofDims] = None
        self.trainable = None
        self.aux = None
        self.buffers: Optional[ProofBuffers] = None
        self.ctx: Optional[TaskContext] = None
        self._rng = jax.random.PRNGKey(cfg.seed[0] if isinstance(cfg.seed, (list, tuple)) else cfg.seed)
        # adaptive state distance matrix (reference proof.py:214-220)
        self.state_distance = StateDistanceMatrix(
            num_states=cfg.num_states, feature_dim=self.backbone.out_dim,
            init_with_prior=True,
            update_interval=cfg.update_state_distance_interval,
            decay_factor=cfg.state_distance_decay_factor,
        )

    # ------------------------------------------------------------------
    @property
    def feature_dim(self) -> int:
        return self.backbone.out_dim

    def extract_vector(self, images):
        """Frozen-backbone features (reference SimpleClipNet.extract_vector)."""
        return self.backbone.encode_image(images)

    def _extract_vectors(self, loader):
        # NME eval runs over the task's test loader: reuse the cached frozen
        # features (identical: same dataset, same order, frozen towers)
        if loader is self.test_loader and getattr(self, "_test_feats", None) is not None:
            feats, labels, _ = self._test_feats
            return feats.copy(), labels.copy()
        return super()._extract_vectors(loader)

    def encode_image(self, images):
        """Projection-summed image features (reference Proof_Net.encode_image)."""
        basic = self.backbone.encode_image(images)
        return _project_image_jit(self._eval_params(), basic, self.ctx)

    def encode_text_labels(self, texts):
        basic = self.backbone.encode_texts(texts)
        return _project_text_jit(self._eval_params(), basic, self.ctx)

    # ------------------------------------------------------------------
    def _ensure_initialized(self, data_manager) -> None:
        if self.dims is not None:
            return
        self.cfg.derive_capacity(data_manager.get_total_classnum(), data_manager.nb_tasks)
        self.dims = ProofDims(
            feature_dim=self.feature_dim,
            max_classes=self.cfg.max_classes,
            max_tasks=self.cfg.max_tasks,
            num_states=self.cfg.num_states,
            ctx_len=self.cfg.context_prompt_length_per_task,
            gcn_layers=self.cfg.temporal_gcn_layers if not self.cfg.parity_mode else 2,
            # parity: the reference always builds hidden = feature_dim // 2
            gcn_hidden_dim=(0 if self.cfg.parity_mode
                            else int(self.cfg.temporal_gcn_hidden_dim)),
        )
        if self.trainable is None:  # may already be set by checkpoint restore
            key, self._rng = _split(self._rng)
            # ONE jitted init graph: the eager form issues ~100 tiny remote
            # dispatches (bank inits + zeros), each a ~1 s tunnel round trip
            # even when compile-cached — measured 135.9 s of task-1 time in
            # the round-5 protocol profile (docs/BENCH.md). Values are
            # bitwise-identical (threefry RNG is deterministic under jit;
            # pinned by the golden-protocol tests).
            dims, ls = self.dims, float(self.backbone.logit_scale)
            (self.trainable, self.aux), self.buffers = jax.jit(
                lambda k: (init_proof_params(k, dims, ls), init_buffers(dims))
            )(key)
        self._tx = make_optimizer(self.cfg)
        # optional data-parallel mesh: batch sharded over ICI, params replicated;
        # the SPMD partitioner turns the CLIP loss into a global-batch loss with
        # all-gathers (replaces reference nn.DataParallel, proof.py:312-313)
        self._mesh_ctx = None
        self._multiproc = jax.process_count() > 1
        if self.cfg.mesh_shape:
            from team_tpu.parallel.mesh import MeshContext, make_mesh

            mesh = make_mesh(tuple(self.cfg.mesh_shape), tuple(self.cfg.mesh_axis_names))
            self._mesh_ctx = MeshContext(mesh, self.cfg.mesh_axis_names[0])
            self.trainable = self._mesh_ctx.replicate(self.trainable)
            if not self._multiproc:
                # multi-host keeps buffers HOST-LOCAL (identical on every
                # process — deterministic orchestration); they are globalized
                # per epoch-runner call. Evolve/eval paths then stay local.
                self.buffers = ProofBuffers(*self._mesh_ctx.replicate(tuple(self.buffers)))
        # fix-mode global_clip_loss=False -> per-shard contrastive loss
        clip_shards = 1
        if (self._mesh_ctx is not None and not self.cfg.parity_mode
                and not self.cfg.global_clip_loss):
            clip_shards = self._mesh_ctx.n_data
        # every batch (incl. the padded final one) goes through the epoch
        # scan — the single-step path lives in proof_net.build_train_step for
        # direct/odd-shaped use (tests, notebooks) but has no caller here
        self._epoch_runner = build_epoch_runner(self.cfg, self.dims, self._tx,
                                                clip_shards=clip_shards)

    def _make_ctx(self) -> TaskContext:
        t = np.zeros(self.dims.max_tasks, np.float32)
        t[: self._cur_task + 1] = 1.0
        cur = np.zeros(self.dims.max_tasks, np.float32)
        cur[self._cur_task] = 1.0
        cmask = np.zeros(self.dims.max_classes, np.float32)
        cmask[: self._total_classes] = 1.0
        # frozen-backbone text features for the first template over active classes
        template = self.data_manager._data_to_prompt[0]
        labels = self.data_manager._class_to_label[: self._total_classes]
        texts = [template.format(lbl) for lbl in labels]
        basic = np.asarray(self.backbone.encode_texts(texts))
        full = np.zeros((self.dims.max_classes, self.dims.feature_dim), np.float32)
        full[: self._total_classes] = basic
        return TaskContext(
            task_mask=jnp.asarray(t),
            cur_onehot=jnp.asarray(cur),
            class_mask=jnp.asarray(cmask),
            class_text_basic=jnp.asarray(full),
        )

    # ------------------------------------------------------------------
    def incremental_train(self, data_manager) -> None:
        self._cur_task += 1
        self._total_classes = self._known_classes + data_manager.get_task_size(self._cur_task)
        self.data_manager = data_manager
        from team_tpu.utils.phase_timer import phase

        with phase("ensure_initialized"):
            self._ensure_initialized(data_manager)
        with phase("make_ctx_text"):
            self.ctx = self._make_ctx()
        self._ctx_global = None  # re-replicated per task under multi-host
        logging.info("Learning on %d-%d", self._known_classes, self._total_classes)

        train_ds = data_manager.get_multimodal_dataset(
            np.arange(self._known_classes, self._total_classes),
            source="train", mode="train", appendent=self._get_memory(),
        )
        self.train_dataset = train_ds
        test_ds = data_manager.get_multimodal_dataset(
            np.arange(0, self._total_classes), source="test", mode="test"
        )
        self.test_loader = self._loader(test_ds, batch_size=EVAL_BATCH)
        proto_ds = data_manager.get_multimodal_dataset(
            np.arange(self._known_classes, self._total_classes), source="train", mode="test"
        )

        # prototype computation from frozen normalized backbone features
        # (reference cal_prototype, proof.py:226-276)
        with phase("prototype"):
            self.cal_prototype(proto_ds)

        # cache frozen-backbone features for the whole task (exact: deterministic
        # transforms + frozen towers). ~20x fewer backbone FLOPs than the
        # reference's per-epoch re-encoding. Stochastic train pipelines
        # (augment_ops / RandomResizedCrop datasets) are re-encoded every
        # ``augment_reencode_every`` epochs instead, matching the reference's
        # fresh forward per epoch (models/proof.py:397-412).
        self._train_stochastic = bool(
            (self.cfg.get("augment_ops", None) or not train_ds.deterministic_train)
            and not self.cfg.get("cache_backbone_features", False)
            and jax.process_count() == 1
        )
        if self._train_stochastic:
            # one persistent loader per task: its epoch counter advances on
            # every iteration so augmentation draws differ epoch to epoch
            self._stoch_loader = self._loader(train_ds, batch_size=EVAL_BATCH)
            with phase("feature_extract_train"):
                self._train_feats = self._encode_train_fresh()
        else:
            if (self.cfg.get("augment_ops", None)
                    or not train_ds.deterministic_train):
                if self.cfg.get("cache_backbone_features", False):
                    logging.info(
                        "cache_backbone_features=true: stochastic train "
                        "pipeline encoded ONCE per task (first augmentation "
                        "draws frozen — aug parity deliberately traded for "
                        "encode time)")
                else:
                    logging.warning(
                        "stochastic train pipeline under multi-host: features "
                        "are encoded once per task (per-epoch re-encode is "
                        "single-host)")
            with phase("feature_extract_train"):
                self._train_feats = self._dataset_features(train_ds)
        with phase("feature_extract_test"):
            self._test_feats = self._dataset_features(test_ds)

        with phase("train_epochs"):
            self._train_proj_with_replay()

        with phase("rehearsal_memory"):
            self.build_rehearsal_memory(data_manager, self.samples_per_class)
        self.state_distance.update_counter = 0

        if self.cfg.enable_plots:
            try:
                from team_tpu.analysis.plots import analyze_state_evolution

                analyze_state_evolution(
                    self.buffers, data_manager._class_to_label,
                    save_dir=f"{self.cfg.results_dir}/task_{self._cur_task}/analysis",
                )
            except Exception as e:  # plots must never kill training (trainer.py:127-131)
                logging.error("state-evolution analysis failed: %s", e)

        # final evolution pass (reference proof.py:343-346)
        with phase("evolution"):
            self.integrate_with_state_distance()
            self.evolve_state_prototypes()

    # ------------------------------------------------------------------
    def cal_prototype(self, proto_ds) -> None:
        feats, labels, stages = self._dataset_features(proto_ds, normalize=True)
        proto_state = np.array(self.buffers.proto_state)
        proto_mask = np.array(self.buffers.proto_mask)
        img_protos = np.array(self.buffers.img_prototypes)
        for class_index in range(self._known_classes, self._total_classes):
            idx = labels == class_index
            if idx.sum() == 0:
                continue
            img_protos[class_index] = feats[idx].mean(axis=0)
            for state_id in np.unique(stages[idx]):
                smask = idx & (stages == state_id)
                proto_state[class_index, int(state_id)] = feats[smask].mean(axis=0)
                proto_mask[class_index, int(state_id)] = 1.0
        # host-side emptiness flag: evolve_state_prototypes' guard was a
        # device fetch (~28 ms) on EVERY call — proto_mask is only ever
        # written here (from this numpy array) and at zero-init, so the flag
        # is host-knowable (checkpoint restore recomputes it lazily once)
        self._proto_mask_any = bool(proto_mask.sum() > 0)
        self.buffers = self.buffers._replace(
            img_prototypes=jnp.asarray(img_protos),
            proto_state=jnp.asarray(proto_state),
            proto_mask=jnp.asarray(proto_mask),
        )

    def _encode_train_fresh(self):
        """One fresh encode pass over the task's train set through the
        persistent stochastic loader (fresh augmentation draws each call)."""
        from team_tpu.learners.base import _fetch_concat

        pending = [(int(b.get("valid", len(b["label"]))), b["label"],
                    b["stage_id"],
                    self.backbone.encode_image(jnp.asarray(b["image"])))
                   for b in self._stoch_loader]  # dispatch all, fetch ONCE
        stacked, offs = _fetch_concat([f for _, _, _, f in pending])
        feats = [stacked[o:o + v] for (v, _, _, _), o in zip(pending, offs)]
        labels = [lab[:v] for v, lab, _, _ in pending]
        stages = [st[:v] for v, _, st, _ in pending]
        return np.concatenate(feats), np.concatenate(labels), np.concatenate(stages)

    def _dataset_features(self, ds, normalize: bool = False):
        # deterministic pipeline: serve from the run-wide frozen-feature cache
        # (each image encoded at most once per run; multi-host runs shard the
        # missing-row encode over hosts and all-gather — base._cached_features)
        if self._cacheable(ds):
            feats = self._cached_features(ds, batch_size=EVAL_BATCH)
            if normalize:
                feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
            return feats, ds.labels, ds.stages
        # multi-host: each process encodes only its deterministic interleaved
        # shard (backbone encode dominates per-task cost), then the shards are
        # all-gathered back into global order on every host
        rows = None
        if jax.process_count() > 1:
            from team_tpu.parallel.mesh import host_shard_indices

            rows = host_shard_indices(len(ds))
        from team_tpu.learners.base import _fetch_concat

        loader = self._loader(ds, batch_size=EVAL_BATCH, indices=rows)
        pending = []
        for batch in loader:  # dispatch all batches, then fetch ONCE
            v = int(batch.get("valid", len(batch["label"])))
            f = self.backbone.encode_image(jnp.asarray(batch["image"]))
            if normalize:
                f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
            pending.append((v, batch["label"], batch["stage_id"], f))
        stacked, offs = _fetch_concat([f for _, _, _, f in pending])
        labels = [lab[:v] for v, lab, _, _ in pending]
        stages = [st[:v] for v, _, st, _ in pending]
        feats = np.concatenate(
            [stacked[o:o + v] for (v, _, _, _), o in zip(pending, offs)])
        labels = np.concatenate(labels)
        stages = np.concatenate(stages)
        if rows is not None:
            from team_tpu.parallel.mesh import allgather_host_shards

            n = len(ds)
            feats = allgather_host_shards(feats, n)
            labels = allgather_host_shards(labels, n)
            stages = allgather_host_shards(stages, n)
        return feats, labels, stages

    # ------------------------------------------------------------------
    def _train_proj_with_replay(self) -> None:
        cfg = self.cfg
        if self._multiproc and self._mesh_ctx is not None:
            # optax.init runs eager ops, which cannot consume global arrays:
            # init from a local copy, then replicate the fresh state
            opt_state = self._mesh_ctx.replicate(
                self._tx.init(self._to_local(self.trainable)))
        else:
            opt_state = self._tx.init(self.trainable)
        feats, labels, stages = self._train_feats
        n = len(labels)
        seed0 = cfg.seed[0] if isinstance(cfg.seed, (list, tuple)) else cfg.seed
        shuffle_rng = np.random.default_rng(int(seed0) + self._cur_task)

        # pre-training integration (reference proof.py:394) — no-op, documented
        self.integrate_with_state_distance()

        # ONE path for single-device and data-parallel training: every epoch is
        # lax.scan'd over [K, B] stacked batches; the last batch is PADDED (rows
        # repeat index 0) and masked via ``valid_mask`` — losses/stats over a
        # padded batch equal the unpadded ones exactly, so DP and single-device
        # runs consume identical data (no remainder trimming). Power-of-two
        # chunking bounds compiled scan lengths to log2(K_max) across the run.
        bs = self.batch_size
        bs_eff = bs
        if self._mesh_ctx is not None:
            nd = self._mesh_ctx.n_data
            bs_eff = -(-bs // nd) * nd  # batch dim must split over the data axis
        k_full = max(1, -(-n // bs))

        reencode_every = max(1, int(cfg.get("augment_reencode_every", 1)))
        for epoch in range(self.tuned_epoch):
            # stochastic pipeline: fresh augmentation draws -> fresh features
            # (reference re-forwards every epoch, models/proof.py:397-412)
            if getattr(self, "_train_stochastic", False) and epoch > 0 \
                    and epoch % reencode_every == 0:
                feats, labels, stages = self._encode_train_fresh()
                self._train_feats = (feats, labels, stages)
            # per-epoch LR (scheduler stepped per epoch, proof.py:363,452;
            # fix-mode honors lr_scheduler/milestones/gamma); keep the dtype
            # stable so the jitted step never retraces
            lr = jnp.asarray(lr_schedule(cfg, epoch), dtype=jnp.float32)
            if self._multiproc and self._mesh_ctx is not None:
                lr = self._mesh_ctx.replicate(lr)
            opt_state.hyperparams["learning_rate"] = lr
            # test-support hook: the full-loop parity harness replays the
            # REFERENCE's recorded per-epoch batch order so both systems
            # consume identical batches (tests/ref_loop_harness.py)
            order = None
            order_fn = getattr(self, "_order_override", None)
            if order_fn is not None:
                order = order_fn(self._cur_task, epoch, n)
            if order is None:
                order = shuffle_rng.permutation(n)
            else:
                order = np.asarray(order)
            epoch_arr = jnp.asarray(epoch)

            pad = k_full * bs - n
            rows = np.concatenate([order, np.zeros(pad, dtype=order.dtype)])
            vmask = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
            bidx = rows.reshape(k_full, bs)
            vms = vmask.reshape(k_full, bs)
            if bs_eff != bs:  # pad the batch dim for the mesh split, masked
                bidx = np.pad(bidx, ((0, 0), (0, bs_eff - bs)))
                vms = np.pad(vms, ((0, 0), (0, bs_eff - bs)))

            offset = 0
            pending_stats = []
            for chunk in _pow2_chunks(k_full):
                sl = slice(offset, offset + chunk)
                batches = self._put_stacked({
                    "feat": feats[bidx[sl]],
                    "label": labels[bidx[sl]].astype(np.int32),
                    "stage_id": stages[bidx[sl]].astype(np.int32),
                    "valid_mask": vms[sl],
                })
                self._rng, sub = _split(self._rng)
                rngs = jax.random.split(sub, chunk)
                self.trainable, opt_state, tot = self._call_epoch_runner(
                    opt_state, batches, rngs, epoch_arr,
                )
                pending_stats.append(jnp.stack([
                    tot.total_loss, tot.unicl_loss, tot.ce_loss,
                    tot.clip_loss, tot.correct.astype(jnp.float32)]))
                offset += chunk
            # ONE host fetch for the whole epoch's stats: each float()/int()
            # on a separate device scalar is its own ~28 ms tunnel round trip
            # (was 5 fetches × ~4 chunks per epoch ≈ 100 s over a 10-task/
            # 20-epoch protocol — docs/BENCH.md round-5 profile). correct is
            # an exact small count, so the f32 stack is lossless.
            st = np.asarray(jnp.stack(pending_stats)).astype(np.float64).sum(axis=0)
            losses, unicl_losses, ce_losses, clip_losses = (
                float(st[0]), float(st[1]), float(st[2]), float(st[3]))
            correct = int(st[4])
            total = n

            train_acc = np.around(correct * 100 / total, 2)
            test_acc = self._compute_accuracy()
            # test-support hook: per-epoch loss components for the full-loop
            # parity comparison (tests/ref_loop_harness.py)
            stats_hook = getattr(self, "_epoch_stats_hook", None)
            if stats_hook is not None:
                stats_hook(self._cur_task, epoch, dict(
                    total=losses, ce=ce_losses, clip=clip_losses,
                    unicl=unicl_losses, correct=correct, n=n))
            nb = k_full
            logging.info(
                "Task %d, Epoch %d/%d => Loss %.3f, UniCL %.3f, Train_acc %.2f, Test_acc %.2f",
                self._cur_task, epoch + 1, self.tuned_epoch,
                losses / nb, unicl_losses / nb, train_acc, test_acc,
            )

            # temporal evolution cadence (reference proof.py:461-513);
            # fix-mode honors temporal_enabled=false by skipping it entirely
            if self._temporal_on:
                if (epoch + 1) % 2 == 0:
                    self.evolve_state_prototypes()      # block 1 (:461-468)
                    if (epoch + 1) == self.tuned_epoch:
                        self._visualize_evolution_paths()
                    self.evolve_state_prototypes()      # duplicated block 2 (:473-476)
                if (epoch + 1) == self.tuned_epoch:
                    self._visualize_evolution_paths()

                res = evolve_and_update(
                    self.aux["temporal_gcn"], self.buffers.proto_state,
                    self.buffers.proto_mask, self.buffers.lifecycle_types,
                    **self._evo_kwargs(),
                )
                self.buffers = self.buffers._replace(
                    proto_state=res.prototypes,
                    evolution_embeddings=res.embeddings,
                    evolution_valid=res.embed_valid,
                    lifecycle_types=res.lifecycle_types,
                )
                self.update_state_distance_matrix(self.data_manager)

        # post-training integration (reference proof.py:516-517)
        self.integrate_with_state_distance()
        self.evolve_state_prototypes()

    def _evo_kwargs(self) -> dict:
        """Fix-mode honoring of declared-but-unread reference keys on the
        temporal graph (parity mode keeps the reference's hard-coded values)."""
        if self.cfg.parity_mode:
            return {}
        return dict(
            intra_edge_threshold=float(self.cfg.temporal_relation_threshold),
            inter_edge_weight=0.5 * float(self.cfg.class_lifecycle_consistency),
            time_weight=float(self.cfg.temporal_feature_weight),
        )

    @property
    def _temporal_on(self) -> bool:
        """Fix-mode honors ``temporal_enabled`` (the reference always evolves)."""
        return self.cfg.parity_mode or bool(self.cfg.temporal_enabled)

    # -- multi-host plumbing --------------------------------------------
    def _to_local(self, tree):
        """Host-local copy of a (fully-replicated) global pytree."""
        return jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)), tree)

    def _eval_params(self):
        """Params usable in host-local eval jits: under multi-host the
        trainable pytree is a global replicated array, which cannot mix with
        process-local inputs in a local jit — pull a local copy instead."""
        if self._multiproc and self._mesh_ctx is not None:
            return self._to_local(self.trainable)
        return self.trainable

    def _call_epoch_runner(self, opt_state, batches, rngs, epoch_arr):
        """Invoke the jitted epoch runner; under multi-host every input must be
        a GLOBAL array (the runner is the one collective computation per
        chunk), so host-local ctx/buffers/rngs/epoch are replicated in."""
        ctx, buffers = self.ctx, self.buffers
        if self._multiproc and self._mesh_ctx is not None:
            rep = self._mesh_ctx.replicate
            ctx = getattr(self, "_ctx_global", None)
            if ctx is None:
                ctx = self._ctx_global = TaskContext(*rep(tuple(self.ctx)))
            buffers = ProofBuffers(*rep(tuple(self.buffers)))
            rngs = rep(rngs)
            epoch_arr = rep(epoch_arr)
        return self._epoch_runner(self.trainable, opt_state, batches, ctx,
                                  buffers, rngs, epoch_arr)

    def _put_stacked(self, tree):
        """Device-put stacked [K, B, ...] epoch batches; under a mesh the batch
        dim is sharded over the data axis (replaces reference nn.DataParallel
        scatter, proof.py:312-313)."""
        if self._mesh_ctx is not None:
            return self._mesh_ctx.shard_stacked(tree)
        return {k: jnp.asarray(v) for k, v in tree.items()}

    # ------------------------------------------------------------------
    def _protos_nonempty(self) -> bool:
        flag = getattr(self, "_proto_mask_any", None)
        if flag is None:  # e.g. buffers restored from a checkpoint
            flag = self._proto_mask_any = bool(
                float(jnp.sum(self.buffers.proto_mask)) > 0)
        return flag

    def evolve_state_prototypes(self):
        """Reference ``Proof_Net.evolve_state_prototypes`` (inc_net.py:582-598)."""
        if not self._temporal_on or not self._protos_nonempty():
            return None
        res = evolve_and_update(
            self.aux["temporal_gcn"], self.buffers.proto_state,
            self.buffers.proto_mask, self.buffers.lifecycle_types,
            **self._evo_kwargs(),
        )
        fused = fuse_evolved_prototypes(
            self.buffers.proto_state, res.prototypes, self.buffers.proto_mask,
            jnp.ones_like(self.buffers.proto_mask, dtype=bool),
            parity=self.cfg.parity_mode, alpha=self.cfg.evolution_fuse_alpha,
        )
        img_protos = sync_class_prototypes(
            fused, self.buffers.proto_mask, self.buffers.img_prototypes,
            self.cfg.adult_state_weight,
        )
        self.buffers = self.buffers._replace(
            proto_state=fused,
            img_prototypes=img_protos,
            evolution_embeddings=res.embeddings,
            evolution_valid=res.embed_valid,
            lifecycle_types=res.lifecycle_types,
        )
        return res.embeddings

    def update_state_distance_matrix(self, data_manager) -> None:
        """Temporal-GCN distance merge (reference proof.py:643-682)."""
        if not self._temporal_on:
            return
        res = evolve_and_update(
            self.aux["temporal_gcn"], self.buffers.proto_state,
            self.buffers.proto_mask, self.buffers.lifecycle_types,
            **self._evo_kwargs(),
        )
        self.buffers = self.buffers._replace(
            proto_state=res.prototypes,
            evolution_embeddings=res.embeddings,
            evolution_valid=res.embed_valid,
            lifecycle_types=res.lifecycle_types,
        )
        self.state_distance.merge_gcn_distances(
            res.distances, res.dist_valid.astype(jnp.float32),
            weight=self.cfg.state_distance_merge_weight,
        )

    def integrate_with_state_distance(self) -> bool:
        """Reference ``integrate_with_state_distance`` (state_evolution.py:520-544)
        scales evolution-projector biases — but the reference's projector dict is
        never populated (SURVEY.md §5 quirk 3), so its live behavior is a no-op.
        Parity mode reproduces the no-op; fix mode routes to the REAL projectors
        (``modules/lifecycle.py``), with the bias-scaling strength honoring the
        declared-but-unread ``lifecycle_weight`` key (reference hard-codes 0.1)."""
        dm = self.state_distance.get_distance_matrix()
        if self.cfg.parity_mode or not self.cfg.lifecycle_modeling_enabled:
            return True
        from team_tpu.modules import lifecycle

        if getattr(self, "_evo_projectors", None) is None:
            key, self._rng = _split(self._rng)
            self._evo_projectors = lifecycle.init_evolution_projectors(
                key, self.dims.feature_dim)
        self._evo_projectors = lifecycle.integrate_with_state_distance(
            self._evo_projectors, dm, scale=float(self.cfg.lifecycle_weight))
        return True

    def evolution_trajectory(self, src_state: int, src_feat):
        """Simulated src→adult feature trajectory over the fix-mode projectors
        (reference ``model_evolution_trajectory``, dead there — live here), with
        the step count honoring ``state_evolution_steps``."""
        from team_tpu.modules import lifecycle

        if getattr(self, "_evo_projectors", None) is None:
            return None
        return lifecycle.evolution_trajectory(
            self._evo_projectors, src_state, src_feat,
            num_steps=max(2, int(self.cfg.state_evolution_steps)))

    def _eval_zero_shot(self):
        """Zero-shot eval with the full-test-set backbone features cached once
        across ALL tasks (frozen towers; only the projections change per task).
        Math identical to the base implementation."""
        total = self.data_manager.get_total_classnum()
        if getattr(self, "_zs_feats", None) is None:
            ds = self.data_manager.get_dataset(np.arange(0, total), source="test", mode="test")
            if self._cacheable(ds):
                # serve from (and populate) the RUN-WIDE frozen-feature cache:
                # the per-task test sets are subsets of this all-class set, so
                # their _test_feats extractions become pure cache hits — each
                # test image is encoded exactly once per run (base.py:144-149)
                self._zs_feats = (self._cached_features(ds, EVAL_BATCH),
                                  np.asarray(ds.labels))
            else:  # pragma: no cover — test pipelines are deterministic
                from team_tpu.learners.base import _fetch_concat

                loader = self._loader(ds, batch_size=EVAL_BATCH)
                pending = [(int(b.get("valid", len(b["label"]))), b["label"],
                            self.backbone.encode_image(jnp.asarray(b["image"])))
                           for b in loader]  # dispatch all batches, fetch ONCE
                stacked, offs = _fetch_concat([f for _, _, f in pending])
                self._zs_feats = (
                    np.concatenate([stacked[o:o + v]
                                    for (v, _, _), o in zip(pending, offs)]),
                    np.concatenate([lab[:v] for v, lab, _ in pending]))

        text_features = self._zero_shot_text_features()
        feats, labels = self._zs_feats
        tr = self._eval_params()
        y_pred = []
        for start, v in _padded_slices(len(labels), EVAL_BATCH):
            img = _project_image_jit(
                tr,
                jnp.asarray(_pad_rows(feats[start : start + v], EVAL_BATCH)), self.ctx)
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            logits = img @ text_features.T
            k = min(self.topk, logits.shape[1])
            preds = np.asarray(jax.lax.top_k(logits, k)[1])[:v]
            y_pred.append(preds)
        return np.concatenate(y_pred), labels

    def _visualize_evolution_paths(self) -> None:
        if not self.cfg.enable_plots:
            return
        try:
            from team_tpu.analysis.plots import visualize_evolution_path

            visualize_evolution_path(
                self.buffers, save_dir=f"{self.cfg.results_dir}/task_{self._cur_task}/evolution"
            )
        except Exception as e:
            logging.error("evolution-path visualization failed: %s", e)

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------
    def _compute_accuracy(self) -> float:
        feats, labels, _ = self._test_feats
        tr = self._eval_params()
        n = len(labels)
        k = n // EVAL_BATCH
        correct = 0
        offset = 0
        for chunk in (_pow2_chunks(k) if k > 0 else []):
            fb = feats[offset * EVAL_BATCH: (offset + chunk) * EVAL_BATCH]
            lb = labels[offset * EVAL_BATCH: (offset + chunk) * EVAL_BATCH]
            correct += int(eval_correct_scan(
                tr, jnp.asarray(fb.reshape(chunk, EVAL_BATCH, -1)),
                jnp.asarray(lb.reshape(chunk, EVAL_BATCH).astype(np.int32)), self.ctx))
            offset += chunk
        for start, v in _padded_slices(n - k * EVAL_BATCH, EVAL_BATCH):
            start += k * EVAL_BATCH
            f = jnp.asarray(_pad_rows(feats[start : start + v], EVAL_BATCH))
            logits = eval_logits(tr, f, self.ctx)
            preds = np.asarray(jnp.argmax(logits, axis=1))[:v]
            correct += int((preds == labels[start : start + v]).sum())
        return float(np.around(correct * 100 / n, decimals=2))

    def _eval_cnn(self, loader):
        # reuse the cached frozen-backbone test features when the loader is the
        # task's unshuffled test loader (exact: same dataset, same order)
        if loader is self.test_loader and getattr(self, "_test_feats", None) is not None:
            feats, labels, _ = self._test_feats
            tr = self._eval_params()
            y_pred = []
            for start, v in _padded_slices(len(labels), EVAL_BATCH):
                logits = eval_logits(
                    tr,
                    jnp.asarray(_pad_rows(feats[start : start + v], EVAL_BATCH)),
                    self.ctx,
                )
                k = min(self.topk, self._total_classes)
                preds = np.asarray(jax.lax.top_k(logits, k)[1])[:v]
                if k < self.topk:
                    preds = np.concatenate(
                        [preds, np.zeros((preds.shape[0], self.topk - k), dtype=preds.dtype)],
                        axis=1,
                    )
                y_pred.append(preds)
            return np.concatenate(y_pred), labels
        from team_tpu.learners.base import _fetch_concat

        y_pred, y_true = [], []
        tr = self._eval_params()
        k = min(self.topk, self._total_classes)
        pending = []
        for batch in loader:  # dispatch encode+logits+topk, then fetch ONCE
            v = int(batch.get("valid", len(batch["label"])))
            basic = self.backbone.encode_image(jnp.asarray(batch["image"]))
            pending.append((v, batch["label"],
                            jax.lax.top_k(eval_logits(tr, basic, self.ctx),
                                          k)[1]))
        stacked, offs = _fetch_concat([p for _, _, p in pending])
        for (v, lab, p), o in zip(pending, offs):
            preds = stacked[o:o + p.shape[0]]
            if k < self.topk:  # pad (reference proof.py:596-600)
                preds = np.concatenate(
                    [preds, np.zeros((preds.shape[0], self.topk - k), dtype=preds.dtype)], axis=1
                )
            y_pred.append(preds[:v])
            y_true.append(lab[:v])
        return np.concatenate(y_pred), np.concatenate(y_true)


def _split(key):
    k1, k2 = jax.random.split(key)
    return k1, k2


def _padded_slices(n: int, batch: int):
    """(start, valid) pairs covering [0, n) in FIXED-size batches; the final
    slice is padded by the caller (one compiled shape per consumer — remote
    compiles cost minutes, CLAUDE.md)."""
    for start in range(0, n, batch):
        yield start, min(batch, n - start)


def _pad_rows(x: np.ndarray, batch: int) -> np.ndarray:
    if len(x) == batch:
        return x
    return np.concatenate([x, np.repeat(x[:1], batch - len(x), axis=0)])


def _pow2_chunks(k: int):
    """Decompose k into descending powers of two (11 -> [8, 2, 1]): bounds the
    set of compiled scan lengths to log2(K_max) across the whole run."""
    out = []
    p = 1 << (k.bit_length() - 1) if k > 0 else 0
    while k > 0:
        while p > k:
            p >>= 1
        out.append(p)
        k -= p
    return out


@jax.jit
def _project_image_jit(tr, basic, ctx):
    return project_image(tr, basic, ctx, grad_current_only=False)


@jax.jit
def _project_text_jit(tr, basic, ctx):
    return project_text(tr, basic, ctx, grad_current_only=False)
