"""PROOF/TEAM network: pure functional forward + jitted train step.

Counterpart of reference ``Proof_Net`` (``utils/inc_net.py:342-618``) and the
PROOF training loop (``models/proof.py:348-517``), redesigned TPU-first:

* Per-task growth (projections ``:424-434``, context prompts ``:391-399``,
  prototypes ``:371-389``) is preallocated into fixed banks with masks — ONE
  compiled train step serves every task, no retracing.
* The frozen backbone is factored out of the step: the step consumes cached
  backbone features. The reference re-encodes each image three times per step
  (classification ``proof.py:415-418``, tri-modal ``:424-425``, clip-loss
  ``:428-430``) and re-encodes all class texts every step; since the backbone is
  frozen and the IIMinsects pipeline is deterministic, caching is numerically
  exact and removes ~95% of the step FLOPs.
* CE-without-gradient parity quirk (reference wraps the classification forward
  in ``no_grad``, ``proof.py:415``): the classification logits are computed
  under ``stop_gradient`` in parity mode.
* Gradients reach only the newest task's projection/prompt slices (reference
  freeze policy ``utils/inc_net.py:494-516``) via stop-gradient one-hots, and
  frozen slices are restored post-update so optimizer weight decay cannot touch
  them (torch skips parameters without grads).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from team_tpu.losses.clip_loss import clip_loss
from team_tpu.losses.unicl import unicl_loss
from team_tpu.modules.fusion import fusion_attention, init_fusion
from team_tpu.modules.projections import apply_projection_bank, init_projection_bank
from team_tpu.modules.temporal_gcn import init_temporal_gcn

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class ProofDims:
    feature_dim: int
    max_classes: int
    max_tasks: int
    num_states: int = 10
    ctx_len: int = 10           # context_prompt_length_per_task
    gcn_layers: int = 2
    gcn_hidden_dim: int = 0     # 0 -> reference default feature_dim // 2

    @property
    def gcn_hidden(self) -> int:
        return self.gcn_hidden_dim or self.feature_dim // 2


class TaskContext(NamedTuple):
    """Per-task constants fed to the jitted step (all device arrays)."""

    task_mask: jax.Array        # [T] tasks created so far
    cur_onehot: jax.Array       # [T] newest task
    class_mask: jax.Array       # [C] classes seen so far
    class_text_basic: jax.Array  # [C, D] frozen-backbone features of per-class prompts


class ProofBuffers(NamedTuple):
    """Non-parameter state evolved by the temporal stack."""

    img_prototypes: jax.Array       # [C, D]
    proto_state: jax.Array          # [C, S, D]
    proto_mask: jax.Array           # [C, S]
    evolution_embeddings: jax.Array  # [C, D]
    evolution_valid: jax.Array      # [C]
    lifecycle_types: jax.Array      # [C]


def init_buffers(dims: ProofDims) -> ProofBuffers:
    c, s, d = dims.max_classes, dims.num_states, dims.feature_dim
    return ProofBuffers(
        img_prototypes=jnp.zeros((c, d)),
        proto_state=jnp.zeros((c, s, d)),
        proto_mask=jnp.zeros((c, s)),
        evolution_embeddings=jnp.zeros((c, d)),
        evolution_valid=jnp.zeros((c,), dtype=bool),
        lifecycle_types=jnp.full((c,), 3, dtype=jnp.int32),  # UNKNOWN
    )


def init_proof_params(key: jax.Array, dims: ProofDims, logit_scale_init: float
                      ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (trainable, aux_frozen). The CLIP tower params live with the
    backbone runtime; ``logit_scale`` is the only backbone parameter that trains
    (reference ``proof.py:353-356``)."""
    ks = jax.random.split(key, 8)
    d = dims.feature_dim
    trainable = {
        "proj_img": init_projection_bank(ks[0], dims.max_tasks, d),
        "proj_text": init_projection_bank(ks[1], dims.max_tasks, d),
        "proj_state": init_projection_bank(ks[2], dims.max_tasks, d),
        "sel_attn": init_fusion(ks[3], 1, d, d, d),
        # reference creates each task's prompt with torch.randn (inc_net.py:394)
        "context_prompts": jax.random.normal(ks[4], (dims.max_tasks, dims.ctx_len, d)),
        # nn.Embedding default init: N(0, 1) (state_evolution.py:16)
        "state_embed": jax.random.normal(ks[5], (dims.num_states, d)),
        "logit_scale": jnp.asarray(logit_scale_init, jnp.float32),
    }
    h = dims.gcn_hidden
    aux = {
        "temporal_gcn": init_temporal_gcn(ks[6], d, h, dims.gcn_layers),
        # lifecycle-type detector MLP (state_evolution.py:37-43; defined but
        # unused by the live path — kept for capability parity)
        "evolution_detector": {
            "fc1": _linear_init(jax.random.fold_in(ks[7], 0), 2 * d, h),
            "ln": {"scale": jnp.ones((h,)), "bias": jnp.zeros((h,))},
            "fc2": _linear_init(jax.random.fold_in(ks[7], 1), h, 3),
        },
    }
    return trainable, aux


def _linear_init(key, d_in, d_out):
    bound = 1.0 / jnp.sqrt(jnp.asarray(float(d_in)))
    kw, kb = jax.random.split(key)
    return {"w": jax.random.uniform(kw, (d_in, d_out), minval=-bound, maxval=bound),
            "b": jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound)}


def _normalize(x, axis=-1):
    # grad-safe at ||x|| = 0 (see team_tpu.losses.unicl._normalize): zero-padded
    # prototype rows flow through this with gradients attached
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, 1e-24))


# ---------------------------------------------------------------------------
# functional forward pieces (reference Proof_Net methods)
# ---------------------------------------------------------------------------

def project_image(tr, basic: jax.Array, ctx: TaskContext, grad_current_only: bool = True):
    """``encode_image`` projection sum (reference ``inc_net.py:401-407``)."""
    return apply_projection_bank(tr["proj_img"], basic, ctx.task_mask,
                                 ctx.cur_onehot if grad_current_only else None)


def project_text(tr, basic: jax.Array, ctx: TaskContext, grad_current_only: bool = True):
    return apply_projection_bank(tr["proj_text"], basic, ctx.task_mask,
                                 ctx.cur_onehot if grad_current_only else None)


def encode_state(tr, state_ids: jax.Array, ctx: TaskContext, normalize: bool = True):
    """``encode_state`` (reference ``inc_net.py:518-526``)."""
    emb = tr["state_embed"][state_ids]
    feats = apply_projection_bank(tr["proj_state"], emb, ctx.task_mask, ctx.cur_onehot)
    return _normalize(feats) if normalize else feats


def encode_prototypes(tr, img_prototypes: jax.Array, ctx: TaskContext, normalize: bool = True):
    """``encode_prototpyes`` [sic] (reference ``inc_net.py:417-422``)."""
    feats = apply_projection_bank(tr["proj_img"], img_prototypes, ctx.task_mask, ctx.cur_onehot)
    return _normalize(feats) if normalize else feats


def classification_logits(tr, basic_img: jax.Array, ctx: TaskContext) -> jax.Array:
    """``forward_for_classification`` (reference ``proof.py:519-536``): cosine
    logits between projected image features and projected all-class text
    features, masked to active classes."""
    img = _normalize(project_image(tr, basic_img, ctx))
    txt = _normalize(project_text(tr, ctx.class_text_basic, ctx))
    logits = img @ txt.T
    return jnp.where(ctx.class_mask[None, :] > 0, logits, NEG_INF)


def tri_modal_forward(
    tr,
    basic_img: jax.Array,
    basic_txt: jax.Array,
    state_ids: jax.Array,
    img_prototypes: jax.Array,
    ctx: TaskContext,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
):
    """``forward_tri_modal`` (reference ``inc_net.py:528-580``): fuse
    [image, text, state, prototypes, context prompts] through the 1-head
    attention and slice the per-modality outputs back out."""
    b = basic_img.shape[0]
    d = basic_img.shape[-1]
    img = _normalize(project_image(tr, basic_img, ctx))
    txt = _normalize(project_text(tr, basic_txt, ctx))
    st = encode_state(tr, state_ids, ctx, normalize=True)
    proto = encode_prototypes(tr, img_prototypes, ctx, normalize=True)      # [C, D]
    prompts = tr["context_prompts"]
    t, l = prompts.shape[0], prompts.shape[1]
    # freeze old prompts (reference update_context_prompt, inc_net.py:391-396)
    keep = ctx.cur_onehot[:, None, None]
    prompts = jax.lax.stop_gradient(prompts) * (1 - keep) + prompts * keep
    ctx_tokens = prompts.reshape(t * l, d)

    c = proto.shape[0]
    seq = jnp.concatenate(
        [
            img[:, None, :],
            txt[:, None, :],
            st[:, None, :],
            jnp.broadcast_to(proto[None], (b, c, d)),
            jnp.broadcast_to(ctx_tokens[None], (b, t * l, d)),
        ],
        axis=1,
    )
    key_mask = jnp.concatenate(
        [jnp.ones(3), ctx.class_mask, jnp.repeat(ctx.task_mask, l)]
    )
    out = fusion_attention(tr["sel_attn"], seq, key_mask, rng=rng, deterministic=deterministic)
    img_f = out[:, 0]
    txt_f = out[:, 1]
    st_f = out[:, 2]
    proto_out = out[:, 3 : 3 + c]
    cmask = ctx.class_mask[None, :, None]
    proto_f = jnp.sum(proto_out * cmask, axis=1) / jnp.maximum(jnp.sum(cmask, axis=1), 1.0)
    return img_f, txt_f, st_f, proto_f, jnp.exp(tr["logit_scale"])


def bi_modal_forward(
    tr,
    basic_img: jax.Array,
    basic_txt: jax.Array,
    img_prototypes: jax.Array,
    ctx: TaskContext,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
):
    """``Proof_Net.forward`` / ``forward_transformer`` (reference
    ``inc_net.py:436-492``): fuse [image, batch texts, prototypes, context
    prompts] (no state token) and mean the text/prototype outputs over the
    batch dimension, as the reference does (``:458-459``)."""
    b = basic_img.shape[0]
    d = basic_img.shape[-1]
    img = _normalize(project_image(tr, basic_img, ctx))
    txt = _normalize(project_text(tr, basic_txt, ctx))
    proto = encode_prototypes(tr, img_prototypes, ctx, normalize=True)
    prompts = tr["context_prompts"]
    t, l = prompts.shape[0], prompts.shape[1]
    ctx_tokens = prompts.reshape(t * l, d)
    n_txt = txt.shape[0]
    c = proto.shape[0]
    seq = jnp.concatenate(
        [
            img[:, None, :],
            jnp.broadcast_to(txt[None], (b, n_txt, d)),
            jnp.broadcast_to(proto[None], (b, c, d)),
            jnp.broadcast_to(ctx_tokens[None], (b, t * l, d)),
        ],
        axis=1,
    )
    key_mask = jnp.concatenate(
        [jnp.ones(1), jnp.ones(n_txt), ctx.class_mask, jnp.repeat(ctx.task_mask, l)]
    )
    out = fusion_attention(tr["sel_attn"], seq, key_mask, rng=rng, deterministic=deterministic)
    img_f = out[:, 0]
    txt_f = jnp.mean(out[:, 1 : 1 + n_txt], axis=0)              # mean over batch (:458)
    proto_out = out[:, 1 + n_txt : 1 + n_txt + c]
    proto_f = jnp.mean(proto_out, axis=0)                        # mean over batch (:459)
    return img_f, txt_f, jnp.exp(tr["logit_scale"]), proto_f


# ---------------------------------------------------------------------------
# loss + train step
# ---------------------------------------------------------------------------

class StepStats(NamedTuple):
    total_loss: jax.Array
    ce_loss: jax.Array
    clip_loss: jax.Array
    unicl_loss: jax.Array
    correct: jax.Array


def proof_loss(
    tr,
    batch: Dict[str, jax.Array],
    ctx: TaskContext,
    buffers: ProofBuffers,
    rng: jax.Array,
    epoch: jax.Array,
    *,
    max_epoch: int,
    temperature: float,
    instance_weight: float,
    category_weight: float,
    unicl_weight: float,
    num_states: int,
    parity_no_grad_ce: bool,
    clip_axis: Optional[str] = None,
    clip_shards: int = 1,
    clip_local: bool = False,
) -> Tuple[jax.Array, StepStats]:
    basic_img = batch["feat"]            # [B, D] frozen-backbone image features
    targets = batch["label"]
    state_ids = batch["stage_id"]
    # pad-don't-drop: optional [B] row validity (1 = real sample). Every term
    # masks padded rows, so a padded batch's loss/grads equal the unpadded ones.
    vm = batch.get("valid_mask")
    basic_txt = ctx.class_text_basic[targets]  # per-sample prompt features

    # 1) classification branch — no_grad in the reference (proof.py:415-418)
    logits = classification_logits(tr, basic_img, ctx)
    if parity_no_grad_ce:
        logits = jax.lax.stop_gradient(logits)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_row_ce = -jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
    if vm is None:
        ce = jnp.mean(per_row_ce)
    else:
        ce = jnp.sum(per_row_ce * vm) / jnp.maximum(jnp.sum(vm), 1.0)

    # 2) tri-modal contrastive branch
    img_f, txt_f, st_f, _, logit_scale = tri_modal_forward(
        tr, basic_img, basic_txt, state_ids, buffers.img_prototypes, ctx,
        rng=rng, deterministic=False,
    )

    # 3) CLIP loss on pre-attention projected features (proof.py:428-431)
    img_norm = _normalize(project_image(tr, basic_img, ctx))
    txt_norm = _normalize(project_text(tr, basic_txt, ctx))
    if clip_shards > 1:
        # fix-mode ``global_clip_loss=False``: per-shard contrastive loss. The
        # reshape is shard-layout-aligned (batch dim split over the data axis),
        # so XLA keeps each sub-loss local — no all-gather traffic.
        d = img_norm.shape[-1]
        vm_s = (jnp.ones((img_norm.shape[0],)) if vm is None else vm).reshape(clip_shards, -1)
        shard_losses = jax.vmap(
            lambda a, b, v: clip_loss(a, b, logit_scale, valid_mask=v)
        )(img_norm.reshape(clip_shards, -1, d), txt_norm.reshape(clip_shards, -1, d), vm_s)
        # clip_loss contract: per-shard losses aggregate weighted by the
        # shards' VALID counts (a pure-padding tail shard returns 0 and must
        # carry zero weight, or padding dilutes the batch loss). Equal to the
        # plain mean when every shard is full.
        counts = jnp.sum(vm_s, axis=1)
        clip_val = jnp.sum(shard_losses * counts) / jnp.maximum(jnp.sum(counts), 1.0)
    else:
        # cfg.local_loss (open_clip variant): per-shard logits against the
        # gathered features — only meaningful under an explicit gathered axis
        clip_val = clip_loss(img_norm, txt_norm, logit_scale, axis_name=clip_axis,
                             local_loss=clip_local, valid_mask=vm)

    # 4) UniCL tri-modal loss on post-attention features (proof.py:434-441)
    unicl_val, _ = unicl_loss(
        img_f, txt_f, st_f, targets, state_ids,
        temperature=temperature, epoch=epoch, max_epoch=max_epoch,
        evolution_embeddings=buffers.evolution_embeddings,
        evolution_valid=buffers.evolution_valid,
        num_states=num_states,
        instance_weight=instance_weight, category_weight=category_weight,
        valid_mask=vm,
    )

    total = ce + clip_val + unicl_weight * unicl_val
    preds = jnp.argmax(logits, axis=1)
    hits = (preds == targets) if vm is None else (preds == targets) * (vm > 0)
    stats = StepStats(total, ce, clip_val, unicl_val, jnp.sum(hits))
    return total, stats


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Per-task optimizer (reference rebuilds it each task, proof.py:358-363)."""
    if cfg.optimizer == "sgd":
        return optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.sgd(learning_rate, momentum=cfg.momentum),
            )
        )(learning_rate=cfg.init_lr)
    # 'adam' -> AdamW (reference proof.py:360-361)
    return optax.inject_hyperparams(
        lambda learning_rate: optax.adamw(learning_rate, weight_decay=cfg.weight_decay)
    )(learning_rate=cfg.init_lr)


def cosine_lr(cfg, epoch: int) -> float:
    """CosineAnnealingLR stepped per epoch, T_max = tuned_epoch, eta_min = min_lr."""
    t = min(epoch, cfg.tuned_epoch)
    return cfg.min_lr + 0.5 * (cfg.init_lr - cfg.min_lr) * (
        1.0 + float(np.cos(np.pi * t / cfg.tuned_epoch))
    )


def lr_schedule(cfg, epoch: int) -> float:
    """Per-epoch learning rate honoring ``lr_scheduler``/``milestones``/``gamma``.

    The reference declares these JSON keys but always builds
    CosineAnnealingLR (``models/proof.py:363``); parity mode reproduces that.
    Fix mode honors: ``cosine`` (default), ``steplr``/``multisteplr``
    (``init_lr * gamma^(#milestones <= epoch)``), ``constant``."""
    sched = "cosine" if cfg.parity_mode else str(cfg.lr_scheduler).lower()
    if sched in ("steplr", "multisteplr", "step", "multi_step", "multistep"):
        factor = cfg.gamma ** sum(1 for m in cfg.milestones if epoch >= m)
        return float(cfg.init_lr * factor)
    if sched == "constant":
        return float(cfg.init_lr)
    return cosine_lr(cfg, epoch)


def restore_frozen_slices(new_tr, old_tr, cur_onehot):
    """Undo any optimizer drift (weight decay) on frozen per-task slices."""
    def mix(new, old, keep_shape):
        keep = cur_onehot.reshape(keep_shape)
        return old * (1 - keep) + new * keep

    out = dict(new_tr)
    for name in ("proj_img", "proj_text", "proj_state"):
        out[name] = {
            "w": mix(new_tr[name]["w"], old_tr[name]["w"], (-1, 1, 1)),
            "b": mix(new_tr[name]["b"], old_tr[name]["b"], (-1, 1)),
        }
    out["context_prompts"] = mix(new_tr["context_prompts"], old_tr["context_prompts"], (-1, 1, 1))
    return out


def _loss_kwargs(cfg, dims: ProofDims, clip_axis: Optional[str],
                 clip_shards: int) -> dict:
    temperature = cfg.temperature if not cfg.parity_mode else 0.07
    return dict(
        max_epoch=cfg.tuned_epoch,
        temperature=float(temperature),
        instance_weight=float(cfg.unicl_instance_weight if not cfg.parity_mode else 1.0),
        category_weight=float(cfg.unicl_category_weight if not cfg.parity_mode else 0.5),
        unicl_weight=float(cfg.unicl_loss_weight),
        num_states=dims.num_states,
        parity_no_grad_ce=bool(cfg.parity_mode),
        clip_axis=clip_axis,
        clip_shards=int(clip_shards),
        clip_local=bool(cfg.get("local_loss", False)),
    )


def build_train_step(cfg, dims: ProofDims, tx: optax.GradientTransformation,
                     clip_axis: Optional[str] = None, clip_shards: int = 1):
    """Compile-once train step over cached backbone features."""

    kwargs = _loss_kwargs(cfg, dims, clip_axis, clip_shards)

    def _step(tr, opt_state, batch, ctx, buffers, rng, epoch):
        (loss, stats), grads = jax.value_and_grad(proof_loss, has_aux=True)(
            tr, batch, ctx, buffers, rng, epoch, **kwargs
        )
        updates, new_opt_state = tx.update(grads, opt_state, tr)
        new_tr = optax.apply_updates(tr, updates)
        new_tr = restore_frozen_slices(new_tr, tr, ctx.cur_onehot)
        return new_tr, new_opt_state, stats

    return jax.jit(_step)


def build_epoch_runner(cfg, dims: ProofDims, tx: optax.GradientTransformation,
                       clip_axis: Optional[str] = None, clip_shards: int = 1):
    """One jitted call per EPOCH: ``lax.scan`` over stacked full batches.

    Identical math to dispatching the single train step per batch (same
    optimizer state threading, same per-batch rngs) but one host→device
    round-trip per epoch instead of per step — the per-dispatch tunnel latency
    on this environment (~100ms) would otherwise dominate the tiny cached-
    feature steps. The final (non-full) batch is padded and masked
    (``valid_mask``), so every batch has one compiled shape."""

    kwargs = _loss_kwargs(cfg, dims, clip_axis, clip_shards)

    @jax.jit
    def run_epoch(tr, opt_state, batches, ctx, buffers, rngs, epoch):
        """``batches``: dict of [K, B, ...] stacked full batches; ``rngs``: [K, 2]."""

        def body(carry, xs):
            tr, opt_state = carry
            batch, rng = xs
            (loss, stats), grads = jax.value_and_grad(proof_loss, has_aux=True)(
                tr, batch, ctx, buffers, rng, epoch, **kwargs
            )
            updates, new_opt = tx.update(grads, opt_state, tr)
            new_tr = optax.apply_updates(tr, updates)
            new_tr = restore_frozen_slices(new_tr, tr, ctx.cur_onehot)
            return (new_tr, new_opt), stats

        (tr, opt_state), stats = jax.lax.scan(body, (tr, opt_state), (batches, rngs))
        totals = StepStats(
            total_loss=jnp.sum(stats.total_loss),
            ce_loss=jnp.sum(stats.ce_loss),
            clip_loss=jnp.sum(stats.clip_loss),
            unicl_loss=jnp.sum(stats.unicl_loss),
            correct=jnp.sum(stats.correct),
        )
        return tr, opt_state, totals

    return run_epoch


@jax.jit
def eval_logits(tr, basic_img, ctx: TaskContext) -> jax.Array:
    """Deterministic classification logits for eval (attention dropout off)."""
    return classification_logits(tr, basic_img, ctx)


@jax.jit
def eval_correct_scan(tr, feats, labels, ctx: TaskContext) -> jax.Array:
    """Count correct top-1 predictions over stacked eval batches ``[K, B, D]`` /
    ``[K, B]`` in one dispatch."""

    def body(total, xs):
        f, y = xs
        preds = jnp.argmax(classification_logits(tr, f, ctx), axis=1)
        return total + jnp.sum(preds == y), None

    total, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), (feats, labels))
    return total
