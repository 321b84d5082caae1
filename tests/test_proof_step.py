"""Composed-step guard: the jitted PROOF train step's loss must equal a
straight-line recomputation of ``ce + clip + 0.3·unicl`` from the same pieces,
and one optimizer step must only move the trainable-by-policy leaves."""

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.config import Config
from team_tpu.learners.proof_net import (
    ProofDims,
    TaskContext,
    build_train_step,
    classification_logits,
    init_buffers,
    init_proof_params,
    make_optimizer,
    project_image,
    project_text,
    proof_loss,
    tri_modal_forward,
)
from team_tpu.losses.clip_loss import clip_loss
from team_tpu.losses.unicl import unicl_loss


def _setup(rng):
    dims = ProofDims(feature_dim=8, max_classes=6, max_tasks=3, ctx_len=2)
    tr, aux = init_proof_params(jax.random.PRNGKey(0), dims, 2.0)
    ctx = TaskContext(
        task_mask=jnp.asarray([1.0, 1.0, 0.0]),
        cur_onehot=jnp.asarray([0.0, 1.0, 0.0]),
        class_mask=jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32),
        class_text_basic=jax.random.normal(jax.random.PRNGKey(1), (6, 8)),
    )
    buffers = init_buffers(dims)
    batch = {
        "feat": jnp.asarray(rng.standard_normal((5, 8)).astype(np.float32)),
        "label": jnp.asarray([0, 1, 2, 3, 1], jnp.int32),
        "stage_id": jnp.asarray([1, 4, 3, 4, 1], jnp.int32),
    }
    return dims, tr, aux, ctx, buffers, batch


def test_proof_loss_composition(rng):
    dims, tr, aux, ctx, buffers, batch = _setup(rng)
    rng_key = jax.random.PRNGKey(7)
    epoch = jnp.asarray(1)
    kwargs = dict(max_epoch=4, temperature=0.07, instance_weight=1.0,
                  category_weight=0.5, unicl_weight=0.3, num_states=10,
                  parity_no_grad_ce=True, clip_axis=None)
    total, stats = proof_loss(tr, batch, ctx, buffers, rng_key, epoch, **kwargs)

    # straight-line recomputation
    logits = classification_logits(tr, batch["feat"], ctx)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.mean(jnp.take_along_axis(logp, batch["label"][:, None], axis=1))
    basic_txt = ctx.class_text_basic[batch["label"]]
    img_f, txt_f, st_f, _, scale = tri_modal_forward(
        tr, batch["feat"], basic_txt, batch["stage_id"], buffers.img_prototypes,
        ctx, rng=rng_key, deterministic=False)

    def norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    clip_v = clip_loss(norm(project_image(tr, batch["feat"], ctx)),
                       norm(project_text(tr, basic_txt, ctx)), scale)
    unicl_v, _ = unicl_loss(img_f, txt_f, st_f, batch["label"], batch["stage_id"],
                            temperature=0.07, epoch=epoch, max_epoch=4,
                            evolution_embeddings=buffers.evolution_embeddings,
                            evolution_valid=buffers.evolution_valid)
    expected = ce + clip_v + 0.3 * unicl_v
    np.testing.assert_allclose(float(total), float(expected), rtol=1e-5)
    np.testing.assert_allclose(float(stats.ce_loss), float(ce), rtol=1e-5)


def test_train_step_freeze_policy(rng):
    dims, tr, aux, ctx, buffers, batch = _setup(rng)
    cfg = Config(tuned_epoch=4, optimizer="adam", init_lr=0.01, weight_decay=0.01,
                 parity_mode=True, max_classes=6, max_tasks=3,
                 context_prompt_length_per_task=2)
    tx = make_optimizer(cfg)
    step = build_train_step(cfg, dims, tx)
    opt_state = tx.init(tr)
    new_tr, _, stats = step(tr, opt_state, batch, ctx, buffers,
                            jax.random.PRNGKey(3), jnp.asarray(0))
    # frozen per-task slices are bit-identical (no grads AND no weight decay)
    np.testing.assert_array_equal(np.asarray(new_tr["proj_img"]["w"][0]),
                                  np.asarray(tr["proj_img"]["w"][0]))
    np.testing.assert_array_equal(np.asarray(new_tr["proj_img"]["w"][2]),
                                  np.asarray(tr["proj_img"]["w"][2]))
    np.testing.assert_array_equal(np.asarray(new_tr["context_prompts"][0]),
                                  np.asarray(tr["context_prompts"][0]))
    # current-task slices and shared modules move
    assert not np.allclose(np.asarray(new_tr["proj_img"]["w"][1]),
                           np.asarray(tr["proj_img"]["w"][1]))
    assert not np.allclose(np.asarray(new_tr["sel_attn"]["w_qs"]),
                           np.asarray(tr["sel_attn"]["w_qs"]))
    assert not np.allclose(np.asarray(new_tr["state_embed"]),
                           np.asarray(tr["state_embed"]))
    # logit_scale trains (only backbone param with grads, proof.py:353-356)
    assert float(new_tr["logit_scale"]) != float(tr["logit_scale"])
    # parity quirk: CE carries no gradient -> ce>0 but grads flow via clip/unicl only
    assert float(stats.ce_loss) > 0.0


def test_train_step_grads_zero_for_ce_only_path(rng):
    """With clip+unicl removed (weights 0 would still leave clip...), verify the
    no-grad CE directly: grads of proof_loss w.r.t. text projections through the
    classification branch are zero when parity_no_grad_ce=True."""
    dims, tr, aux, ctx, buffers, batch = _setup(rng)
    kwargs = dict(max_epoch=4, temperature=0.07, instance_weight=1.0,
                  category_weight=0.5, unicl_weight=0.0, num_states=10,
                  parity_no_grad_ce=True, clip_axis=None)

    def ce_only(tr):
        total, stats = proof_loss(tr, batch, ctx, buffers, jax.random.PRNGKey(0),
                                  jnp.asarray(0), **kwargs)
        return stats.ce_loss

    g = jax.grad(ce_only)(tr)
    for leaf in jax.tree_util.tree_leaves(g):
        assert float(jnp.abs(leaf).max()) == 0.0


def test_train_step_no_retrace_across_tasks(rng):
    """One compiled step serves every task: different masks/contexts must not
    trigger retracing (the whole point of the preallocated banks)."""
    dims, tr, aux, ctx, buffers, batch = _setup(rng)
    cfg = Config(tuned_epoch=4, optimizer="adam", init_lr=0.01, max_classes=6,
                 max_tasks=3, context_prompt_length_per_task=2)
    tx = make_optimizer(cfg)
    step = build_train_step(cfg, dims, tx)
    opt_state = tx.init(tr)
    tr1, opt1, _ = step(tr, opt_state, batch, ctx, buffers, jax.random.PRNGKey(0), jnp.asarray(0))
    # simulate the next task: different masks, same shapes
    ctx2 = ctx._replace(
        task_mask=jnp.asarray([1.0, 1.0, 1.0]),
        cur_onehot=jnp.asarray([0.0, 0.0, 1.0]),
        class_mask=jnp.asarray([1, 1, 1, 1, 1, 1], jnp.float32),
    )
    step(tr1, opt1, batch, ctx2, buffers, jax.random.PRNGKey(1), jnp.asarray(1))
    assert step._cache_size() == 1


def test_jitted_init_bitwise_equals_eager():
    """The learner builds params+buffers in ONE jitted graph (learners/
    proof.py ensure-initialized — ~100 eager dispatches were 135.9 s of
    tunnel time per protocol); the on-chip curve goldens assume the jitted
    values are BITWISE the historical eager ones. On TPU that held only
    after an optimization_barrier in init_fusion stopped `normal()*std`
    from FMA-fusing into the erf_inv chain (scripts/r5_init_bitwise_probe.py
    bisected it). Pin the invariant on CPU too so a barrier regression or a
    new drifting init leaf turns the suite red without a chip."""
    dims = ProofDims(feature_dim=16, max_classes=6, max_tasks=3, ctx_len=2,
                     num_states=4, gcn_layers=2)
    key = jax.random.PRNGKey(42)
    ls = 4.6052

    eager = (init_proof_params(key, dims, ls), init_buffers(dims))
    jitted = jax.jit(lambda k: (init_proof_params(k, dims, ls),
                                init_buffers(dims)))(key)

    flat_e, tree_e = jax.tree_util.tree_flatten_with_path(eager)
    flat_j, tree_j = jax.tree_util.tree_flatten_with_path(jitted)
    assert tree_e == tree_j
    for (path_e, leaf_e), (_, leaf_j) in zip(flat_e, flat_j):
        a, b = np.asarray(leaf_e), np.asarray(leaf_j)
        assert a.dtype == b.dtype and a.shape == b.shape, path_e
        np.testing.assert_array_equal(a, b, err_msg=str(path_e))
