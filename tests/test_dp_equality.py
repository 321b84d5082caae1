"""First-class data-parallel training (VERDICT r1 items 6 and 9).

* 8-device DP training must consume IDENTICAL data to single-device (pad and
  mask, never trim) and produce the same parameters/curves.
* Padded batches must contribute exactly the unpadded loss (masked losses).
* Multi-host data sharding index math (host_shard_indices / gather_host_shards
  / process_local_span) is deterministic, balanced, and invertible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.config import Config
from team_tpu.data.manager import DataManager
from team_tpu.learners.factory import get_model


def _run_learner(mesh_shape, seed=7, n_tasks=2, batch_size=16):
    cfg = Config(
        prefix="dpeq", dataset="synthetic_insects", model_name="proof",
        convnet_type="clip", init_cls=3, increment=3, memory_size=12,
        tuned_epoch=2, batch_size=batch_size, init_lr=0.01, optimizer="adam",
        context_prompt_length_per_task=2, seed=[seed], shuffle=True,
        log_dir="/tmp/team_logs_dpeq", mesh_shape=mesh_shape,
        extras={"tiny_backbone": True,
                # 5/stage -> task sizes 30 and 42: n % batch_size != 0 on every
                # task, so the padded+masked final batch is exercised in BOTH runs
                "dataset_kwargs": {"num_classes": 6, "img_size": 32,
                                   "train_per_stage": 5, "test_per_stage": 3}},
    )
    dm = DataManager(cfg.dataset, cfg.shuffle, seed, cfg.init_cls, cfg.increment,
                     **cfg.get("dataset_kwargs", {}))
    learner = get_model(cfg.model_name, cfg)
    curves = []
    for _ in range(n_tasks):
        learner.incremental_train(dm)
        cnn_accy, *_ = learner.eval_task()
        learner.after_task()
        curves.append(cnn_accy["top1"])
    return learner, curves


def test_dp_training_equals_single_device():
    """Same seed, same data (incl. the padded remainder batch): the 8-device DP
    run must match the single-device run's curves and parameters."""
    single, curves_single = _run_learner(mesh_shape=None)
    dp, curves_dp = _run_learner(mesh_shape=[8])

    assert curves_single == curves_dp, (curves_single, curves_dp)
    flat_s = jax.tree_util.tree_leaves(single.trainable)
    flat_d = jax.tree_util.tree_leaves(dp.trainable)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4)


def test_clip_loss_pad_invariance(rng):
    from team_tpu.losses.clip_loss import clip_loss

    b, d = 10, 16
    img = rng.standard_normal((b, d)).astype(np.float32)
    txt = rng.standard_normal((b, d)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    want = float(clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(30.0)))

    pad = 6
    img_p = np.concatenate([img, img[:pad]])  # pad rows repeat real samples
    txt_p = np.concatenate([txt, txt[:pad]])
    vm = np.concatenate([np.ones(b), np.zeros(pad)]).astype(np.float32)
    got = float(clip_loss(jnp.asarray(img_p), jnp.asarray(txt_p), jnp.asarray(30.0),
                          valid_mask=jnp.asarray(vm)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_unicl_pad_invariance(rng):
    from team_tpu.losses.unicl import unicl_loss

    b, d, c = 9, 12, 4
    img = rng.standard_normal((b, d)).astype(np.float32)
    txt = rng.standard_normal((b, d)).astype(np.float32)
    st = rng.standard_normal((b, d)).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 1, 2, 2, 3, 0])
    sids = np.array([1, 4, 1, 2, 4, 4, 4, 1, 2])
    evo = rng.standard_normal((c, d)).astype(np.float32)
    valid = np.array([True, True, False, True])

    kw = dict(temperature=0.07, epoch=jnp.asarray(3), max_epoch=10,
              evolution_embeddings=jnp.asarray(evo),
              evolution_valid=jnp.asarray(valid))
    want, want_parts = unicl_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(st),
        jnp.asarray(labels), jnp.asarray(sids), **kw)

    pad = 7
    def p(x):  # duplicate leading rows as padding
        return jnp.asarray(np.concatenate([x, x[:pad]]))
    vm = jnp.asarray(np.concatenate([np.ones(b), np.zeros(pad)]).astype(np.float32))
    got, got_parts = unicl_loss(p(img), p(txt), p(st),
                                p(labels), p(sids), valid_mask=vm, **kw)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(float(got_parts["instance_loss"]),
                               float(want_parts["instance_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(got_parts["category_loss"]),
                               float(want_parts["category_loss"]), rtol=1e-5)


def test_unicl_single_valid_row_is_zero(rng):
    """Reference returns 0 for batch_size==1; with padding that's dynamic."""
    from team_tpu.losses.unicl import unicl_loss

    d = 8
    x = rng.standard_normal((4, d)).astype(np.float32)
    vm = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    total, parts = unicl_loss(jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
                              jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
                              valid_mask=vm)
    assert float(total) == 0.0


# ---------------------------------------------------------------------------
# multi-host sharding index math (simulated hosts)
# ---------------------------------------------------------------------------

def test_host_shard_indices_partition():
    from team_tpu.parallel.mesh import host_shard_indices

    n, hosts = 103, 4
    shards = [host_shard_indices(n, h, hosts) for h in range(hosts)]
    # disjoint + covering
    allidx = np.concatenate(shards)
    assert len(allidx) == n
    assert len(np.unique(allidx)) == n
    # balanced within 1
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1
    # deterministic
    assert np.array_equal(shards[2], host_shard_indices(n, 2, hosts))
    # single host owns everything
    assert np.array_equal(host_shard_indices(n, 0, 1), np.arange(n))


def test_gather_host_shards_roundtrip(rng):
    from team_tpu.parallel.mesh import gather_host_shards, host_shard_indices

    n, hosts, d = 37, 3, 5
    data = rng.standard_normal((n, d)).astype(np.float32)
    chunks = [data[host_shard_indices(n, h, hosts)] for h in range(hosts)]
    out = gather_host_shards(chunks, n)
    np.testing.assert_array_equal(out, data)


def test_allgather_host_shards_single_process(rng):
    from team_tpu.parallel.mesh import allgather_host_shards

    x = rng.standard_normal((11, 3)).astype(np.float32)
    np.testing.assert_array_equal(allgather_host_shards(x, 11), x)


def test_process_local_span_covers_batch_dim():
    from team_tpu.parallel.mesh import MeshContext, make_mesh, process_local_span

    mesh = make_mesh((8,), ("data",))
    ctx = MeshContext(mesh)
    lo, hi = process_local_span(ctx.stacked_batch_sharding, (4, 16, 3), dim=1)
    assert (lo, hi) == (0, 16)  # single process owns every row


def test_loader_indices_restriction(rng):
    from team_tpu.data.datasets import get_idata
    from team_tpu.data.loader import ArrayLoader
    from team_tpu.data.manager import TeamDataset

    idata = get_idata("synthetic_insects", num_classes=4, img_size=32,
                      train_per_stage=4, test_per_stage=2)
    idata.download_data()
    ds = TeamDataset(idata.train_data, idata.train_targets, idata.train_stages,
                     mode="test", use_path=False)
    rows = np.array([1, 5, 9, 13, 17])
    loader = ArrayLoader(ds, batch_size=3, image_size=32, indices=rows, pad_last=False)
    got = np.concatenate([b["index"] for b in loader])
    np.testing.assert_array_equal(got, rows)


def test_clip_loss_gathered_pad_invariance(rng):
    """valid_mask must also hold in the all_gather (axis_name) branches:
    padded rows excluded from means AND negative sets across shards."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from team_tpu.losses.clip_loss import clip_loss
    from team_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((8,), ("data",))
    b, d = 12, 16
    img = rng.standard_normal((b, d)).astype(np.float32)
    txt = rng.standard_normal((b, d)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    scale = jnp.asarray(20.0)
    ref = float(clip_loss(jnp.asarray(img), jnp.asarray(txt), scale))

    pad = 16 - b  # pad to 16 rows = 2 per shard
    img_p = jnp.asarray(np.concatenate([img, img[:pad]]))
    txt_p = jnp.asarray(np.concatenate([txt, txt[:pad]]))
    vm = jnp.asarray(np.concatenate([np.ones(b), np.zeros(pad)]).astype(np.float32))

    for local in (False, True):
        def fn(a, t, v, local=local):
            return clip_loss(a, t, scale, axis_name="data", local_loss=local,
                             valid_mask=v)[None]

        f = shard_map(fn, mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
                      out_specs=P("data"))
        out = np.asarray(f(img_p, txt_p, vm))
        if local:
            # each shard returns a mean over ITS valid rows; the global loss is
            # the valid-count-weighted mean (clip_loss docstring contract)
            counts = np.asarray(vm).reshape(8, 2).sum(axis=1)
            got = float((out * counts).sum() / counts.sum())
        else:
            got = float(out[0])
        np.testing.assert_allclose(got, ref, rtol=1e-5,
                                   err_msg=f"local_loss={local}")
