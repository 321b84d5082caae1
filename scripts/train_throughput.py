"""Steady-state PROOF training throughput at production scale.

Measures (a) the cached-feature epoch-scan step and (b) the one-time backbone
feature extraction — the two phases of a TEAM task on TPU. Prints a JSON line
per phase.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from team_tpu.utils.jax_cache import enable  # noqa: E402

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from team_tpu.backbone.clip import CLIPConfig, encode_image, init_clip_params  # noqa: E402
from team_tpu.config import Config  # noqa: E402
from team_tpu.learners.proof_net import (  # noqa: E402
    ProofDims, TaskContext, build_epoch_runner, init_buffers, init_proof_params,
    make_optimizer,
)


def fence(x):
    return float(jnp.sum(x))


def main():
    cfg = Config(tuned_epoch=20, batch_size=16, optimizer="adam",
                 context_prompt_length_per_task=10)
    clip_cfg = CLIPConfig.vit_b16()
    dims = ProofDims(feature_dim=512, max_classes=20, max_tasks=10)
    key = jax.random.PRNGKey(0)
    clip_params = init_clip_params(key, clip_cfg)
    tr, aux = init_proof_params(jax.random.fold_in(key, 1), dims, 2.0)
    buffers = init_buffers(dims)
    tx = make_optimizer(cfg)
    opt_state = tx.init(tr)
    runner = build_epoch_runner(cfg, dims, tx)

    rng = np.random.default_rng(0)
    n = 1024  # images per task (IIMinsects-scale)
    feats = jnp.asarray(rng.standard_normal((n, 512)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, n).astype(np.int32))
    stages = jnp.asarray(rng.choice([1, 4], n).astype(np.int32))
    ctx = TaskContext(
        task_mask=jnp.zeros(10).at[:2].set(1.0),
        cur_onehot=jnp.zeros(10).at[1].set(1.0),
        class_mask=jnp.zeros(20).at[:4].set(1.0),
        class_text_basic=jax.random.normal(jax.random.fold_in(key, 2), (20, 512)),
    )
    k = n // cfg.batch_size
    batches = {
        "feat": feats.reshape(k, cfg.batch_size, 512),
        "label": labels.reshape(k, cfg.batch_size),
        "stage_id": stages.reshape(k, cfg.batch_size),
    }
    rngs = jax.random.split(jax.random.PRNGKey(1), k)

    tr2, opt2, tot = runner(tr, opt_state, batches, ctx, buffers, rngs, jnp.asarray(0))
    fence(tot.total_loss)  # compile
    t0 = time.perf_counter()
    reps = 5
    for i in range(reps):
        tr2, opt2, tot = runner(tr2, opt2, batches, ctx, buffers, rngs, jnp.asarray(i))
    fence(tot.total_loss)
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"metric": "PROOF cached-feature epoch (1024 imgs, 64 steps)",
                      "value": round(dt * 1000, 1), "unit": "ms/epoch",
                      "steps_per_sec": round(k / dt, 1)}))

    # backbone feature extraction (once per task)
    imgs = jnp.asarray(rng.standard_normal((256, 224, 224, 3)).astype(np.float32))
    f = jax.jit(lambda p, x: encode_image(p, x, clip_cfg, compute_dtype=jnp.bfloat16,
                                          attn_impl="xla"))
    fence(f(clip_params, imgs))
    t0 = time.perf_counter()
    for _ in range(4):
        out = f(clip_params, imgs)
    fence(out)
    dt = (time.perf_counter() - t0) / 4
    print(json.dumps({"metric": "backbone feature extraction",
                      "value": round(256 / dt, 1), "unit": "images/sec"}))


if __name__ == "__main__":
    main()
