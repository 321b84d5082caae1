"""Per-task projection banks.

The reference grows three ``nn.ModuleList``s of single-``Linear`` projections —
one per task per modality — and sums their outputs (``utils/inc_net.py:345-347,
401-415, 424-434``; ``convs/projections.py:7-18``). Growing module lists force
module mutation and (on TPU) would force retracing.

Here each modality owns a preallocated bank ``W: [max_tasks, D, D], b: [max_tasks,
D]``. The forward contracts the whole bank in one batched matmul and masks
inactive tasks; gradient flow is restricted to the current task's slice with a
stop-gradient one-hot (the reference freezes old projections,
``utils/inc_net.py:494-516``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_projection_bank(key: jax.Array, max_tasks: int, dim: int):
    """torch ``nn.Linear`` default init: kaiming-uniform weight (a=√5 ⇒ bound
    1/√fan_in) and uniform bias with the same bound."""
    bound = 1.0 / jnp.sqrt(jnp.asarray(float(dim)))
    kw, kb = jax.random.split(key)
    # weight stored input-major [T, D_in, D_out]
    w = jax.random.uniform(kw, (max_tasks, dim, dim), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (max_tasks, dim), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def apply_projection_bank(
    bank,
    x: jax.Array,
    task_mask: jax.Array,
    cur_task_onehot: jax.Array | None = None,
) -> jax.Array:
    """``x: [..., D]`` -> sum over active tasks of ``x @ W_t + b_t``.

    ``task_mask: [T]`` selects tasks created so far; ``cur_task_onehot: [T]``
    (optional) lets gradients reach only the newest task's slice, matching the
    reference's freeze-old-projections policy.
    """
    w, b = bank["w"], bank["b"]
    if cur_task_onehot is not None:
        keep = cur_task_onehot.astype(w.dtype)
        w = jax.lax.stop_gradient(w) * (1.0 - keep)[:, None, None] + w * keep[:, None, None]
        b = jax.lax.stop_gradient(b) * (1.0 - keep)[:, None] + b * keep[:, None]
    # [T, ..., D] contributions; mask then sum over tasks.
    y = jnp.einsum("...d,tde->t...e", x, w) + jnp.expand_dims(b, axis=tuple(range(1, x.ndim)))
    mask = task_mask.astype(y.dtype).reshape((-1,) + (1,) * x.ndim)
    return jnp.sum(y * mask, axis=0)
