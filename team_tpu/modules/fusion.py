"""Cross-modal self-attention fusion layer.

Counterpart of the reference ``MultiHeadAttention`` used as ``sel_attn``
(``convs/projections.py:41-87``; instantiated 1-head at ``utils/inc_net.py:353``):
q/k/v linear maps without bias, scaled-dot-product attention with dropout on the
probabilities, an output projection with dropout, then residual + LayerNorm.

TPU-first deltas: the token sequence contains padded prototype/context slots
(preallocated banks), so attention takes a key mask — padded keys get ``-inf``
logits and padded outputs are ignored by callers via masked means. For real
tokens the math matches the reference exactly (softmax over valid keys only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def init_fusion(key: jax.Array, n_head: int, d_model: int, d_k: int, d_v: int):
    k = jax.random.split(key, 4)
    std_qk = jnp.sqrt(2.0 / (d_model + d_k))
    std_v = jnp.sqrt(2.0 / (d_model + d_v))
    # xavier-normal for the output projection (reference nn.init.xavier_normal_)
    std_fc = jnp.sqrt(2.0 / (n_head * d_v + d_model))

    def _normal(kk, shape):
        # barrier so the trailing `* std` cannot FMA-fuse into the normal's
        # erf_inv chain under jit: the ONE-graph jitted init (learners/proof.py)
        # must be bitwise-identical to the historical eager init on TPU, and
        # these four products were the only drifting leaves
        # (scripts/r5_init_bitwise_probe.py). Init-only, so the barrier is free.
        return jax.lax.optimization_barrier(jax.random.normal(kk, shape))

    return {
        "w_qs": _normal(k[0], (d_model, n_head * d_k)) * std_qk,
        "w_ks": _normal(k[1], (d_model, n_head * d_k)) * std_qk,
        "w_vs": _normal(k[2], (d_model, n_head * d_v)) * std_v,
        "fc_w": _normal(k[3], (n_head * d_v, d_model)) * std_fc,
        "fc_b": jnp.zeros((d_model,)),
        "ln": {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,))},
    }


def _dropout(rng, x, rate, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def fusion_attention(
    params,
    x: jax.Array,
    key_mask: jax.Array,
    *,
    n_head: int = 1,
    dropout_rate: float = 0.1,
    rng: jax.Array | None = None,
    deterministic: bool = True,
) -> jax.Array:
    """Self-attention over ``x: [B, S, D]`` with ``key_mask: [S]`` (1 = real token).

    Returns ``[B, S, D]``; positions with ``key_mask == 0`` carry garbage and must
    be excluded by the caller (masked mean / slicing).
    """
    d_k = params["w_qs"].shape[1] // n_head
    d_v = params["w_vs"].shape[1] // n_head
    b, s, d_model = x.shape
    residual = x

    q = (x @ params["w_qs"]).reshape(b, s, n_head, d_k).transpose(0, 2, 1, 3)
    k = (x @ params["w_ks"]).reshape(b, s, n_head, d_k).transpose(0, 2, 1, 3)
    v = (x @ params["w_vs"]).reshape(b, s, n_head, d_v).transpose(0, 2, 1, 3)

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.asarray(float(d_k)))
    logits = jnp.where(key_mask[None, None, None, :] > 0, logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)
    if not deterministic and rng is not None:
        r1, r2 = jax.random.split(rng)
        attn = _dropout(r1, attn, dropout_rate, False)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, n_head * d_v)
    out = out @ params["fc_w"] + params["fc_b"]
    if not deterministic and rng is not None:
        out = _dropout(r2, out, dropout_rate, False)
    out = out + residual
    mean = jnp.mean(out, axis=-1, keepdims=True)
    var = jnp.var(out, axis=-1, keepdims=True)
    out = (out - mean) * jax.lax.rsqrt(var + 1e-5)
    return out * params["ln"]["scale"] + params["ln"]["bias"]
