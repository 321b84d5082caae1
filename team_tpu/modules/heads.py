"""Secondary classifier heads and incremental-net utilities.

Counterparts of the reference's remaining head/network zoo:
* ``SimpleLinear`` (``convs/linears.py:7-28``),
* ``SplitCosineLinear`` + ``reduce_proxies`` (``convs/linears.py:64-108``),
* weight alignment (``utils/inc_net.py:103-111``),
* ``BiasLayer`` bias correction (``utils/inc_net.py:176-188``).

All functional over preallocated banks, jit-friendly.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from team_tpu.modules.linears import NEG_INF

from team_tpu.utils.jmath import l2_normalize


def init_simple_linear(key: jax.Array, in_features: int, out_features: int) -> Dict:
    """Kaiming-uniform weight (linear nonlinearity -> gain 1), zero bias."""
    bound = jnp.sqrt(3.0 / in_features)
    return {
        "weight": jax.random.uniform(key, (out_features, in_features), minval=-bound, maxval=bound),
        "bias": jnp.zeros((out_features,)),
    }


def simple_linear_forward(params: Dict, x: jax.Array, class_mask: jax.Array | None = None) -> jax.Array:
    logits = x @ params["weight"].T + params["bias"]
    if class_mask is not None:
        logits = jnp.where(class_mask[None, :] > 0, logits, NEG_INF)
    return logits


def reduce_proxies(out: jax.Array, nb_proxy: int) -> jax.Array:
    """Softmax-attention reduction over per-class proxies (``convs/linears.py:97-108``)."""
    if nb_proxy == 1:
        return out
    bs = out.shape[0]
    nb_classes = out.shape[1] // nb_proxy
    simi_per_class = out.reshape(bs, nb_classes, nb_proxy)
    attentions = jax.nn.softmax(simi_per_class, axis=-1)
    return jnp.sum(attentions * simi_per_class, axis=-1)


def init_cosine_proxy_linear(key: jax.Array, in_features: int, out_classes: int,
                             nb_proxy: int = 1) -> Dict:
    stdv = 1.0 / jnp.sqrt(jnp.asarray(float(in_features)))
    w = jax.random.uniform(key, (out_classes * nb_proxy, in_features), minval=-stdv, maxval=stdv)
    return {"weight": w, "sigma": jnp.ones(()), "nb_proxy": nb_proxy}


def cosine_proxy_forward(params: Dict, x: jax.Array, to_reduce: bool = True) -> jax.Array:
    """CosineLinear with proxies (``convs/linears.py:31-61``)."""
    xn = l2_normalize(x)
    wn = l2_normalize(params["weight"])
    out = xn @ wn.T
    if to_reduce:
        out = reduce_proxies(out, int(params["nb_proxy"]))
    return params["sigma"] * out


def split_cosine_forward(old_params: Dict, new_params: Dict, sigma: jax.Array,
                         x: jax.Array, nb_proxy: int = 1) -> Dict[str, jax.Array]:
    """SplitCosineLinear (``convs/linears.py:64-94``): separate old/new class
    banks concatenated, proxy-reduced, shared sigma; returns old/new/joint."""
    xn = l2_normalize(x)

    def cos(w):
        wn = l2_normalize(w)
        return xn @ wn.T

    out1, out2 = cos(old_params["weight"]), cos(new_params["weight"])
    joint = reduce_proxies(jnp.concatenate([out1, out2], axis=1), nb_proxy)
    return {
        "old_scores": reduce_proxies(out1, nb_proxy),
        "new_scores": reduce_proxies(out2, nb_proxy),
        "logits": sigma * joint,
    }


def weight_align(weight: jax.Array, increment: int) -> jax.Array:
    """Scale new-class rows so their mean norm matches old rows
    (``utils/inc_net.py:103-111``)."""
    new_norm = jnp.linalg.norm(weight[-increment:], axis=1)
    old_norm = jnp.linalg.norm(weight[:-increment], axis=1)
    gamma = jnp.mean(old_norm) / jnp.mean(new_norm)
    return weight.at[-increment:].multiply(gamma)


def init_bias_layer() -> Dict:
    return {"alpha": jnp.ones((1,)), "beta": jnp.zeros((1,))}


def bias_layer_forward(params: Dict, logits: jax.Array, low: int, high: int) -> jax.Array:
    """BiasLayer (``utils/inc_net.py:176-185``): affine correction on one task's
    logit range."""
    seg = params["alpha"] * logits[:, low:high] + params["beta"]
    return logits.at[:, low:high].set(seg)
