"""Grad-CAM-style saliency for the CLIP vision tower.

Counterpart of the reference's gradcam hooks (``utils/inc_net.py:84-89,
126-145``: forward/backward hooks on the last conv capturing activations and
gradients). Torch needs hooks; in JAX the same quantity is one ``jax.grad``
against the patch-embedding activations:

``cam[p] = ReLU( Σ_c  dscore/dA[p,c] · A[p,c] )``  over the g×g patch grid,

where ``score`` is the similarity of the image embedding to a target direction
(e.g. a class text feature).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from team_tpu.backbone.clip import CLIPConfig, embed_patches, encode_from_patches

from team_tpu.utils.jmath import l2_normalize


def grad_cam(params, images: jax.Array, target: jax.Array, cfg: CLIPConfig,
             *, attn_impl: str = "xla") -> jax.Array:
    """``images: [B, H, W, 3]`` (normalized), ``target: [D]`` or ``[B, D]``
    direction(s) -> saliency maps ``[B, g, g]`` normalized to [0, 1]."""
    tokens = embed_patches(params, images, cfg)
    tgt = target if target.ndim == 2 else jnp.broadcast_to(target, (images.shape[0],) + target.shape)
    tgt = l2_normalize(tgt)

    def score(tok):
        feats = encode_from_patches(params, tok, cfg, attn_impl=attn_impl)
        feats = l2_normalize(feats)
        return jnp.sum(feats * tgt)

    grads = jax.grad(score)(tokens)                     # [B, g*g, width]
    cam = jax.nn.relu(jnp.sum(grads * tokens, axis=-1))  # [B, g*g]
    g = cfg.vision.grid
    cam = cam.reshape(-1, g, g)
    lo = jnp.min(cam, axis=(1, 2), keepdims=True)
    hi = jnp.max(cam, axis=(1, 2), keepdims=True)
    return (cam - lo) / jnp.maximum(hi - lo, 1e-12)
