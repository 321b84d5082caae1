"""Import open_clip / OpenAI CLIP checkpoints into the TPU-native pytree.

The reference downloads ``laion400m_e32`` / ``laion2b_s34b_b88k`` / ``openai``
pretrained weights through open_clip (reference ``utils/inc_net.py:18-32``). This
module converts such a checkpoint (a torch ``state_dict`` saved as ``.pt``/``.bin``,
or an ``.npz`` with the same key names) into :func:`team_tpu.backbone.clip`
parameters. Offline environments without a checkpoint simply use random init; the
framework semantics do not depend on the pretrained values.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from team_tpu.backbone.clip import CLIPConfig


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch  # cpu-only torch is available in the image

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k.replace("module.", ""): _to_np(v) for k, v in sd.items()}


def _block_from_sd(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "ln_1": {"scale": jnp.asarray(sd[prefix + "ln_1.weight"]), "bias": jnp.asarray(sd[prefix + "ln_1.bias"])},
        "attn": {
            "qkv_w": jnp.asarray(sd[prefix + "attn.in_proj_weight"].T),
            "qkv_b": jnp.asarray(sd[prefix + "attn.in_proj_bias"]),
            "out_w": jnp.asarray(sd[prefix + "attn.out_proj.weight"].T),
            "out_b": jnp.asarray(sd[prefix + "attn.out_proj.bias"]),
        },
        "ln_2": {"scale": jnp.asarray(sd[prefix + "ln_2.weight"]), "bias": jnp.asarray(sd[prefix + "ln_2.bias"])},
        "mlp": {
            "fc_w": jnp.asarray(sd[prefix + "mlp.c_fc.weight"].T),
            "fc_b": jnp.asarray(sd[prefix + "mlp.c_fc.bias"]),
            "proj_w": jnp.asarray(sd[prefix + "mlp.c_proj.weight"].T),
            "proj_b": jnp.asarray(sd[prefix + "mlp.c_proj.bias"]),
        },
    }


def convert_openclip_state_dict(sd: Dict[str, np.ndarray], cfg: CLIPConfig) -> Dict[str, Any]:
    v = cfg.vision
    conv_w = sd["visual.conv1.weight"]  # [width, 3, ph, pw]
    patch_w = conv_w.reshape(v.width, -1).T  # -> [3*ph*pw, width]; (C, ph, pw) pixel order
    n_v = len([k for k in sd if k.startswith("visual.transformer.resblocks.") and k.endswith("ln_1.weight")])
    n_t = len([k for k in sd if k.startswith("transformer.resblocks.") and k.endswith("ln_1.weight")])
    vision = {
        "patch_w": jnp.asarray(patch_w),
        "cls": jnp.asarray(sd["visual.class_embedding"]),
        "pos": jnp.asarray(sd["visual.positional_embedding"]),
        "ln_pre": {"scale": jnp.asarray(sd["visual.ln_pre.weight"]), "bias": jnp.asarray(sd["visual.ln_pre.bias"])},
        "blocks": [_block_from_sd(sd, f"visual.transformer.resblocks.{i}.") for i in range(n_v)],
        "ln_post": {"scale": jnp.asarray(sd["visual.ln_post.weight"]), "bias": jnp.asarray(sd["visual.ln_post.bias"])},
        "proj": jnp.asarray(sd["visual.proj"]),
    }
    text = {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
        "pos": jnp.asarray(sd["positional_embedding"]),
        "blocks": [_block_from_sd(sd, f"transformer.resblocks.{i}.") for i in range(n_t)],
        "ln_final": {"scale": jnp.asarray(sd["ln_final.weight"]), "bias": jnp.asarray(sd["ln_final.bias"])},
        "proj": jnp.asarray(sd["text_projection"]),
    }
    return {"vision": vision, "text": text, "logit_scale": jnp.asarray(float(sd["logit_scale"]))}


def load_clip_checkpoint(path: str, cfg: CLIPConfig) -> Dict[str, Any]:
    return convert_openclip_state_dict(load_state_dict(path), cfg)
