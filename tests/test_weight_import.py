"""Checkpoint-import parity: convert a synthetic open_clip-format state dict and
verify the JAX towers reproduce a minimal torch CLIP forward exactly.

The torch model here is built from the open_clip architecture *spec* (packed
q/k/v ``nn.MultiheadAttention``, pre-LN residual blocks, conv patch embed
without bias, eot-argmax text pooling) so the test pins the import mapping:
weight transposes, patch-pixel ordering, LN epsilons, pooling indices.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from team_tpu.backbone.clip import CLIPConfig, TextConfig, VisionConfig, encode_image, encode_text  # noqa: E402
from team_tpu.backbone.import_weights import convert_openclip_state_dict  # noqa: E402

WIDTH, LAYERS, HEADS, EMBED = 32, 2, 2, 16
IMG, PATCH = 16, 8
VOCAB, CTX = 64, 12


def _mini_cfg() -> CLIPConfig:
    return CLIPConfig(
        vision=VisionConfig(image_size=IMG, patch_size=PATCH, width=WIDTH,
                            layers=LAYERS, heads=HEADS, embed_dim=EMBED),
        text=TextConfig(context_length=CTX, vocab_size=VOCAB, width=WIDTH,
                        layers=LAYERS, heads=HEADS, embed_dim=EMBED),
        embed_dim=EMBED,
    )


class TorchBlock(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.ln_1 = torch.nn.LayerNorm(WIDTH)
        self.attn = torch.nn.MultiheadAttention(WIDTH, HEADS, batch_first=True)
        self.ln_2 = torch.nn.LayerNorm(WIDTH)
        self.mlp = torch.nn.ModuleDict({
            "c_fc": torch.nn.Linear(WIDTH, WIDTH * 4),
            "c_proj": torch.nn.Linear(WIDTH * 4, WIDTH),
        })

    def forward(self, x, attn_mask=None):
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False, attn_mask=attn_mask)
        x = x + a
        h = self.mlp["c_proj"](torch.nn.functional.gelu(self.mlp["c_fc"](self.ln_2(x))))
        return x + h


class TorchMiniCLIP(torch.nn.Module):
    def __init__(self):
        super().__init__()
        g = IMG // PATCH
        self.conv1 = torch.nn.Conv2d(3, WIDTH, PATCH, PATCH, bias=False)
        self.class_embedding = torch.nn.Parameter(torch.randn(WIDTH) * 0.1)
        self.v_pos = torch.nn.Parameter(torch.randn(g * g + 1, WIDTH) * 0.1)
        self.ln_pre = torch.nn.LayerNorm(WIDTH)
        self.v_blocks = torch.nn.ModuleList([TorchBlock() for _ in range(LAYERS)])
        self.ln_post = torch.nn.LayerNorm(WIDTH)
        self.v_proj = torch.nn.Parameter(torch.randn(WIDTH, EMBED) * 0.1)

        self.token_embedding = torch.nn.Embedding(VOCAB, WIDTH)
        self.t_pos = torch.nn.Parameter(torch.randn(CTX, WIDTH) * 0.1)
        self.t_blocks = torch.nn.ModuleList([TorchBlock() for _ in range(LAYERS)])
        self.ln_final = torch.nn.LayerNorm(WIDTH)
        self.text_projection = torch.nn.Parameter(torch.randn(WIDTH, EMBED) * 0.1)

    def encode_image(self, x):
        x = self.conv1(x)  # [B, W, g, g]
        x = x.flatten(2).transpose(1, 2)  # [B, g*g, W]
        cls = self.class_embedding[None, None].expand(x.shape[0], 1, WIDTH)
        x = torch.cat([cls, x], dim=1) + self.v_pos
        x = self.ln_pre(x)
        for blk in self.v_blocks:
            x = blk(x)
        return self.ln_post(x[:, 0]) @ self.v_proj

    def encode_text(self, tokens):
        x = self.token_embedding(tokens) + self.t_pos
        mask = torch.full((CTX, CTX), float("-inf")).triu(1)
        for blk in self.t_blocks:
            x = blk(x, attn_mask=mask)
        x = self.ln_final(x)
        x = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return x @ self.text_projection


def _state_dict(model: TorchMiniCLIP):
    sd = {}
    sd["visual.conv1.weight"] = model.conv1.weight
    sd["visual.class_embedding"] = model.class_embedding
    sd["visual.positional_embedding"] = model.v_pos
    sd["visual.ln_pre.weight"] = model.ln_pre.weight
    sd["visual.ln_pre.bias"] = model.ln_pre.bias
    sd["visual.ln_post.weight"] = model.ln_post.weight
    sd["visual.ln_post.bias"] = model.ln_post.bias
    sd["visual.proj"] = model.v_proj
    sd["token_embedding.weight"] = model.token_embedding.weight
    sd["positional_embedding"] = model.t_pos
    sd["ln_final.weight"] = model.ln_final.weight
    sd["ln_final.bias"] = model.ln_final.bias
    sd["text_projection"] = model.text_projection
    sd["logit_scale"] = torch.tensor(2.0)

    def blocks(prefix, blks):
        for i, blk in enumerate(blks):
            p = f"{prefix}.resblocks.{i}."
            sd[p + "ln_1.weight"] = blk.ln_1.weight
            sd[p + "ln_1.bias"] = blk.ln_1.bias
            sd[p + "attn.in_proj_weight"] = blk.attn.in_proj_weight
            sd[p + "attn.in_proj_bias"] = blk.attn.in_proj_bias
            sd[p + "attn.out_proj.weight"] = blk.attn.out_proj.weight
            sd[p + "attn.out_proj.bias"] = blk.attn.out_proj.bias
            sd[p + "ln_2.weight"] = blk.ln_2.weight
            sd[p + "ln_2.bias"] = blk.ln_2.bias
            sd[p + "mlp.c_fc.weight"] = blk.mlp["c_fc"].weight
            sd[p + "mlp.c_fc.bias"] = blk.mlp["c_fc"].bias
            sd[p + "mlp.c_proj.weight"] = blk.mlp["c_proj"].weight
            sd[p + "mlp.c_proj.bias"] = blk.mlp["c_proj"].bias

    blocks("visual.transformer", model.v_blocks)
    blocks("transformer", model.t_blocks)
    return {k: v.detach().numpy().astype(np.float32) for k, v in sd.items()}


def test_imported_towers_match_torch_forward():
    torch.manual_seed(0)
    model = TorchMiniCLIP().eval()
    cfg = _mini_cfg()
    params = convert_openclip_state_dict(_state_dict(model), cfg)

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((3, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        ref_img = model.encode_image(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    out_img = np.asarray(encode_image(params, jnp.asarray(imgs), cfg, attn_impl="xla"))
    np.testing.assert_allclose(out_img, ref_img, atol=2e-5)

    tokens = np.zeros((2, CTX), np.int32)
    tokens[0, :4] = [10, 5, 7, VOCAB - 1]
    tokens[1, :6] = [3, 9, 2, 8, 4, VOCAB - 1]
    with torch.no_grad():
        ref_txt = model.encode_text(torch.from_numpy(tokens.astype(np.int64))).numpy()
    out_txt = np.asarray(encode_text(params, jnp.asarray(tokens), cfg, attn_impl="xla"))
    np.testing.assert_allclose(out_txt, ref_txt, atol=2e-5)
