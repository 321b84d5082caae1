"""CLIP ViT-B/16 image + text towers, TPU-native.

Functional re-implementation of the backbone the reference obtains from
``open_clip.create_model_and_transforms('ViT-B-16', ...)`` (reference
``utils/inc_net.py:12-36``, ``out_dim=512``). Parameters live in plain dict
pytrees; every forward is a pure function suitable for ``jit`` / ``pjit``.

Hardware mapping:
* patch embedding is a single ``[B*196, 768] @ [768, 768]``-class matmul (MXU),
  not a convolution — identical math, better tiling;
* attention goes through :func:`team_tpu.ops.multi_head_attention` (Pallas flash
  kernel on TPU);
* compute dtype is configurable (bf16 recommended on TPU; params stay f32).

Weight import from an open_clip/OpenAI checkpoint is in
:mod:`team_tpu.backbone.import_weights`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1


@dataclasses.dataclass(frozen=True)
class TextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    vision: VisionConfig = dataclasses.field(default_factory=VisionConfig)
    text: TextConfig = dataclasses.field(default_factory=TextConfig)
    embed_dim: int = 512

    @staticmethod
    def vit_b16() -> "CLIPConfig":
        return CLIPConfig()

    @staticmethod
    def tiny(embed_dim: int = 32) -> "CLIPConfig":
        """Small config for tests: 2-layer towers, 32-d embeddings."""
        return CLIPConfig(
            vision=VisionConfig(image_size=32, patch_size=16, width=64, layers=2, heads=2, embed_dim=embed_dim),
            text=TextConfig(context_length=77, vocab_size=49408, width=64, layers=2, heads=2, embed_dim=embed_dim),
            embed_dim=embed_dim,
        )


Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_block(key, width: int) -> Params:
    k = jax.random.split(key, 6)
    proj_std = (width ** -0.5) * ((2 * 12) ** -0.5)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5
    mlp_width = width * 4
    return {
        "ln_1": {"scale": jnp.ones((width,)), "bias": jnp.zeros((width,))},
        "attn": {
            "qkv_w": jax.random.normal(k[0], (width, 3 * width)) * attn_std,
            "qkv_b": jnp.zeros((3 * width,)),
            "out_w": jax.random.normal(k[1], (width, width)) * proj_std,
            "out_b": jnp.zeros((width,)),
        },
        "ln_2": {"scale": jnp.ones((width,)), "bias": jnp.zeros((width,))},
        "mlp": {
            "fc_w": jax.random.normal(k[2], (width, mlp_width)) * fc_std,
            "fc_b": jnp.zeros((mlp_width,)),
            "proj_w": jax.random.normal(k[3], (mlp_width, width)) * proj_std,
            "proj_b": jnp.zeros((width,)),
        },
    }


def init_clip_params(key: jax.Array, cfg: CLIPConfig) -> Params:
    kv, kt, kvb, ktb, kmisc = jax.random.split(key, 5)
    v, t = cfg.vision, cfg.text
    patch_dim = 3 * v.patch_size * v.patch_size
    vision = {
        "patch_w": jax.random.normal(kv, (patch_dim, v.width)) * (v.width ** -0.5),
        "cls": jax.random.normal(jax.random.fold_in(kv, 1), (v.width,)) * (v.width ** -0.5),
        "pos": jax.random.normal(jax.random.fold_in(kv, 2), (v.seq_len, v.width)) * (v.width ** -0.5),
        "ln_pre": {"scale": jnp.ones((v.width,)), "bias": jnp.zeros((v.width,))},
        "blocks": [_init_block(jax.random.fold_in(kvb, i), v.width) for i in range(v.layers)],
        "ln_post": {"scale": jnp.ones((v.width,)), "bias": jnp.zeros((v.width,))},
        "proj": jax.random.normal(jax.random.fold_in(kv, 3), (v.width, cfg.embed_dim)) * (v.width ** -0.5),
    }
    text = {
        "token_embedding": jax.random.normal(kt, (t.vocab_size, t.width)) * 0.02,
        "pos": jax.random.normal(jax.random.fold_in(kt, 1), (t.context_length, t.width)) * 0.01,
        "blocks": [_init_block(jax.random.fold_in(ktb, i), t.width) for i in range(t.layers)],
        "ln_final": {"scale": jnp.ones((t.width,)), "bias": jnp.zeros((t.width,))},
        "proj": jax.random.normal(jax.random.fold_in(kt, 2), (t.width, cfg.embed_dim)) * (t.width ** -0.5),
    }
    return {
        "vision": vision,
        "text": text,
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), dtype=jnp.float32),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _layer_norm(p: Params, x: jax.Array) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _block_forward(p: Params, x: jax.Array, heads: int, *, causal: bool, kv_len, impl: str) -> jax.Array:
    b, s, d = x.shape
    dh = d // heads
    if impl == "attn_block":
        # whole attention sub-block (LN -> qkv -> attention -> out-proj ->
        # residual) in one Pallas call; qkv/attention activations never reach HBM
        from team_tpu.ops.mha_short import fused_attn_block

        x = fused_attn_block(
            x, p["ln_1"]["scale"], p["ln_1"]["bias"],
            p["attn"]["qkv_w"], p["attn"]["qkv_b"],
            p["attn"]["out_w"], p["attn"]["out_b"], heads, causal=causal)
        h = _layer_norm(p["ln_2"], x)
        h = h @ p["mlp"]["fc_w"].astype(x.dtype) + p["mlp"]["fc_b"].astype(x.dtype)
        h = jax.nn.gelu(h, approximate=False)
        return x + h @ p["mlp"]["proj_w"].astype(x.dtype) + p["mlp"]["proj_b"].astype(x.dtype)
    # Tower GEMMs stay 3-D ([B, S, D] @ [D, N]): XLA's batch-in-sublanes
    # emitter builds VMEM-resident MEGA-FUSIONS (out-proj + MLP + LNs +
    # residuals in ONE ~4.1 ms fusion/layer, profiler-measured) that beat the
    # 2-D GEMM split end-to-end — the 2-D rewrite measured 2492 img/s padded
    # vs 2983 for this form (docs/BENCH.md round 3). Do not "fix" this.
    h = _layer_norm(p["ln_1"], x)
    qkv = h @ p["attn"]["qkv_w"].astype(x.dtype) + p["attn"]["qkv_b"].astype(x.dtype)
    if impl == "auto" and s < 512:
        # v5e shoot-outs (docs/BENCH.md): the packed-qkv kernel wins END-TO-END
        # (2983 img/s vs 2187 XLA-attention / 2187 attn_block). The fully-fused
        # attention sub-block ('attn_block') measures faster in ISOLATED block
        # chains (7.77 vs 7.90 ms/layer) but regresses the full tower — its
        # VMEM-resident weights cost XLA cross-op pipelining. End-to-end bench
        # is the routing authority.
        import jax as _jax

        if _jax.default_backend() in ("tpu", "axon"):
            impl = "mha_packed"
    if impl == "mha_packed_proj":
        # packed attention + fused out-projection + residual in one call
        from team_tpu.ops.mha_short import fused_mha_packed_proj

        x = fused_mha_packed_proj(qkv, p["attn"]["out_w"], p["attn"]["out_b"],
                                  x, heads, causal=causal)
        h = _layer_norm(p["ln_2"], x)
        h = h @ p["mlp"]["fc_w"].astype(x.dtype) + p["mlp"]["fc_b"].astype(x.dtype)
        h = jax.nn.gelu(h, approximate=False)
        return x + h @ p["mlp"]["proj_w"].astype(x.dtype) + p["mlp"]["proj_b"].astype(x.dtype)
    if impl == "mha_packed_tp":
        # tensor-parallel packed kernel: heads split over the registered 2-D
        # mesh's model axis via shard_map (team_tpu.ops.mha_short.set_tp_mesh)
        from team_tpu.ops.mha_short import fused_mha_packed_tp

        o = fused_mha_packed_tp(qkv, heads, causal=causal, kv_len=kv_len)
    elif impl == "mha_packed":
        # transpose-free path: the kernel consumes the packed qkv projection
        # directly — no head-split transposes, no S-padding copies
        from team_tpu.ops.mha_short import fused_mha_packed

        o = fused_mha_packed(qkv, heads, causal=causal,
                             kv_len=kv_len if (kv_len is not None
                                               and kv_len < s) else None)
    else:
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)

        o = multi_head_attention(split_heads(q), split_heads(k), split_heads(v),
                                 kv_len, causal=causal, impl=impl)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
    x = x + o @ p["attn"]["out_w"].astype(x.dtype) + p["attn"]["out_b"].astype(x.dtype)
    h = _layer_norm(p["ln_2"], x)
    h = h @ p["mlp"]["fc_w"].astype(x.dtype) + p["mlp"]["fc_b"].astype(x.dtype)
    h = jax.nn.gelu(h, approximate=False)
    x = x + h @ p["mlp"]["proj_w"].astype(x.dtype) + p["mlp"]["proj_b"].astype(x.dtype)
    return x


def patch_pixels(images: jax.Array, cfg: CLIPConfig, *,
                 compute_dtype=jnp.float32) -> jax.Array:
    """``[B, H, W, 3]`` -> the patch-pixel matrix ``[B, g*g, 3*ps*ps]``
    (pixel order matches the torch conv layout for weight import)."""
    v = cfg.vision
    b = images.shape[0]
    g, ps = v.grid, v.patch_size
    x = images.astype(compute_dtype)
    x = x.reshape(b, g, ps, g, ps, 3)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, gh, gw, C, ph, pw
    return x.reshape(b, g * g, 3 * ps * ps)


def embed_patches(params: Params, images: jax.Array, cfg: CLIPConfig, *,
                  compute_dtype=jnp.float32) -> jax.Array:
    """Patch-embedding stage: ``[B, H, W, 3]`` -> ``[B, g*g, width]`` (one MXU
    matmul)."""
    x = patch_pixels(images, cfg, compute_dtype=compute_dtype)
    return x @ params["vision"]["patch_w"].astype(compute_dtype)


def _maybe_pad_seq(x: jax.Array, attn_impl: str, seq_pad: bool | None,
                   auto_default: bool = False) -> jax.Array:
    """Pad the sequence dim to the 16-sublane bf16 tile so every
    ``[B, S, D] <-> [B*S, D]`` reshape in the tower is a FREE bitcast.

    At S=197 those reshapes are real 77-232 MB layout copies, ~6 of them per
    block layer (optimized-HLO measurement, docs/BENCH.md round 3). Pad rows
    are zeros; attention masks keys >= the real kv_len, so real-row outputs
    are exact. ``seq_pad=None`` defers to ``auto_default`` (measured: padding
    WINS for the Pallas-heavy int8 static tower, +376 img/s, but LOSES for
    the pure-XLA bf16 tower, -109 — the +5.6 % pad-row GEMM FLOPs outweigh
    copies XLA already avoids); only attention impls that honor kv_len
    masking may pad."""
    s = x.shape[1]
    _kv_len_honoring = ("auto", "mha_packed", "mha_packed_tp", "xla", "flash")
    if seq_pad is None:
        seq_pad = (auto_default
                   and jax.default_backend() in ("tpu", "axon")
                   and attn_impl in ("auto", "mha_packed", "xla", "flash"))
    elif seq_pad and attn_impl not in _kv_len_honoring:
        # an impl that ignores kv_len would ATTEND TO the zero-pad keys and
        # corrupt real-row outputs (ADVICE r3: the whitelist only guarded the
        # auto path) — refuse rather than silently mis-compute
        raise ValueError(
            f"seq_pad=True requires a kv_len-honoring attention impl "
            f"{_kv_len_honoring}, got {attn_impl!r}")
    if not seq_pad or s % 16 == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, (-s) % 16), (0, 0)))


def encode_from_patches(params: Params, patch_tokens: jax.Array, cfg: CLIPConfig, *,
                        compute_dtype=jnp.float32, attn_impl: str = "auto",
                        seq_pad: bool | None = None) -> jax.Array:
    """Transformer stage over patch tokens (exposed separately so saliency /
    Grad-CAM can differentiate w.r.t. the patch activations)."""
    v = cfg.vision
    p = params["vision"]
    b = patch_tokens.shape[0]
    cls = jnp.broadcast_to(p["cls"].astype(compute_dtype), (b, 1, v.width))
    x = jnp.concatenate([cls, patch_tokens.astype(compute_dtype)], axis=1)
    x = x + p["pos"].astype(compute_dtype)
    x = _layer_norm(p["ln_pre"], x)
    x = _maybe_pad_seq(x, attn_impl, seq_pad)
    for blk in p["blocks"]:
        x = _block_forward(blk, x, v.heads, causal=False, kv_len=v.seq_len, impl=attn_impl)
    x = _layer_norm(p["ln_post"], x[:, 0])
    return (x @ p["proj"].astype(compute_dtype)).astype(jnp.float32)


def encode_image(params: Params, images: jax.Array, cfg: CLIPConfig, *,
                 compute_dtype=jnp.float32, attn_impl: str = "auto",
                 seq_pad: bool | None = None) -> jax.Array:
    """Image tower: ``[B, H, W, 3]`` float (already normalized) -> ``[B, embed_dim]``."""
    tokens = embed_patches(params, images, cfg, compute_dtype=compute_dtype)
    return encode_from_patches(params, tokens, cfg, compute_dtype=compute_dtype,
                               attn_impl=attn_impl, seq_pad=seq_pad)


def encode_image_patches_u8(params: Params, patches_u8: jax.Array,
                            cfg: CLIPConfig, *, compute_dtype=jnp.float32,
                            attn_impl: str = "auto",
                            seq_pad: bool | None = None) -> jax.Array:
    """bf16/f32 image tower over PATCH-MAJOR uint8 input ``[B, g*g, 3*ps*ps]``
    (the native loader's ``load_batch_u8_patches`` layout, element order =
    :func:`patch_pixels`). /255 + CLIP-normalize fold into the patch dot's
    prologue as per-column scale/bias — the device does zero spatial reorder
    (the [H, W, 3] minor-dim-3 layout is lane-hostile on TPU; docs/BENCH.md
    round 4 ingest audit). Same math as ``preprocess_batch`` + patchify."""
    from team_tpu.ops.preprocess import patch_norm_consts

    assert patches_u8.dtype == jnp.uint8
    scale, bias = patch_norm_consts(cfg.vision.patch_size)
    px = (patches_u8.astype(jnp.float32) * scale + bias).astype(compute_dtype)
    tokens = px @ params["vision"]["patch_w"].astype(compute_dtype)
    return encode_from_patches(params, tokens, cfg, compute_dtype=compute_dtype,
                               attn_impl=attn_impl, seq_pad=seq_pad)


def encode_text(params: Params, tokens: jax.Array, cfg: CLIPConfig, *,
                compute_dtype=jnp.float32, attn_impl: str = "auto") -> jax.Array:
    """Text tower: ``[B, 77]`` int tokens -> ``[B, embed_dim]`` (eot pooling)."""
    t = cfg.text
    p = params["text"]
    x = p["token_embedding"][tokens].astype(compute_dtype)
    x = x + p["pos"].astype(compute_dtype)
    for blk in p["blocks"]:
        x = _block_forward(blk, x, t.heads, causal=True, kv_len=t.context_length, impl=attn_impl)
    x = _layer_norm(p["ln_final"], x)
    eot = jnp.argmax(tokens, axis=-1)
    x = x[jnp.arange(x.shape[0]), eot]
    return (x @ p["proj"].astype(compute_dtype)).astype(jnp.float32)


class CLIPModel:
    """Thin stateful wrapper bundling params + config (host-side convenience).

    The jitted paths always use the pure functions above; this class mirrors the
    reference backbone surface (``encode_image`` / ``encode_text`` /
    ``logit_scale`` / ``out_dim``, reference ``utils/inc_net.py:19-22``).
    """

    def __init__(self, cfg: CLIPConfig, params: Params | None = None, seed: int = 0,
                 compute_dtype=jnp.float32, attn_impl: str = "auto"):
        self.cfg = cfg
        self.params = params if params is not None else init_clip_params(jax.random.PRNGKey(seed), cfg)
        self.compute_dtype = compute_dtype
        self.attn_impl = attn_impl
        self.out_dim = cfg.embed_dim

    def encode_image(self, images: jax.Array) -> jax.Array:
        return encode_image(self.params, images, self.cfg,
                            compute_dtype=self.compute_dtype, attn_impl=self.attn_impl)

    def encode_text(self, tokens: jax.Array) -> jax.Array:
        return encode_text(self.params, tokens, self.cfg,
                           compute_dtype=self.compute_dtype, attn_impl=self.attn_impl)

    @property
    def logit_scale(self) -> jax.Array:
        return self.params["logit_scale"]
