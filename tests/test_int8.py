"""int8 quantized matmul + quantized CLIP tower (CPU interpret mode).

On-chip validation (real MXU int8 lowering, throughput) lives in
``scripts/int8_validate.py`` / the TPU-gated test at the bottom; these tests pin
the numerics: kernel == dequantized integer reference, GELU fusion, padding, and
the tower-level cosine gate vs the bf16 tower.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from team_tpu.ops.int8_matmul import (
    int8_linear,
    int8_linear_xla,
    quantize_rows,
    quantize_weight,
    quantized_linear,
)


def test_int8_linear_xla_matches_integer_reference(rng):
    """The XLA dot_general path == the dequantized integer reference, with
    exact (erf) GELU — unlike the Mosaic kernels' tanh approximation."""
    m, k, n = 70, 96, 160
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    xq, xs = quantize_rows(jnp.asarray(x))
    wq, ws = quantize_weight(jnp.asarray(w))

    got = int8_linear_xla(xq, wq, xs, ws, jnp.asarray(b), out_dtype=jnp.float32)
    want = (np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)).astype(np.float32)
    want = want * np.asarray(xs) * np.asarray(ws) + b
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)

    gelu = int8_linear_xla(xq, wq, xs, ws, jnp.asarray(b), activation="gelu",
                           out_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(gelu),
        np.asarray(jax.nn.gelu(jnp.asarray(want), approximate=False)),
        rtol=1e-5, atol=1e-4)


def test_quantize_rows_roundtrip(rng):
    x = (rng.standard_normal((17, 64)) * 3).astype(np.float32)
    x[3] = 0.0  # zero row must not divide by zero
    q, s = quantize_rows(jnp.asarray(x))
    assert q.dtype == jnp.int8
    back = np.asarray(q, np.float32) * np.asarray(s)
    err = np.abs(back - x).max(axis=1)
    amax = np.abs(x).max(axis=1)
    assert (err <= amax / 127.0 * 0.5 + 1e-7).all()  # round-to-nearest bound
    assert np.all(np.asarray(q)[3] == 0)


def test_int8_linear_matches_integer_reference(rng):
    m, k, n = 70, 96, 160
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    xq, xs = quantize_rows(jnp.asarray(x))
    wq, ws = quantize_weight(jnp.asarray(w))

    got = int8_linear(xq, wq, xs, ws, jnp.asarray(b), out_dtype=jnp.float32,
                      block_m=32, block_n=32, interpret=True)
    want = (np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)).astype(np.float32)
    want = want * np.asarray(xs) * np.asarray(ws) + b
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)
    # and it approximates the float matmul to quantization error
    ref = x @ w + b
    rms = np.sqrt((ref ** 2).mean())
    assert np.abs(np.asarray(got) - ref).mean() / rms < 0.01


def test_int8_linear_gelu_fusion(rng):
    m, k, n = 40, 64, 96
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    xq, xs = quantize_rows(jnp.asarray(x))
    wq, ws = quantize_weight(jnp.asarray(w))
    got = int8_linear(xq, wq, xs, ws, None, activation="gelu",
                      out_dtype=jnp.float32, block_m=32, block_n=32, interpret=True)
    lin = int8_linear(xq, wq, xs, ws, None, out_dtype=jnp.float32,
                      block_m=32, block_n=32, interpret=True)
    # fused epilogue uses tanh-GELU (no erf lowering in Mosaic)
    np.testing.assert_allclose(np.asarray(got), np.asarray(jax.nn.gelu(lin, approximate=True)),
                               rtol=1e-5, atol=1e-5)


def test_int8_linear_block_must_divide_n(rng):
    """Regression (found on-chip): block_n > n/2 with n % block_n != 0 left the
    trailing output columns uncomputed. The block picker must divide n."""
    m, k, n = 16, 64, 192
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    xq, xs = quantize_rows(jnp.asarray(x))
    wq, ws = quantize_weight(jnp.asarray(w))
    for block_n in (512, 128, 64):
        got = int8_linear(xq, wq, xs, ws, None, out_dtype=jnp.float32,
                          block_m=16, block_n=block_n, interpret=True)
        want = (np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)).astype(np.float32)
        want = want * np.asarray(xs) * np.asarray(ws)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4,
                                   err_msg=f"block_n={block_n}")


def test_int8_linear_row_padding(rng):
    """M not divisible by the block: padded rows must not leak into outputs."""
    m, k, n = 33, 64, 64
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    xq, xs = quantize_rows(jnp.asarray(x))
    wq, ws = quantize_weight(jnp.asarray(w))
    got = int8_linear(xq, wq, xs, ws, None, out_dtype=jnp.float32,
                      block_m=32, block_n=32, interpret=True)
    assert got.shape == (m, n)
    want = (np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)).astype(np.float32)
    want = want * np.asarray(xs) * np.asarray(ws)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


def _cosine(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = (a * b).sum(axis=-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / den


@pytest.mark.parametrize("gemm_impl", ["pallas", "xla", "hybrid"])
def test_quantized_tower_cosine_gate(rng, gemm_impl):
    """encode_image_int8 must stay >= 0.999 cosine vs the bf16 tower (both
    GEMM engines: the Mosaic kernels and XLA's int8 dot_general)."""
    from team_tpu.backbone.clip import CLIPConfig, encode_image, init_clip_params
    from team_tpu.backbone.quant import encode_image_int8, quantize_vision_tower

    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(rng.standard_normal(
        (4, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32))

    ref = encode_image(params, imgs, cfg, compute_dtype=jnp.bfloat16, attn_impl="xla")
    qv = quantize_vision_tower(params)
    got = encode_image_int8(qv, imgs, cfg, attn_impl="xla",
                            gemm_impl=gemm_impl, interpret=True)
    cos = _cosine(got, ref)
    assert cos.min() >= 0.999, cos


@pytest.mark.parametrize("gemm_impl", ["static", "static3d", "static_qa",
                                       "static3d_qa", "static3d_qaf"])
def test_static_w8a8_tower_cosine_gate(rng, gemm_impl):
    """Static (calibrated, scale-folded) W8A8 towers: cosine >= 0.999 vs bf16
    on the calibration batch AND on held-out images (clipping risk is the
    failure mode static quantization adds over dynamic)."""
    from team_tpu.backbone.clip import CLIPConfig, encode_image, init_clip_params
    from team_tpu.backbone.quant import (calibrate_vision_tower,
                                         encode_image_int8,
                                         quantize_vision_tower_static)

    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    sz = cfg.vision.image_size
    imgs = jnp.asarray(rng.standard_normal((8, sz, sz, 3)).astype(np.float32))
    held = jnp.asarray(rng.standard_normal((8, sz, sz, 3)).astype(np.float32))

    calib = calibrate_vision_tower(params, imgs, cfg, attn_impl="xla")
    qv = quantize_vision_tower_static(params, calib)
    for batch in (imgs, held):
        ref = encode_image(params, batch, cfg, compute_dtype=jnp.bfloat16,
                           attn_impl="xla")
        got = encode_image_int8(qv, batch, cfg, attn_impl="xla",
                                gemm_impl=gemm_impl, interpret=True)
        cos = _cosine(got, ref)
        assert cos.min() >= 0.999, (gemm_impl, cos)


@pytest.mark.parametrize("gemm_impl", ["static3d_qi", "static3d_qi2"])
def test_integer_qk_attention_tower_cosine_gate(rng, gemm_impl):
    """Fully-integer QKᵀ attention (per-head-uniform q/k scales,
    fused_mha_packed_q3i; round-4 verdict item 1): cosine >= 0.999 vs bf16 on
    calibration AND held-out batches. qi2 additionally requantizes the softmax
    probabilities to int8 for the PV dot."""
    from team_tpu.backbone.clip import CLIPConfig, encode_image, init_clip_params
    from team_tpu.backbone.quant import (calibrate_vision_tower,
                                         encode_image_int8,
                                         quantize_vision_tower_static)

    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    sz = cfg.vision.image_size
    imgs = jnp.asarray(rng.standard_normal((8, sz, sz, 3)).astype(np.float32))
    held = jnp.asarray(rng.standard_normal((8, sz, sz, 3)).astype(np.float32))

    calib = calibrate_vision_tower(params, imgs, cfg, attn_impl="xla")
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)
    for batch in (imgs, held):
        ref = encode_image(params, batch, cfg, compute_dtype=jnp.bfloat16,
                           attn_impl="xla")
        got = encode_image_int8(qv, batch, cfg, attn_impl="xla",
                                gemm_impl=gemm_impl, interpret=True)
        cos = _cosine(got, ref)
        assert cos.min() >= 0.999, (gemm_impl, cos)


def test_static_max_softmax_matches_row_max(rng):
    """TEAM_QI_SOFTMAX=static replaces the integer-QKᵀ kernel's row-max
    reduce with the CALIBRATED per-head max logit (quant.py qk_m2; measured
    +317 img/s on chip, round 4). Softmax is shift-invariant, so the output
    must match the row-max path to (at most) one int8 step — and a payload
    saved BEFORE the feature (no qk_m2 key) must fall back to the row-max
    path rather than fail.

    The knob is read at TRACE time inside the jitted kernel wrapper, and
    qk_m2 is a traced operand — flipping the knob with the same payload
    would silently HIT the jit cache (and an earlier test's tracing choice),
    so the cache must be cleared at every flip."""
    import team_tpu.ops.mha_short as mha
    from team_tpu.backbone.clip import CLIPConfig, init_clip_params
    from team_tpu.backbone.quant import (calibrate_vision_tower,
                                         encode_image_int8,
                                         quantize_vision_tower_static)

    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    sz = cfg.vision.image_size
    imgs = jnp.asarray(rng.standard_normal((8, sz, sz, 3)).astype(np.float32))
    calib = calibrate_vision_tower(params, imgs, cfg, attn_impl="xla")
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)
    assert "qk_m2" in qv["blocks"][0]["qkv"]

    old = mha._QI_SOFTMAX
    try:
        mha._QI_SOFTMAX = "f32"
        mha.fused_mha_packed_q3i.clear_cache()
        mha.fused_mha_packed_q3i_cls.clear_cache()
        base = np.asarray(encode_image_int8(qv, imgs, cfg, attn_impl="xla",
                                            gemm_impl="static3d_qi",
                                            interpret=True))
        mha._QI_SOFTMAX = "static"
        mha.fused_mha_packed_q3i.clear_cache()
        mha.fused_mha_packed_q3i_cls.clear_cache()
        got = np.asarray(encode_image_int8(qv, imgs, cfg, attn_impl="xla",
                                           gemm_impl="static3d_qi",
                                           interpret=True))
        cos = _cosine(jnp.asarray(got), jnp.asarray(base))
        assert cos.min() >= 0.9999, cos
        # pre-feature payload: strip qk_m2 -> must fall back, not crash
        qv_old = jax.tree_util.tree_map(lambda x: x, qv)
        for qb in qv_old["blocks"]:
            qb["qkv"] = {k: v for k, v in qb["qkv"].items() if k != "qk_m2"}
        fb = np.asarray(encode_image_int8(qv_old, imgs, cfg, attn_impl="xla",
                                          gemm_impl="static3d_qi",
                                          interpret=True))
        assert np.array_equal(fb, base)
    finally:
        mha._QI_SOFTMAX = old
        mha.fused_mha_packed_q3i.clear_cache()
        mha.fused_mha_packed_q3i_cls.clear_cache()


def test_encode_image_int8_patches_matches_image_path(rng):
    """Patch-major u8 ingest (`encode_image_int8_patches`, the native
    loader's load_batch_u8_patches layout) must match the image-major u8
    path exactly — the normalize commutes with the host-side reorder, so
    the math is identical."""
    from team_tpu.backbone.clip import CLIPConfig, init_clip_params, patch_pixels
    from team_tpu.backbone.quant import (calibrate_vision_tower,
                                         encode_image_int8_patches,
                                         encode_image_int8_u8,
                                         quantize_vision_tower_static)

    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    sz = cfg.vision.image_size
    imgs_u8 = jnp.asarray(
        np.asarray(rng.integers(0, 256, (6, sz, sz, 3))).astype(np.uint8))
    calib = calibrate_vision_tower(
        params, imgs_u8.astype(jnp.float32) / 255.0, cfg, attn_impl="xla")
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)

    base = np.asarray(encode_image_int8_u8(qv, imgs_u8, cfg, attn_impl="xla",
                                           gemm_impl="static3d_qi",
                                           interpret=True))
    patches = patch_pixels(imgs_u8, cfg, compute_dtype=jnp.uint8)
    got = np.asarray(encode_image_int8_patches(qv, patches, cfg,
                                               attn_impl="xla",
                                               gemm_impl="static3d_qi",
                                               interpret=True,
                                               patch_dot="bf16"))
    np.testing.assert_array_equal(got, base)


def test_patch_dot_int8_u8_exact(rng):
    """TEAM_PATCH_DOT=int8: the u8-exact int8 patch embedding ((u8-128) @
    scale-folded weight + const) has NO activation quantization error — only
    the per-output-channel weight quantize — so tower outputs stay
    cosine-equivalent to the bf16 patch dot."""
    from team_tpu.backbone.clip import CLIPConfig, init_clip_params, patch_pixels
    from team_tpu.backbone.quant import (calibrate_vision_tower,
                                         encode_image_int8_patches,
                                         quantize_vision_tower_static)

    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    sz = cfg.vision.image_size
    imgs_u8 = jnp.asarray(
        np.asarray(rng.integers(0, 256, (4, sz, sz, 3))).astype(np.uint8))
    calib = calibrate_vision_tower(
        params, imgs_u8.astype(jnp.float32) / 255.0, cfg, attn_impl="xla")
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)
    patches = patch_pixels(imgs_u8, cfg, compute_dtype=jnp.uint8)

    base = np.asarray(encode_image_int8_patches(
        qv, patches, cfg, attn_impl="xla", gemm_impl="static3d_qi",
        patch_dot="bf16"), np.float64)
    got = np.asarray(encode_image_int8_patches(
        qv, patches, cfg, attn_impl="xla", gemm_impl="static3d_qi",
        patch_dot="int8"), np.float64)
    assert not np.array_equal(got, base)  # the engines genuinely differ
    cos = (base * got).sum(-1) / (np.linalg.norm(base, axis=-1)
                                  * np.linalg.norm(got, axis=-1))
    assert cos.min() >= 0.999, cos

    # payloads WITHOUT patch_q (older caches) fall back to the bf16 dot
    qv_old = {k: v for k, v in qv.items() if k != "patch_q"}
    old = np.asarray(encode_image_int8_patches(
        qv_old, patches, cfg, attn_impl="xla", gemm_impl="static3d_qi",
        patch_dot="int8"))
    np.testing.assert_array_equal(old, base.astype(old.dtype))


def test_cls_last_block_matches_full_tower(rng):
    """TEAM_CLS_LAST (production default on, static3d_qi): the final vision
    block runs in CLS-only form — the pooled feature is ``x[:, 0]``, so the
    last block's out-proj/LN2/MLP on the patch rows (and the last Pallas
    attention call) are dead compute. The math is exact: the int8 dots
    accumulate in int32 (order-independent), and only the bf16 PV reduction
    of the CLS row can move by float-rounding — outputs must match the full
    tower to cosine ~1 and tiny absolute error. Also: qi2 / padded inputs
    must NOT take the CLS path."""
    from team_tpu.backbone.clip import CLIPConfig, encode_image, init_clip_params
    from team_tpu.backbone.quant import (calibrate_vision_tower,
                                         encode_image_int8,
                                         quantize_vision_tower_static)

    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    sz = cfg.vision.image_size
    imgs = jnp.asarray(rng.standard_normal((6, sz, sz, 3)).astype(np.float32))
    calib = calibrate_vision_tower(params, imgs, cfg, attn_impl="xla")
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)

    full = np.asarray(encode_image_int8(qv, imgs, cfg, attn_impl="xla",
                                        gemm_impl="static3d_qi",
                                        interpret=True, cls_last=False),
                      np.float64)
    rms = np.sqrt((full ** 2).mean())
    # "mlp" (production default): full Pallas attention, CLS-only
    # out-proj/LN2/MLP — bit-identical row-0 attention, int32-exact dots
    mlp = np.asarray(encode_image_int8(qv, imgs, cfg, attn_impl="xla",
                                       gemm_impl="static3d_qi",
                                       interpret=True, cls_last="mlp"),
                     np.float64)
    assert np.abs(mlp - full).max() <= 5e-3 * rms + 1e-6
    # "kq": CLS-query Pallas kernel (same packed layout, q row 0 only)
    kq = np.asarray(encode_image_int8(qv, imgs, cfg, attn_impl="xla",
                                      gemm_impl="static3d_qi",
                                      interpret=True, cls_last="kq"),
                    np.float64)
    assert np.abs(kq - full).max() <= 5e-3 * rms + 1e-6
    # "kqs": split qkv dot (k/v all rows, q CLS row only) + split CLS kernel
    kqs = np.asarray(encode_image_int8(qv, imgs, cfg, attn_impl="xla",
                                       gemm_impl="static3d_qi",
                                       interpret=True, cls_last="kqs"),
                     np.float64)
    assert np.abs(kqs - full).max() <= 5e-3 * rms + 1e-6
    # the split form must agree with the packed-kq form to float rounding
    # (same math, identical int8 operands)
    assert np.abs(kqs - kq).max() <= 1e-3 * rms + 1e-6
    # "attn" (probe, rejected on chip): also CLS-only attention in plain jnp
    cls = np.asarray(encode_image_int8(qv, imgs, cfg, attn_impl="xla",
                                       gemm_impl="static3d_qi",
                                       interpret=True, cls_last=True),
                     np.float64)
    cos = (full * cls).sum(-1) / (np.linalg.norm(full, axis=-1)
                                  * np.linalg.norm(cls, axis=-1))
    assert cos.min() >= 0.99999, cos
    assert np.abs(cls - full).max() <= 5e-3 * rms + 1e-6

    # and the bf16 gate still holds through the CLS path
    ref = encode_image(params, imgs, cfg, compute_dtype=jnp.bfloat16,
                       attn_impl="xla")
    gate = _cosine(jnp.asarray(cls.astype(np.float32)), ref)
    assert gate.min() >= 0.999, gate

    # pre-qk_m2 payloads: CLS path must fall back to row-max softmax, not crash
    qv_old = jax.tree_util.tree_map(lambda x: x, qv)
    for qb in qv_old["blocks"]:
        qb["qkv"] = {k: v for k, v in qb["qkv"].items() if k != "qk_m2"}
    old = np.asarray(encode_image_int8(qv_old, imgs, cfg, attn_impl="xla",
                                       gemm_impl="static3d_qi",
                                       interpret=True, cls_last=True))
    cos_old = (full * old).sum(-1) / (np.linalg.norm(full, axis=-1)
                                      * np.linalg.norm(old, axis=-1))
    assert cos_old.min() >= 0.9999, cos_old


def test_rowsum_mxu_matches_reduce(rng):
    """TEAM_QI_ROWSUM=mxu rides the softmax denominator on the PV dot as an
    extra ones-column and normalizes the [S, dh] output — numerically the
    same softmax up to the denominator's bf16 rounding (p is bf16 in the PV
    dot either way; f32 accumulation), so interpret-mode outputs must match
    the in-kernel sum+divide to at most ONE int8 step, on both the
    static-max and the row-max softmax flavors. The jit cache must be
    cleared between knob flips — the knob is read at trace time."""
    import team_tpu.ops.mha_short as mha

    b, s, heads, dh = 4, 24, 4, 16
    d = heads * dh
    qkv = jnp.asarray(rng.integers(-127, 128, (b, s, 3 * d)).astype(np.int8))
    deq = jnp.asarray(rng.uniform(0.01, 0.03, (3 * d,)).astype(np.float32))
    qks = jnp.asarray(rng.uniform(1e-4, 3e-4, (heads,)).astype(np.float32))
    oinv = jnp.asarray(rng.uniform(20, 60, (d,)).astype(np.float32))
    m2 = jnp.asarray(rng.uniform(3, 6, (heads,)).astype(np.float32))

    old = mha._QI_ROWSUM
    try:
        outs = {}
        for mode in ("reduce", "mxu"):
            mha._QI_ROWSUM = mode
            mha.fused_mha_packed_q3i.clear_cache()
            mha.fused_mha_packed_q3i_cls.clear_cache()
            outs[mode] = np.asarray(mha.fused_mha_packed_q3i(
                qkv, deq, qks, oinv, heads, interpret=True,
                qk_m2=m2).astype(np.int32))
            outs[mode + "_rowmax"] = np.asarray(mha.fused_mha_packed_q3i(
                qkv, deq, qks, oinv, heads,
                interpret=True).astype(np.int32))
    finally:
        mha._QI_ROWSUM = old
        mha.fused_mha_packed_q3i.clear_cache()
        mha.fused_mha_packed_q3i_cls.clear_cache()
    for flavor in ("", "_rowmax"):
        diff = np.abs(outs["mxu" + flavor] - outs["reduce" + flavor])
        assert diff.max() <= 1, (flavor, diff.max())
        assert (diff > 0).mean() < 0.2, (flavor, (diff > 0).mean())


def test_cls_query_kernel_matches_full_kernel_row0(rng):
    """fused_mha_packed_q3i_cls computes only query ROW 0 from the same
    packed [B, S, 3D] int8 block — it must equal row 0 of the full kernel's
    output to (at most) one int8 step (the full kernel's mxu-rowsum form is
    the same ones-column math), on both the static-max and row-max softmax
    flavors."""
    import team_tpu.ops.mha_short as mha

    b, s, heads, dh = 4, 24, 4, 16
    d = heads * dh
    qkv = jnp.asarray(rng.integers(-127, 128, (b, s, 3 * d)).astype(np.int8))
    deq = jnp.asarray(rng.uniform(0.01, 0.03, (3 * d,)).astype(np.float32))
    qks = jnp.asarray(rng.uniform(1e-4, 3e-4, (heads,)).astype(np.float32))
    oinv = jnp.asarray(rng.uniform(20, 60, (d,)).astype(np.float32))
    m2 = jnp.asarray(rng.uniform(3, 6, (heads,)).astype(np.float32))

    for m2_arg in (m2, None):
        full = np.asarray(mha.fused_mha_packed_q3i(
            qkv, deq, qks, oinv, heads, interpret=True,
            qk_m2=m2_arg).astype(np.int32))[:, :1]
        cls = np.asarray(mha.fused_mha_packed_q3i_cls(
            qkv, deq, qks, oinv, heads, interpret=True,
            qk_m2=m2_arg).astype(np.int32))
        assert cls.shape == (b, 1, d)
        diff = np.abs(cls - full)
        assert diff.max() <= 1, (m2_arg is None, diff.max())


def test_ln_quant3_one_pass_matches_two_pass(rng):
    """The one-pass (E[x²]−E[x]²) fused LN→quantize matches the two-pass form
    to (at most) one int8 step on realistic activation magnitudes."""
    import team_tpu.backbone.quant as quant

    x = jnp.asarray((rng.standard_normal((2, 9, 64)) * 3 + 0.5)
                    .astype(np.float32)).astype(jnp.bfloat16)
    ln = {"scale": jnp.asarray(rng.standard_normal(64).astype(np.float32)),
          "bias": jnp.asarray(rng.standard_normal(64).astype(np.float32))}
    inv_a = jnp.asarray(np.full((1, 64), 11.7, np.float32))
    old = quant._LN_MODE
    try:
        quant._LN_MODE = "2pass"
        q2 = np.asarray(quant._ln_quant3(x, ln, inv_a), np.int32)
        quant._LN_MODE = "1pass"
        q1 = np.asarray(quant._ln_quant3(x, ln, inv_a), np.int32)
    finally:
        quant._LN_MODE = old
    assert np.abs(q1 - q2).max() <= 1


def test_quantized_linear_convenience(rng):
    x = rng.standard_normal((8, 32)).astype(np.float32)
    w = rng.standard_normal((32, 64)).astype(np.float32)
    wq, ws = quantize_weight(jnp.asarray(w))
    got = quantized_linear(jnp.asarray(x), wq, ws, out_dtype=jnp.float32,
                           interpret=True)
    ref = x @ w
    rms = np.sqrt((ref ** 2).mean())
    assert np.abs(np.asarray(got) - ref).mean() / rms < 0.02


@pytest.mark.skipif("not __import__('os').environ.get('TEAM_TESTS_TPU')")
def test_int8_linear_on_chip(rng):
    """Real-MXU check (TEAM_TESTS_TPU=1): compiled kernel == integer reference."""
    m, k, n = 512, 768, 768
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    xq, xs = quantize_rows(jnp.asarray(x))
    wq, ws = quantize_weight(jnp.asarray(w))
    got = np.asarray(int8_linear(xq, wq, xs, ws, None, out_dtype=jnp.float32))
    want = (np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)).astype(np.float32)
    want = want * np.asarray(xs) * np.asarray(ws)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_ln_quantize_matches_reference(rng):
    from team_tpu.ops.int8_matmul import ln_quantize

    m, d = 45, 64
    x = rng.standard_normal((m, d)).astype(np.float32) * 2
    g = rng.standard_normal(d).astype(np.float32)
    b = rng.standard_normal(d).astype(np.float32)
    q, s = ln_quantize(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b),
                       block_m=32, interpret=True)
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    y = (x - mu) / np.sqrt(var + 1e-5) * g + b
    amax = np.abs(y).max(-1)
    scale = np.where(amax > 0, amax / 127.0, 1.0)
    np.testing.assert_allclose(np.asarray(s)[0], scale, rtol=1e-5)
    back = np.asarray(q, np.float32) * scale[:, None]
    np.testing.assert_allclose(back, y, atol=np.abs(y).max() / 127.0 * 0.51 + 1e-6)


def test_gelu_quant_and_blockscale_chain(rng):
    """fc(gelu, fused quantize with block scales) -> proj(blockscale) must
    match the unfused float reference to quantization error."""
    from team_tpu.ops.int8_matmul import (
        int8_linear_blockscale, int8_linear_gelu_quant, quantize_rows,
        quantize_weight,
    )

    m, k, n, n2 = 40, 64, 128, 96
    x = rng.standard_normal((m, k)).astype(np.float32)
    w1 = rng.standard_normal((k, n)).astype(np.float32) * 0.3
    b1 = rng.standard_normal(n).astype(np.float32) * 0.1
    w2 = rng.standard_normal((n, n2)).astype(np.float32) * 0.3
    b2 = rng.standard_normal(n2).astype(np.float32) * 0.1

    xq, xs = quantize_rows(jnp.asarray(x))
    w1q, w1s = quantize_weight(jnp.asarray(w1))
    w2q, w2s = quantize_weight(jnp.asarray(w2))

    gq, gs = int8_linear_gelu_quant(xq, w1q, xs, w1s, jnp.asarray(b1),
                                    block_m=32, block_n=32, interpret=True)
    assert gq.shape == (m, n) and gs.shape == (n // 32, m)
    out = int8_linear_blockscale(gq, w2q, gs, w2s, jnp.asarray(b2),
                                 out_dtype=jnp.float32, block_m=32, block_n=32,
                                 interpret=True)
    # float reference (tanh-gelu to match the kernel epilogue)
    h = np.asarray(jax.nn.gelu(x @ w1 + b1, approximate=True))
    ref = h @ w2 + b2
    rms = np.sqrt((ref ** 2).mean())
    assert np.abs(np.asarray(out) - ref).mean() / rms < 0.02
    # intermediate quantization is faithful: dequant(gq) ~ gelu output
    deq = np.asarray(gq, np.float32)
    for j in range(n // 32):
        deq[:, j * 32:(j + 1) * 32] *= np.asarray(gs)[j][:, None]
    h_from_q = np.asarray(jax.nn.gelu(
        (np.asarray(xq, np.int32) @ np.asarray(w1q, np.int32)).astype(np.float32)
        * np.asarray(xs) * np.asarray(w1s) + b1, approximate=True))
    np.testing.assert_allclose(deq, h_from_q,
                               atol=np.abs(h_from_q).max() / 127.0 + 1e-5)


def test_int8_linear_kgrid_matches_plain(rng):
    from team_tpu.ops.int8_matmul import int8_linear_kgrid

    m, k, n = 48, 128, 96
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    xq, xs = quantize_rows(jnp.asarray(x))
    wq, ws = quantize_weight(jnp.asarray(w))
    want = int8_linear(xq, wq, xs, ws, None, out_dtype=jnp.float32,
                       block_m=16, block_n=32, interpret=True)
    got = int8_linear_kgrid(xq, wq, xs, ws, None, out_dtype=jnp.float32,
                            block_m=16, block_n=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    got_g = int8_linear_kgrid(xq, wq, xs, ws, None, activation="gelu",
                              out_dtype=jnp.float32, block_m=16, block_n=32,
                              block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got_g),
                               np.asarray(jax.nn.gelu(want, approximate=True)),
                               rtol=1e-5, atol=1e-5)


def test_int8_linear_nk_matches_plain(rng):
    from team_tpu.ops.int8_matmul import int8_linear_nk

    m, k, n = 40, 64, 96
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    xq, xs = quantize_rows(jnp.asarray(x))
    wq, ws = quantize_weight(jnp.asarray(w))
    want = int8_linear(xq, wq, xs, ws, None, out_dtype=jnp.float32,
                       block_m=16, block_n=32, interpret=True)
    got = int8_linear_nk(xq, jnp.asarray(np.ascontiguousarray(np.asarray(wq).T)),
                         xs, ws, None, out_dtype=jnp.float32,
                         block_m=16, block_n=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


@pytest.mark.parametrize("gemm_impl", ["pallas", "xla", "hybrid"])
def test_quantized_text_tower_cosine_gate(rng, gemm_impl):
    """encode_text_int8 (causal, eot pooling) >= 0.999 cosine vs bf16
    encode_text (round-2 verdict item 6: the text tier rides int8 too)."""
    from team_tpu.backbone.clip import CLIPConfig, encode_text, init_clip_params
    from team_tpu.backbone.quant import encode_text_int8, quantize_text_tower
    from team_tpu.backbone.tokenizer import Tokenizer

    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    toks = jnp.asarray(Tokenizer()([
        "a photo of a beetle, a type of insect",
        "a photo of a moth larva",
        "an adult dragonfly",
    ]))
    ref = encode_text(params, toks, cfg, compute_dtype=jnp.bfloat16, attn_impl="xla")
    qt = quantize_text_tower(params)
    got = encode_text_int8(qt, toks, cfg, attn_impl="xla",
                           gemm_impl=gemm_impl, interpret=True)
    cos = _cosine(got, ref)
    assert cos.min() >= 0.999, cos


@pytest.mark.parametrize("gemm_impl", ["static", "static3d", "static3d_qa",
                                       "static3d_qi"])
def test_static_text_tower_prompt_set_gate(rng, gemm_impl):
    """Static-W8A8 TEXT tower in its documented PROMPT-SET domain (round-4
    verdict item 6): calibrated on the exact finite prompt set at margin 1.0
    (nothing outside the set is ever encoded, so nothing can clip), the tier
    passes the same >= 0.999 gate as the image tower. Open-ended text stays
    on the dynamic scheme (test_quantized_text_tower_cosine_gate)."""
    from team_tpu.backbone.clip import CLIPConfig, encode_text, init_clip_params
    from team_tpu.backbone.quant import (encode_text_int8,
                                         quantize_text_tower_for_prompts)
    from team_tpu.backbone.tokenizer import Tokenizer

    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    tok = Tokenizer()
    # the production regime: class prompts x stage templates, all known ahead
    prompts = [f"a photo of insect species {i}, stage {s}"
               for i in range(8) for s in ("larva", "pupa", "adult")]
    toks = jnp.asarray(tok(prompts))
    qt = quantize_text_tower_for_prompts(params, toks, cfg, attn_impl="xla",
                                         heads=cfg.text.heads)
    ref = encode_text(params, toks, cfg, compute_dtype=jnp.bfloat16,
                      attn_impl="xla")
    got = encode_text_int8(qt, toks, cfg, attn_impl="xla",
                           gemm_impl=gemm_impl, interpret=True)
    cos = _cosine(got, ref)
    assert cos.min() >= 0.999, (gemm_impl, cos)


def test_static_calib_legacy_list_accepted(rng):
    """quantize_vision_tower_static accepts both the round-3 dict calibration
    payload and the legacy per-block list (no patch stats)."""
    from team_tpu.backbone.clip import CLIPConfig, init_clip_params
    from team_tpu.backbone.quant import (calibrate_vision_tower,
                                         quantize_vision_tower_static)

    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    sz = cfg.vision.image_size
    imgs = jnp.asarray(rng.standard_normal((2, sz, sz, 3)).astype(np.float32))
    calib = calibrate_vision_tower(params, imgs, cfg, attn_impl="xla")
    assert isinstance(calib, dict) and "blocks" in calib and "patch_in" in calib
    qv_dict = quantize_vision_tower_static(params, calib)
    qv_list = quantize_vision_tower_static(params, calib["blocks"])
    for a, b in zip(jax.tree_util.tree_leaves(qv_dict),
                    jax.tree_util.tree_leaves(qv_list)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_patch_pixels_matches_embed(rng):
    """patch_pixels() @ patch_w == embed_patches (the refactor is pure)."""
    from team_tpu.backbone.clip import (CLIPConfig, embed_patches,
                                        init_clip_params, patch_pixels)

    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    sz = cfg.vision.image_size
    imgs = jnp.asarray(rng.standard_normal((2, sz, sz, 3)).astype(np.float32))
    px = patch_pixels(imgs, cfg)
    want = embed_patches(params, imgs, cfg)
    np.testing.assert_allclose(np.asarray(px @ params["vision"]["patch_w"]),
                               np.asarray(want), rtol=1e-6)


def test_u8_native_ingest_bit_identical(rng):
    """encode_image_int8_u8 (uint8 patch-reorder + normalize folded into the
    patch-dot prologue) is BIT-identical to preprocess_batch +
    encode_image_int8 at model resolution (round-4 ingest optimization)."""
    from team_tpu.backbone.clip import CLIPConfig, init_clip_params
    from team_tpu.backbone.quant import (calibrate_vision_tower,
                                         encode_image_int8,
                                         encode_image_int8_u8,
                                         quantize_vision_tower_static)
    from team_tpu.ops.preprocess import preprocess_batch

    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    sz = cfg.vision.image_size
    u8 = jnp.asarray(rng.integers(0, 256, (4, sz, sz, 3), dtype=np.uint8))
    imgs = preprocess_batch(u8, sz)
    calib = calibrate_vision_tower(params, imgs, cfg, attn_impl="xla")
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)
    a = np.asarray(encode_image_int8(qv, imgs, cfg, attn_impl="xla",
                                     gemm_impl="static3d_qi", interpret=True))
    b = np.asarray(encode_image_int8_u8(qv, u8, cfg, attn_impl="xla",
                                        gemm_impl="static3d_qi",
                                        interpret=True))
    np.testing.assert_array_equal(a, b)


def test_flat_batch_qib_matches_qi(rng, monkeypatch):
    """gemm_impl="static3d_qib" (flat-batch emitter probe): the dots and
    LN/quantize producers run on ``[BF, (B/BF)*S, D]`` — a free bitcast of
    ``[B, S, D]`` (identical bytes; LN/quantize/residual are per-row and the
    dots contract only the last dim) — while the attention kernel views the
    packed qkv at the real shape. Outputs must be BIT-IDENTICAL to the
    shipped static3d_qi graph (kq CLS-last on both)."""
    from team_tpu.backbone.clip import CLIPConfig, init_clip_params, patch_pixels
    from team_tpu.backbone.quant import (calibrate_vision_tower,
                                         encode_image_int8_patches,
                                         quantize_vision_tower_static)

    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    sz = cfg.vision.image_size
    imgs_u8 = jnp.asarray(
        np.asarray(rng.integers(0, 256, (4, sz, sz, 3))).astype(np.uint8))
    calib = calibrate_vision_tower(
        params, imgs_u8.astype(jnp.float32) / 255.0, cfg, attn_impl="xla")
    qv = quantize_vision_tower_static(params, calib, heads=cfg.vision.heads)
    patches = patch_pixels(imgs_u8, cfg, compute_dtype=jnp.uint8)

    monkeypatch.setenv("TEAM_CLS_LAST", "kq")
    base = np.asarray(encode_image_int8_patches(
        qv, patches, cfg, attn_impl="xla", gemm_impl="static3d_qi",
        interpret=True))
    for bf in ("1", "2"):
        monkeypatch.setenv("TEAM_FLAT_B", bf)
        got = np.asarray(encode_image_int8_patches(
            qv, patches, cfg, attn_impl="xla", gemm_impl="static3d_qib",
            interpret=True))
        np.testing.assert_array_equal(got, base)
