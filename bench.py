"""Headline benchmark: CLIP ViT-B/16 image-encode throughput on one chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``. The
north-star target is >=10k images/sec/chip ViT-B/16 feature extraction on v5e
(BASELINE.json); ``vs_baseline`` is value / 10000.

Protocol: bf16 compute, Pallas flash attention, device-resident normalized
inputs (the deterministic IIMinsects preprocess runs once on host — frozen
backbone + deterministic transform makes features cacheable, so steady-state
training throughput is bounded by exactly this encode path).
"""

from __future__ import annotations

import json
import time

from team_tpu.utils.jax_cache import enable as _enable_xla_cache
_enable_xla_cache()
import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.backbone.clip import CLIPConfig, encode_image, init_clip_params

BASELINE_TARGET = 10_000.0  # images/sec/chip (BASELINE.json north star)


def bench_image_encode(batch_size: int = 256, iters: int = 20, repeats: int = 3,
                       compute_dtype=jnp.bfloat16, attn_impl: str = "auto") -> float:
    """Times ``iters`` encodes inside ONE jitted ``lax.scan`` so per-dispatch
    tunnel latency (the axon proxy adds ~100ms+ per call) does not pollute the
    device-throughput number. Each iteration is chained on the previous output
    so no runtime layer can dedupe repeated executions; completion is fenced by
    a host fetch (the tunnel does not honor ``block_until_ready``)."""
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)

    def body(x, _):
        feats = encode_image(params, x, cfg, compute_dtype=compute_dtype,
                             attn_impl=attn_impl)
        return x + jnp.mean(feats) * 1e-6, jnp.sum(feats)

    run = jax.jit(lambda x: jax.lax.scan(body, x, None, length=iters)[1])
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch_size, 224, 224, 3)).astype(np.float32))

    float(jnp.sum(run(x)))  # compile + warmup (host fetch = completion fence)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(run(x)))
        dt = time.perf_counter() - t0
        best = max(best, batch_size * iters / dt)
    return best


def main() -> None:
    ips = bench_image_encode()
    print(json.dumps({
        "metric": "images/sec/chip CLIP ViT-B/16 image encode",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_TARGET, 4),
    }))


if __name__ == "__main__":
    main()
