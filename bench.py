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


def bench_image_encode(batch_size: int = 256, iters: int = 16, repeats: int = 3,
                       compute_dtype=jnp.bfloat16, attn_impl: str = "auto") -> float:
    """Dispatches ``iters`` encodes on independent pre-uploaded inputs and
    fences once at the end with a host fetch (the axon tunnel does not honor
    ``block_until_ready``; independent inputs also defeat any result caching a
    proxy layer might do). ``attn_impl='auto'`` resolves to XLA fused attention
    at CLIP's 197-token sequence — measured faster than the flash kernel there."""
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)

    fn = jax.jit(lambda p, x: encode_image(p, x, cfg, compute_dtype=compute_dtype,
                                           attn_impl=attn_impl))
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((batch_size, 224, 224, 3)).astype(np.float32))
          for _ in range(iters)]

    float(jnp.sum(fn(params, xs[0])))  # compile + warmup
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [fn(params, x) for x in xs]
        float(jnp.sum(outs[-1])) + float(jnp.sum(outs[0]))
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
