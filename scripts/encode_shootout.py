"""End-to-end encode throughput per attention impl (IMPL env var).

Exactly bench.py's measurement (scanned uint8 batches, fused preprocess) —
the routing authority after two isolated-measurement inversions."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from team_tpu.utils.jax_cache import enable as _enable
_enable()

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.backbone.clip import CLIPConfig, encode_image, init_clip_params
from team_tpu.ops.preprocess import preprocess_batch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import bench_scanned  # noqa: E402


def main():
    impl = os.environ.get("IMPL", "mha_packed_proj")
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, 256, (16, 256, 224, 224, 3), dtype=np.uint8))

    def enc(p, x_u8):
        x = preprocess_batch(x_u8, cfg.vision.image_size)
        return encode_image(p, x, cfg, compute_dtype=jnp.bfloat16, attn_impl=impl)

    ips = bench_scanned(enc, params, xs, 256)
    print(f"{impl}: {ips:.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
