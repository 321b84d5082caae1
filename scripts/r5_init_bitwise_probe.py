"""Round-5 drift bisect, step 1: is the ONE-graph jitted init
(learners/proof.py ensure-initialized fast path) bitwise-identical to the
eager form ON THE REAL TPU?

Context: the CPU golden protocol is bit-for-bit green with the jitted init,
but the on-chip protocol curve drifted (27.416 -> 26.54 avg). Candidate
sources in the uncommitted diff: (a) jitted vs eager init RNG/numerics,
(b) host-side proto_mask flag, (c) device-scalar update_history. (b)/(c) are
bookkeeping; (a) is the only one that touches weights. This probe settles (a)
in seconds instead of a 280 s protocol A/B.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from team_tpu.utils import jax_cache  # noqa: F401  (persistent compile cache)
from team_tpu.learners.proof_net import ProofDims, init_buffers, init_proof_params


def main():
    print("devices:", jax.devices())
    dims = ProofDims(
        feature_dim=512, max_classes=20, max_tasks=10, num_states=5,
        ctx_len=10, gcn_layers=2,
    )
    ls = 4.6052  # ln(100), the CLIP init value
    key = jax.random.PRNGKey(42)

    eager_tr, eager_aux = init_proof_params(key, dims, ls)
    eager_buf = init_buffers(dims)

    (jit_tr, jit_aux), jit_buf = jax.jit(
        lambda k: (init_proof_params(k, dims, ls), init_buffers(dims))
    )(key)

    bad = []

    def cmp(name, a, b):
        a = np.asarray(a)
        b = np.asarray(b)
        if a.dtype != b.dtype or a.shape != b.shape:
            bad.append((name, f"meta {a.dtype}{a.shape} vs {b.dtype}{b.shape}"))
            return
        if not np.array_equal(a, b):
            d = np.max(np.abs(a.astype(np.float64) - b.astype(np.float64)))
            n = int(np.sum(a != b))
            bad.append((name, f"{n} elems differ, max abs diff {d:.3e}"))

    for side, ea, ji in (("trainable", eager_tr, jit_tr),
                         ("aux", eager_aux, jit_aux),
                         ("buffers", eager_buf, jit_buf)):
        el = jax.tree_util.tree_leaves_with_path(ea)
        jl = jax.tree_util.tree_leaves(ji)
        assert len(el) == len(jl)
        for (path, a), b in zip(el, jl):
            cmp(side + jax.tree_util.keystr(path), a, b)

    if bad:
        print(f"DRIFT: {len(bad)} leaves differ (eager vs jitted init on TPU):")
        for name, why in bad:
            print(f"  {name}: {why}")
    else:
        print("BITWISE IDENTICAL: jitted init == eager init on this chip")


if __name__ == "__main__":
    main()
