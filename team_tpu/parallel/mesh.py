"""Device mesh construction and sharding helpers.

TPU-native replacement of the reference's single-process ``nn.DataParallel``
(reference ``models/proof.py:312-313``) and its dead DDP scaffolding
(``utils/toolkit.py:111-126``): a 1-D ``("data",)`` mesh (extensible to
``("data", "model")``) with batch sharding over ICI, replicated parameters, and
``all_gather``-based global CLIP loss (``team_tpu.losses.clip_loss``).

Multi-host entry: call :func:`maybe_init_distributed` before mesh creation; each
host contributes its local devices and shards its own slice of the batch.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` when multi-host coordinates are provided."""
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes, process_id=process_id)


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Build a mesh over all devices. ``shape=None`` -> 1-D mesh of every device."""
    devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    arr = np.asarray(devices[: int(np.prod(shape))]).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names[: arr.ndim]))


@dataclasses.dataclass
class MeshContext:
    """Bundles the mesh with the standard shardings used by the learners.

    * ``batch``: leading dim sharded over the data axis;
    * ``replicated``: parameters / small state everywhere.
    """

    mesh: Mesh
    data_axis: str = "data"

    @property
    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.data_axis))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    @property
    def n_data(self) -> int:
        return self.mesh.shape[self.data_axis]

    def shard_batch(self, tree):
        """Device-put a host batch with the leading axis split over the data axis.
        Pads the batch up to a multiple of the axis size with repeated samples and
        returns (sharded_tree, valid_count)."""
        import jax.numpy as jnp

        def pad(x):
            n = x.shape[0]
            rem = (-n) % self.n_data
            if rem:
                x = np.concatenate([x, x[:rem]], axis=0)
            return x

        valid = jax.tree_util.tree_leaves(tree)[0].shape[0]
        padded = jax.tree_util.tree_map(pad, tree)
        out = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), self.batch_sharding), padded
        )
        return out, valid

    def replicate(self, tree):
        import jax.numpy as jnp
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), self.replicated), tree
        )


def host_shard_indices(n: int, host_id: Optional[int] = None,
                       host_count: Optional[int] = None) -> np.ndarray:
    """Deterministic per-host slice of a dataset of ``n`` samples for multi-host
    data parallelism: host ``i`` owns indices ``i, i+H, i+2H, ...`` (balanced,
    order-stable, no coordination needed). Single-host returns everything."""
    host_id = jax.process_index() if host_id is None else host_id
    host_count = jax.process_count() if host_count is None else host_count
    return np.arange(host_id, n, host_count)


def shard_clip_params(params, mesh: Mesh, model_axis: str = "model"):
    """Tensor-parallel shardings for the CLIP towers over a ``("data","model")``
    mesh: attention qkv/out and MLP weights split on the head/hidden dimension,
    embeddings and norms replicated. The towers are plain einsums, so placing
    these shardings on the params is all XLA's SPMD partitioner needs — the
    reference has no TP at all (SURVEY §2.2: optional framework surface)."""

    def spec_for(path: str, x):
        if x.ndim < 2:
            return P()
        if any(k in path for k in ("qkv_w", "fc_w")):
            return P(None, model_axis)       # split output/hidden dim
        if any(k in path for k in ("out_w", "proj_w")):
            return P(model_axis, None)       # split input dim (row-parallel)
        return P()

    def walk(tree, path=""):
        if isinstance(tree, dict):
            return {k: walk(v, path + "/" + k) for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v, path) for v in tree]
        return jax.device_put(tree, NamedSharding(mesh, spec_for(path, tree)))

    return walk(params)


def describe_devices() -> str:
    devs = jax.devices()
    txt = f"{len(devs)} device(s): {devs[0].platform}"
    logging.info(txt)
    return txt
