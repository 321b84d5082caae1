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
                # tile: rem can exceed n when the batch is smaller than the
                # data axis (e.g. 3 samples on an 8-device mesh needs 5 pads)
                reps = np.tile(np.arange(n), -(-rem // n))[:rem]
                x = np.concatenate([x, x[reps]], axis=0)
            return x

        valid = jax.tree_util.tree_leaves(tree)[0].shape[0]
        padded = jax.tree_util.tree_map(pad, tree)
        out = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), self.batch_sharding), padded
        )
        return out, valid

    def replicate(self, tree):
        """Replicate host-local values over the mesh. Multi-host: every process
        holds the same value (deterministic orchestration), so each contributes
        its local copy to the global replicated array."""
        import jax.numpy as jnp

        if jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    self.replicated, np.asarray(x)),
                tree,
            )
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), self.replicated), tree
        )

    @property
    def stacked_batch_sharding(self) -> NamedSharding:
        """[K, B, ...] epoch-scan batches: scan dim replicated, batch dim split."""
        return NamedSharding(self.mesh, P(None, self.data_axis))

    def shard_stacked(self, tree):
        """Place stacked [K, B, ...] batches with B split over the data axis.

        Multi-host: each process contributes only the rows its devices own
        (``jax.make_array_from_process_local_data``); the per-process slice is
        derived from the sharding's addressable index map, so no cross-host
        traffic happens at placement time."""
        sh = self.stacked_batch_sharding

        def put(x):
            x = np.asarray(x)
            if jax.process_count() == 1:
                return jax.device_put(x, sh)
            lo, hi = process_local_span(sh, x.shape, dim=1)
            return jax.make_array_from_process_local_data(sh, x[:, lo:hi], x.shape)

        return jax.tree_util.tree_map(put, tree)


def host_shard_indices(n: int, host_id: Optional[int] = None,
                       host_count: Optional[int] = None) -> np.ndarray:
    """Deterministic per-host slice of a dataset of ``n`` samples for multi-host
    data parallelism: host ``i`` owns indices ``i, i+H, i+2H, ...`` (balanced,
    order-stable, no coordination needed). Single-host returns everything.

    Consumed by the learners' feature-extraction path (each host encodes only
    its shard, then the shards are gathered — see
    :func:`gather_host_shards` and ``BaseLearner._extract_vectors``)."""
    host_id = jax.process_index() if host_id is None else host_id
    host_count = jax.process_count() if host_count is None else host_count
    return np.arange(host_id, n, host_count)


def gather_host_shards(per_host_chunks: Sequence[np.ndarray], n: int) -> np.ndarray:
    """Reassemble host-sharded results into global dataset order.

    ``per_host_chunks[h]`` holds the rows for ``host_shard_indices(n, h, H)`` in
    shard order; the output places row ``i`` of the ORIGINAL dataset at index
    ``i``. Pure index math — unit-testable without real processes."""
    host_count = len(per_host_chunks)
    first = per_host_chunks[0]
    out = np.empty((n,) + first.shape[1:], dtype=first.dtype)
    for h, chunk in enumerate(per_host_chunks):
        out[host_shard_indices(n, h, host_count)] = chunk
    return out


def allgather_host_shards(local: np.ndarray, n: int) -> np.ndarray:
    """All-gather per-host feature shards (rows ``host_shard_indices(n)``) into
    the full ``[n, ...]`` array in global dataset order on every host.

    Shards are padded to equal length for the collective (``process_allgather``
    requires uniform shapes), then reassembled with :func:`gather_host_shards`."""
    host_count = jax.process_count()
    if host_count == 1:
        return local
    from jax.experimental import multihost_utils

    per = -(-n // host_count)
    padded = np.zeros((per,) + local.shape[1:], local.dtype)
    padded[: len(local)] = local
    gathered = np.asarray(multihost_utils.process_allgather(padded))  # [H, per, ...]
    chunks = [gathered[h][: len(host_shard_indices(n, h, host_count))]
              for h in range(host_count)]
    return gather_host_shards(chunks, n)


def process_local_span(sharding: NamedSharding, global_shape, dim: int = 1):
    """Contiguous [lo, hi) span of ``dim`` owned by this process under
    ``sharding`` (used to feed ``make_array_from_process_local_data``)."""
    idx_map = sharding.addressable_devices_indices_map(tuple(global_shape))
    starts, stops = [], []
    for idx in idx_map.values():
        sl = idx[dim]
        starts.append(0 if sl.start is None else sl.start)
        stops.append(global_shape[dim] if sl.stop is None else sl.stop)
    return min(starts), max(stops)


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

    def place(x, spec):
        sh = NamedSharding(mesh, spec)
        if jax.process_count() > 1:
            # multi-host: device_put cannot target non-addressable devices;
            # every process holds the identical full array (deterministic
            # init), so each fills its addressable shards from it
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sh,
                                                lambda idx, x=x: x[idx])
        return jax.device_put(x, sh)

    def walk(tree, path=""):
        if isinstance(tree, dict):
            return {k: walk(v, path + "/" + k) for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v, path) for v in tree]
        return place(tree, spec_for(path, tree))

    return walk(params)


def describe_devices() -> str:
    devs = jax.devices()
    txt = f"{len(devs)} device(s): {devs[0].platform}"
    logging.info(txt)
    return txt
