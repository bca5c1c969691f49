"""Device mesh construction and sharding helpers.

The reference's only parallelism is torch DataParallel/DDP over NCCL
(scripts/train_mhop.py:84,144-148).  Here all parallelism is expressed through
a `jax.sharding.Mesh` with two logical axes:

  * ``data``  — batch/data parallelism (gradients psum over ICI)
  * ``index`` — row-sharding of the dense corpus index for distributed MIPS
                (per-shard top-k + all-gather merge), and tensor-parallel
                sharding of encoder FFN/heads when enabled.

On a v4-8 the natural layout is a (data=2, index=4) or (1, 8) mesh; tests use
8 virtual CPU devices via --xla_force_host_platform_device_count=8.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
INDEX_AXIS = "index"


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(
    data: Optional[int] = None,
    index: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D (data, index) mesh over the available devices.

    Defaults: all devices on the ``index`` axis (retrieval-serving layout —
    the index is the big thing; queries are cheap to replicate).
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data is None and index is None:
        data, index = 1, n
    elif data is None:
        data = n // index
    elif index is None:
        index = n // data
    # fail HERE, not deep inside shard_map/device_put: an axis larger than
    # the device count floor-divides the other axis to 0 and built an
    # EMPTY mesh.  Using a strict subset of devices stays allowed (e.g.
    # --data-parallel 2 on an 8-device host).
    if data < 1 or index < 1 or data * index > n:
        raise ValueError(
            f"mesh {data}x{index} does not fit the {n} available "
            f"device(s)")
    arr = np.asarray(devs[: data * index]).reshape(data, index)
    return Mesh(arr, (DATA_AXIS, INDEX_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, rank: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (rank - 1))))


def index_sharded(mesh: Mesh, rank: int = 2) -> NamedSharding:
    """Shard the leading (row) dim over the index axis."""
    return NamedSharding(mesh, P(INDEX_AXIS, *([None] * (rank - 1))))


def host_local_batch_to_global(batch, mesh: Mesh):
    """Pod mode: turn each process's LOCAL slice of a batch into global
    jax.Arrays sharded over the mesh's data axis.

    The reference's DDP path shipped WITHOUT a DistributedSampler
    (SURVEY.md §2.11 — true multi-process training duplicated data); here
    each process loads only its slice and this assembles the global batch a
    multi-process jit requires (host numpy can't be consumed by a jit whose
    sharding spans non-addressable devices).  No-op in single-process runs.
    """
    if jax.process_count() == 1:
        return batch
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P(DATA_AXIS)), batch)


def replicate_to_global(tree, mesh: Mesh):
    """Pod mode: commit identical per-process host values (params, opt
    state) as globally-replicated jax.Arrays.  No-op single-process."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P()), tree)
