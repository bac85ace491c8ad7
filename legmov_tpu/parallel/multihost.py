"""Multi-host (pod-slice) execution helpers.

The single-host mesh layer (legmov_tpu.parallel.sharding) extends to
multi-host pods unchanged: `jax.sharding.Mesh` over `jax.devices()` spans
all hosts once `jax.distributed.initialize()` has run, `shard_map` data
paths ride ICI within a slice and DCN across slices, and the psum
OR-reductions in `sharded_positionable` are the only cross-chip traffic
(bytes per step: poses_local x legs x 4 — trivially latency-bound, which
is why the pose axis scales embarrassingly).

Host data layout: replicate footholds (tens of MB), shard poses.  Each
host feeds only its local shard via `jax.make_array_from_process_local_data`
so no host ever materializes the global pose batch.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kw) -> None:
    """`jax.distributed.initialize` passthrough (no-op if already up).

    On Cloud TPU pods the coordinator/process env is auto-detected; kwargs
    (coordinator_address, num_processes, process_id, local_device_ids)
    override for manual setups — they are forwarded verbatim.
    """
    # NOTE: must not call jax.process_count()/jax.devices() here — those
    # initialize the XLA backend, after which jax.distributed.initialize
    # refuses to run; inspect the distributed client state directly.
    # jax._src is a private namespace: if the probe breaks on a JAX
    # upgrade, fall through and let initialize() itself report
    # already-initialized.
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return  # already initialized
    except ImportError:
        pass
    if kw:
        jax.distributed.initialize(**kw)  # manual setup: errors surface
        return
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-process / no coordinator env — stay local


def global_pose_batch(
    local_poses: np.ndarray, mesh: Mesh, axis: str = "poses"
):
    """Assemble a globally-sharded pose array from per-host local shards.

    Every process passes its own ``[P_local, ...]`` chunk; the result is a
    global ``[P_local * n_processes, ...]`` jax.Array sharded over ``axis``
    without any host gathering.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_poses)


def gather_to_host(arr) -> np.ndarray:
    """Fetch a (possibly sharded) result fully to the local host."""
    return np.asarray(jax.device_get(arr))
