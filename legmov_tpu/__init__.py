"""legmov_tpu — TPU-native legged-robot movability framework.

A brand-new JAX / XLA / Pallas framework for real-time assessment of 3-DoF
(yaw-pitch-pitch) legged-robot movability:

* **Reachability** — for every point of a pointcloud, can the leg tip reach it?
* **Distance** — for every point, the 3-D vector to the closest point on the
  boundary of the leg's reachable volume.
* **Positionability** — from which body poses can a multi-legged robot stand
  with >= K of N legs on valid footholds of a terrain pointcloud?

The math is the closed-form circle-decomposition workspace geometry of the
CUDA reference (2lian/Legged-Robot-Movability-Cuda, see /root/reference
circles.cu.h / one_leg.cu), re-derived here as dense, branch-free, fp32
vectorized array programs: per-point CUDA threads become VPU-wide lanes,
thread-divergent circle stacks become masked selects over precomputed circle
tables, the CUDA octree with dynamic parallelism becomes host-driven
breadth-first refinement + Morton-bucketed foothold grids, and single-GPU
execution becomes pose/point-sharded `shard_map` over a device mesh.
"""

from legmov_tpu.models.leg import (
    LegDimensions,
    leg_factory,
    get_moonbot_leg,
    get_m2_leg,
    forward_kinematics,
)
from legmov_tpu.models.workspace import LegWorkspace, build_workspace
from legmov_tpu.ops.reachability import reachability, reachability_batch
from legmov_tpu.ops.distance import distance, distance_batch
from legmov_tpu.ops.orientation import (
    rotate_leg_data,
    reachability_oriented,
    distance_oriented,
)

__version__ = "0.1.0"

__all__ = [
    "LegDimensions",
    "leg_factory",
    "get_moonbot_leg",
    "get_m2_leg",
    "forward_kinematics",
    "LegWorkspace",
    "build_workspace",
    "reachability",
    "reachability_batch",
    "distance",
    "distance_batch",
    "rotate_leg_data",
    "reachability_oriented",
    "distance_oriented",
]
