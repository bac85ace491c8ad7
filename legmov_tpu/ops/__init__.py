from legmov_tpu.ops.reachability import reachability, reachability_batch
from legmov_tpu.ops.distance import distance, distance_batch
from legmov_tpu.ops.orientation import (
    rotate_leg_data,
    reachability_oriented,
    distance_oriented,
)

__all__ = [
    "reachability",
    "reachability_batch",
    "distance",
    "distance_batch",
    "rotate_leg_data",
    "reachability_oriented",
    "distance_oriented",
]
