from legmov_tpu.oracle.numpy_ref import (
    oracle_reachability,
    oracle_distance,
    oracle_forward_kinematics,
)

__all__ = [
    "oracle_reachability",
    "oracle_distance",
    "oracle_forward_kinematics",
]
