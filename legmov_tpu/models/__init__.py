from legmov_tpu.models.leg import (
    LegDimensions,
    leg_factory,
    get_moonbot_leg,
    get_m2_leg,
    forward_kinematics,
)
from legmov_tpu.models.workspace import LegWorkspace, build_workspace

__all__ = [
    "LegDimensions",
    "leg_factory",
    "get_moonbot_leg",
    "get_m2_leg",
    "forward_kinematics",
    "LegWorkspace",
    "build_workspace",
]
