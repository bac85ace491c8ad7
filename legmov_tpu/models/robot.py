"""Multi-leg robot model: a stacked pytree of legs.

The reference hardcodes the robot as ``LegCount`` copies of one leg geometry
mounted at compile-time azimuths (reference settings.h:42-45 ``LegMount``,
several_leg.cpp:19-23).  Here the robot is simply a :class:`LegDimensions`
pytree with a leading leg axis, so every single-leg op extends to the robot
via ``vmap`` over that axis — the TPU-native replacement for the reference's
per-leg kernel relaunch loop (several_leg.cu:633-679).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from legmov_tpu.config import PI
from legmov_tpu.models.leg import LegDimensions, get_m2_leg, get_moonbot_leg

#: Default quadruped mount azimuths (reference settings.h:42
#: ``LegMount = {0, pi/4, pi/2, 3pi/4}``).
QUAD_MOUNTS: tuple[float, ...] = (0.0, PI / 4, PI / 2, 3 * PI / 4)

#: Hexapod mount azimuths (uniform 60-degree spacing).
HEX_MOUNTS: tuple[float, ...] = tuple(k * PI / 3 for k in range(6))


def stack_legs(legs: Sequence[LegDimensions]) -> LegDimensions:
    """Stack individual legs into one pytree with a leading leg axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *legs)


def make_robot(
    mounts: Sequence[float] = QUAD_MOUNTS,
    leg_fn: Callable[[float], LegDimensions] = get_m2_leg,
) -> LegDimensions:
    """Robot = one leg geometry replicated at each mount azimuth.

    ``leg_fn(azimuth)`` builds one leg (default: the benchmark M2 leg,
    reference settings.h:58).  Returns a stacked ``LegDimensions`` whose
    every field has a leading ``[L]`` axis.
    """
    return stack_legs([leg_fn(float(a)) for a in mounts])


def get_moonbot_robot(mounts: Sequence[float] = QUAD_MOUNTS) -> LegDimensions:
    return make_robot(mounts, get_moonbot_leg)


def get_m2_robot(mounts: Sequence[float] = QUAD_MOUNTS) -> LegDimensions:
    return make_robot(mounts, get_m2_leg)


def leg_count(robot: LegDimensions) -> int:
    """Number of legs in a stacked robot (static)."""
    return int(np.shape(robot.body_angle)[0])
