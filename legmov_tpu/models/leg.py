"""Leg kinematic parameters and forward kinematics.

Re-derivation of the reference robot model layer:
``LegDimensions`` (reference HeaderCPP.h:19-52), the factory functions
(reference static_variables.cpp:6-93) and the YPP forward kinematics
(reference one_leg.cu:377-402).

All angles are radians, all lengths millimetres, all dtypes float32.  The
struct is a NamedTuple so it is a JAX pytree: it can be traced, vmapped over
(e.g. a batch of per-orientation legs) and passed through jit boundaries.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

_f32 = np.float32
PI_F32 = _f32(np.pi)


class LegDimensions(NamedTuple):
    """Kinematic parameters of one 3-DoF yaw-pitch-pitch leg.

    Frames: the leg is mounted on the body at azimuth ``body_angle`` about
    +z, at planar offset ``body`` mm from the body origin; the coxa yaw axis
    is tilted by ``coxa_pitch`` about the (mounted) y axis.  ``tibia_absolute_
    pos/neg`` bound the tibia's *absolute* orientation (relative to the body
    horizon, e.g. "tibia always points down"), not the tibia joint itself.
    """

    body_angle: jnp.ndarray  # leg mount azimuth about body z [rad]
    body: jnp.ndarray  # body origin -> coxa joint offset [mm]
    coxa_pitch: jnp.ndarray  # coxa axis pitch [rad]
    coxa_length: jnp.ndarray  # coxa joint -> femur joint [mm]
    femur_length: jnp.ndarray  # femur joint -> tibia joint [mm]
    tibia_length: jnp.ndarray  # tibia joint -> tip [mm]
    tibia_absolute_pos: jnp.ndarray  # absolute tibia orientation bounds [rad]
    tibia_absolute_neg: jnp.ndarray
    max_angle_coxa: jnp.ndarray  # joint limits [rad]
    min_angle_coxa: jnp.ndarray
    max_angle_femur: jnp.ndarray
    min_angle_femur: jnp.ndarray
    max_angle_tibia: jnp.ndarray
    min_angle_tibia: jnp.ndarray

    def replace(self, **kw) -> "LegDimensions":
        return self._replace(**kw)


def leg_factory(
    azimuth: float,
    body2coxa: float,
    coxa_pitch_deg: float,
    coxa2femur: float,
    femur2tibia: float,
    tibia2tip: float,
    coxa_angle_deg: float,
    femur_angle_deg: float,
    tibia_angle_deg: float,
    tib_abs_pos_deg: float,
    tib_abs_neg_deg: float,
) -> LegDimensions:
    """Build a :class:`LegDimensions` from the reference's parameterization.

    Numerically identical to reference static_variables.cpp:6-42, including
    the unusual absolute-tibia conventions:

    * ``tibia_absolute_pos = tib_abs_pos_deg/180*pi - coxa_pitch``
    * ``tibia_absolute_neg = (-180 - tib_abs_neg_deg)/180*pi - coxa_pitch``

    and symmetric joint limits ``+-{coxa,femur,tibia}_angle_deg``.
    Computation is done in strict float32 so the resulting parameters match
    the fp32 reference bit-for-bit.
    """
    coxa_pitch = _f32(coxa_pitch_deg) / _f32(180.0) * PI_F32
    tib_abs_pos = _f32(tib_abs_pos_deg) / _f32(180.0) * PI_F32 - coxa_pitch
    tib_abs_neg = (
        (_f32(-180.0) - _f32(tib_abs_neg_deg)) / _f32(180.0) * PI_F32 - coxa_pitch
    )
    vals = dict(
        body_angle=_f32(azimuth),
        body=_f32(body2coxa),
        coxa_pitch=coxa_pitch,
        coxa_length=_f32(coxa2femur),
        femur_length=_f32(femur2tibia),
        tibia_length=_f32(tibia2tip),
        tibia_absolute_pos=tib_abs_pos,
        tibia_absolute_neg=tib_abs_neg,
        max_angle_coxa=PI_F32 / _f32(180.0) * _f32(coxa_angle_deg),
        min_angle_coxa=-PI_F32 / _f32(180.0) * _f32(coxa_angle_deg),
        max_angle_femur=PI_F32 / _f32(180.0) * _f32(femur_angle_deg),
        min_angle_femur=-PI_F32 / _f32(180.0) * _f32(femur_angle_deg),
        max_angle_tibia=PI_F32 / _f32(180.0) * _f32(tibia_angle_deg),
        min_angle_tibia=-PI_F32 / _f32(180.0) * _f32(tibia_angle_deg),
    )
    return LegDimensions(**{k: jnp.asarray(v, jnp.float32) for k, v in vals.items()})


def get_moonbot_leg(azimuth: float = 0.0) -> LegDimensions:
    """Moonbot leg (reference static_variables.cpp:44-67)."""
    return leg_factory(
        azimuth=azimuth,
        body2coxa=181.0,
        coxa_pitch_deg=0.0,
        coxa2femur=65.5,
        femur2tibia=129.0,
        tibia2tip=160.0,
        coxa_angle_deg=60.0,
        femur_angle_deg=90.0,
        tibia_angle_deg=120.0,
        tib_abs_pos_deg=-5.0,
        tib_abs_neg_deg=-5.0,
    )


def get_m2_leg(azimuth: float = 0.0) -> LegDimensions:
    """M2 leg with -45 deg coxa pitch (reference static_variables.cpp:69-93).

    This is the leg selected by the reference benchmark (settings.h:58
    ``RobotNumb = 1``), so it is the flagship geometry for benchmarks here.
    """
    return leg_factory(
        azimuth=azimuth,
        body2coxa=181.0,
        coxa_pitch_deg=-45.0,
        coxa2femur=65.5,
        femur2tibia=129.0,
        tibia2tip=135.0,
        coxa_angle_deg=60.0,
        femur_angle_deg=90.0,
        tibia_angle_deg=120.0,
        tib_abs_pos_deg=-5.0,
        tib_abs_neg_deg=-5.0,
    )


def forward_kinematics(angles: jnp.ndarray, leg: LegDimensions) -> jnp.ndarray:
    """Tip position for joint angles ``[..., 3]`` = (coxa, femur, tibia).

    Standard YPP chain (semantics of reference one_leg.cu:377-402): yaw the
    whole leg by the coxa angle, then femur and tibia pitch in the coxa-
    aligned vertical plane; the tibia angle is relative to the femur.
    Note the reference FK ignores ``coxa_pitch`` (it models the coxa_pitch=0
    moonbot); we keep that semantic and it is exercised only on such legs.
    """
    angles = jnp.asarray(angles, jnp.float32)
    coxa, femur, tibia = angles[..., 0], angles[..., 1], angles[..., 2]
    cos_h, sin_h = jnp.cos(coxa), jnp.sin(coxa)
    cf, sf = jnp.cos(femur), jnp.sin(femur)
    ct, st = jnp.cos(tibia + femur), jnp.sin(tibia + femur)
    horiz = leg.coxa_length + cf * leg.femur_length + ct * leg.tibia_length
    x = leg.body + cos_h * horiz
    y = sin_h * horiz
    z = sf * leg.femur_length + st * leg.tibia_length
    return jnp.stack([x, y, z], axis=-1)
