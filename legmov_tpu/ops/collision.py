"""Geometric pruning predicates: sphere / cylinder containment masks.

Semantics of reference collision.cu.h:5-23 (``in_sphere`` / ``in_cylinder``)
and the block-reduction kernels built on them (collision.cu:40-146): for
each *center* (body-pose candidate), does ANY *target* (terrain point) fall
inside the shape?  The CUDA block-per-center + warp-vote pattern becomes a
dense ``[P, F]`` predicate matrix reduced with ``jnp.any`` — XLA fuses the
predicate into the reduction so the matrix is never materialized in HBM.

Squared-radius comparisons throughout (no sqrt), exactly like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

_f32 = jnp.float32


def in_sphere(centers: jnp.ndarray, targets: jnp.ndarray, radius) -> jnp.ndarray:
    """``[P, F]`` mask: target f within ``radius`` of center p.

    Reference collision.cu.h:5-11 (strict ``<`` on squared distance).
    """
    d = targets[None, :, :] - centers[:, None, :]
    return jnp.sum(d * d, axis=-1) < _f32(radius) * _f32(radius)


def any_in_sphere(centers, targets, radius) -> jnp.ndarray:
    """``[P]`` mask: any target inside the sphere around center p.

    Reference ``in_sphere_mem_kernel`` (collision.cu:40-66).
    """
    return jnp.any(in_sphere(centers, targets, radius), axis=-1)


def in_cylinder(centers, targets, radius, plus_z, minus_z) -> jnp.ndarray:
    """``[P, F]`` mask: target inside the vertical cylinder around center p.

    Reference collision.cu.h:12-23: horizontal squared distance < radius^2
    AND ``minus_z < dz < plus_z`` (dz = target z - center z).
    """
    d = targets[None, :, :] - centers[:, None, :]
    horiz = d[..., 0] * d[..., 0] + d[..., 1] * d[..., 1]
    dz = d[..., 2]
    return (
        (horiz < _f32(radius) * _f32(radius))
        & (dz < _f32(plus_z))
        & (dz > _f32(minus_z))
    )


def any_in_cylinder(centers, targets, radius, plus_z, minus_z) -> jnp.ndarray:
    """``[P]`` mask (reference ``in_cylinder_mem_kernel``, collision.cu:119-146)."""
    return jnp.any(in_cylinder(centers, targets, radius, plus_z, minus_z), axis=-1)
