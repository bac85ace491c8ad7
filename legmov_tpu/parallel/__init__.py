"""Multi-chip scaling layer: mesh construction + sharded solvers.

The reference is single-process single-GPU (SURVEY.md section 2.10); its
"scale axis" is the (body-poses x footholds x legs x orientations) product.
Here that product is laid out on a ``jax.sharding.Mesh``: the pose axis is
data-parallel across chips, the foothold axis can be split across a second
mesh axis with the per-leg OR-reduction finished by an ``any``-``psum`` over
ICI — the TPU-native replacement for CUDA warp votes + atomics.
"""

from legmov_tpu.parallel.sharding import (
    make_mesh,
    sharded_reachability,
    sharded_distance,
    sharded_positionable,
    sharded_csr_positionable,
    sharded_grid_positionable,
    sharded_cell_eval,
    sharded_csr_cell_eval,
)

__all__ = [
    "make_mesh",
    "sharded_reachability",
    "sharded_distance",
    "sharded_positionable",
    "sharded_csr_positionable",
    "sharded_grid_positionable",
    "sharded_cell_eval",
    "sharded_csr_cell_eval",
]
