"""Mosaic TPU-lowerability of every Pallas kernel, checked on CPU.

Cross-platform lowering (``.trace(...).lower(lowering_platforms=("tpu",))``)
runs the full Pallas -> Mosaic lowering pipeline without a TPU device, so
unsupported primitives (atan2, bool selects, bad tile shapes...) fail HERE
in CI instead of minutes into a remote compile on the chip.  (Verified
against a negative control: an atan2 kernel raises NotImplementedError on
this path.)  This does not cover backend register/VMEM compilation, but it
pins the lowering contract for every kernel variant we ship.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legmov_tpu.models.leg import get_m2_leg
from legmov_tpu.models.robot import HEX_MOUNTS, get_moonbot_robot, make_robot


def _lowers(fn, *args) -> None:
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def test_reachability_kernel_lowers():
    from legmov_tpu.ops.pallas_kernels import make_reachability_kernel

    kr = make_reachability_kernel(get_m2_leg())
    _lowers(lambda p: kr(p), jnp.zeros((32768, 3), jnp.float32))


def test_kernels_lower_with_parallel_semantics():
    from legmov_tpu.ops.pallas_kernels import (
        make_distance_kernel,
        make_reachability_kernel,
    )

    kr = make_reachability_kernel(get_m2_leg(), parallel=True)
    _lowers(lambda p: kr(p), jnp.zeros((32768, 3), jnp.float32))
    kd = make_distance_kernel(get_m2_leg(), parallel=True)
    _lowers(lambda p: kd(p), jnp.zeros((16384, 3), jnp.float32))


@pytest.mark.parametrize(
    "ablate",
    [frozenset(), frozenset(["opt_rsqrt", "opt_corner_linear"])],
    ids=["plain", "opts"],
)
def test_distance_kernel_lowers(ablate):
    from legmov_tpu.ops.pallas_kernels import make_distance_kernel

    kd = make_distance_kernel(get_m2_leg(), ablate=ablate)
    _lowers(lambda p: kd(p), jnp.zeros((16384, 3), jnp.float32))


def test_multileg_reach_kernel_lowers():
    from legmov_tpu.ops.pallas_multileg import (
        make_multileg_kernel,
        oriented_tables,
        table_width,
    )

    robot = make_robot(HEX_MOUNTS)
    fn = make_multileg_kernel(robot, 512)
    tab = jnp.zeros((64, table_width(6)), jnp.float32)
    c = jnp.zeros((64, 512), jnp.float32)
    _lowers(lambda t, x, y, z: fn(t, x, y, z), tab, c, c, c)


def test_multileg_distance_kernel_lowers():
    from legmov_tpu.ops.pallas_multileg_dist import (
        make_multileg_distance_kernel,
        table_width,
    )

    robot = get_moonbot_robot()
    fn = make_multileg_distance_kernel(robot, 512, k=3)
    tab = jnp.zeros((64, table_width(4)), jnp.float32)
    c = jnp.zeros((64, 512), jnp.float32)
    cs = jnp.zeros((1, 512), jnp.float32)  # shared-candidate variant too
    _lowers(lambda t, x, y, z: fn(t, x, y, z), tab, c, c, c)
    _lowers(lambda t, x, y, z: fn(t, x, y, z), tab, cs, cs, cs)


def test_csr_dma_solver_lowers():
    """The DMA-streaming CSR solver (scalar-prefetch starts + in-kernel
    HBM->VMEM async copies) must lower to Mosaic: DMA descriptors with
    dynamic 1-D starts into sublane rows are the risky construct here."""
    from legmov_tpu.ops.csr_grid import make_csr_dma_solver

    robot = make_robot(HEX_MOUNTS)
    solver = make_csr_dma_solver(
        robot, window=256, rounds=((2, 1.0),), super_step=4
    )
    P, C, F = 16, 5, 4096
    body = jnp.zeros((P, 3), jnp.float32)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (P, 1))
    xs = jnp.zeros(F, jnp.float32)
    starts = jnp.zeros(28, jnp.int32)
    cols = jnp.zeros((C, 4), jnp.int32)
    _lowers(
        lambda b, q, x, y, z, s, o, c: solver(
            b, q, x, y, z, s, o, c, cell_size=100.0, k=4, dims=(3, 3, 3)
        ),
        body, quats, xs, xs, xs, starts, jnp.zeros(3, jnp.float32), cols,
    )


def test_csr_cell_eval_lowers():
    """The CSR-streaming cell evaluator must pass Mosaic TPU lowering
    (SMEM quat tables, per-row DMA, SMEM scratch state) on both mode
    variants."""
    from legmov_tpu.ops.csr_cell_eval import (
        _ALIGN,
        ball_mask_params,
        level_tables,
        make_csr_cell_eval,
        pad_csr_soa,
    )
    from legmov_tpu.ops.csr_grid import build_csr_grid
    from legmov_tpu.ops import quaternion as quat

    robot = get_moonbot_robot()
    rng = np.random.default_rng(0)
    fh = rng.uniform(-1500, 1500, (2000, 3)).astype(np.float32)
    csr = build_csr_grid(fh, 500.0)
    window = 256
    w_fetch = (-(-window // _ALIGN) + 1) * _ALIGN
    xs2, ys2, zs2, dead = pad_csr_soa(csr.xs, csr.ys, csr.zs, w_fetch)
    S, C, Q = 5, 16, 64
    rpy = rng.uniform(-0.2, 0.2, (S, 3)).astype(np.float32)
    quats = np.asarray(quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2]))
    half = jnp.asarray([40.0, 40.0, 40.0])
    phalf = jnp.asarray([80.0, 80.0, 80.0])
    legtab = level_tables(jnp.asarray(quats), half, phalf, robot, 16.0, 711.0)
    centers = jnp.asarray(
        rng.uniform(-1200, 1200, (C, 3)).astype(np.float32)
    )
    pv = jnp.zeros(C, bool)
    elong = jnp.asarray(phalf + 711.0)
    rmounts, reach_l, r_cell = ball_mask_params(
        jnp.asarray(quats), robot, np.asarray(half), 16.0
    )
    for shared in (True, False):
        ev = make_csr_cell_eval(
            robot, k=3, n_quats=S, cells=C, q_steps=Q, shared=shared,
            window=window,
        )
        jax.jit(
            lambda c, p, lt: ev(
                c, p, lt, elong, rmounts, reach_l, r_cell,
                xs2, ys2, zs2, csr.starts, csr.origin,
                cell_size=csr.cell_size, dims=csr.dims, dead_elem=dead,
            )
        ).trace(centers, pv, legtab).lower(lowering_platforms=("tpu",))
