"""Independent-algorithm oracle: brute-force FK rasterization.

The reference validates its closed-form geometry against RBDL's
Levenberg-Marquardt IK (rbdl_benchmark.cpp:18-111) — an algorithm that
shares no code with the circle decomposition.  The RBDL-free equivalent
(SURVEY.md section 4): rasterize the true reachable set by sweeping a fine
joint grid through forward kinematics, then check the production
reachability against that ground truth away from the boundary.
"""

import numpy as np
import jax.numpy as jnp

from legmov_tpu import forward_kinematics, get_moonbot_leg, reachability_batch

f32 = np.float32


def fk_cloud(leg, n=40):
    """Tip positions of an n^3 joint-box sweep (the true reachable set)."""
    eps = 1e-4
    coxa = np.linspace(
        float(leg.min_angle_coxa) + eps, float(leg.max_angle_coxa) - eps, n
    )
    femur = np.linspace(
        float(leg.min_angle_femur) + eps, float(leg.max_angle_femur) - eps, n
    )
    tibia = np.linspace(
        float(leg.min_angle_tibia) + eps, float(leg.max_angle_tibia) - eps, n
    )
    C, F, T = np.meshgrid(coxa, femur, tibia, indexing="ij")
    # the absolute-tibia-orientation limit constrains femur + tibia
    abs_ang = F + T
    keep = (abs_ang > float(leg.tibia_absolute_neg) + eps) & (
        abs_ang < float(leg.tibia_absolute_pos) - eps
    )
    angles = np.stack([C[keep], F[keep], T[keep]], axis=-1).astype(f32)
    return np.asarray(forward_kinematics(jnp.asarray(angles), leg))


def test_fk_rasterization_positive():
    """Every FK-generated tip position must be reachable."""
    leg = get_moonbot_leg()
    tips = fk_cloud(leg, n=32)
    assert tips.shape[0] > 1000
    reach = np.asarray(reachability_batch(jnp.asarray(tips), leg))
    frac = reach.mean()
    assert frac == 1.0, f"only {frac:.4%} of FK tips reachable"


def test_fk_rasterization_negative():
    """Points well clear of the FK cloud must be unreachable.

    Build a coarse occupancy grid of the FK cloud; cells with no FK point
    within 2 cells in every direction are outside the reachable set — all
    query points there must report unreachable.
    """
    leg = get_moonbot_leg()
    tips = fk_cloud(leg, n=32)
    cell = 30.0
    lo = tips.min(axis=0) - 5 * cell
    hi = tips.max(axis=0) + 5 * cell
    dims = np.ceil((hi - lo) / cell).astype(int)
    occ = np.zeros(dims, bool)
    idx = np.floor((tips - lo) / cell).astype(int)
    occ[idx[:, 0], idx[:, 1], idx[:, 2]] = True
    # dilate occupancy by 2 cells (conservative safety band)
    from scipy.ndimage import binary_dilation  # available via scipy

    dil = binary_dilation(occ, iterations=2)
    free = np.argwhere(~dil)
    rng = np.random.default_rng(0)
    sel = free[rng.choice(free.shape[0], size=4000, replace=False)]
    queries = (lo + (sel + 0.5) * cell).astype(f32)
    reach = np.asarray(reachability_batch(jnp.asarray(queries), leg))
    assert not reach.any(), f"{reach.sum()} far-outside points reachable"


def test_lm_ik_oracle_agrees():
    """The iterative-IK oracle (RBDL-LM equivalent, shares no code with the
    circle decomposition) must agree with the closed-form reachability on
    >= 99.5% of random points, with any disagreements attributable to IK
    convergence near the workspace boundary."""
    from legmov_tpu.oracle.ik_oracle import ik_reachability

    leg = get_moonbot_leg()
    rng = np.random.default_rng(1)
    pts = rng.uniform(-550, 550, (600, 3)).astype(f32)
    want = np.asarray(reachability_batch(jnp.asarray(pts), leg))
    got = ik_reachability(pts, leg, restarts=8, iters=15, tol=1.0)
    agree = (got == want).mean()
    assert agree >= 0.995, f"IK oracle agreement only {agree:.4f}"
