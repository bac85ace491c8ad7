"""Independent iterative-IK reachability oracle (RBDL-LM equivalent).

The reference benchmarks its closed-form geometry against RBDL's
Levenberg-Marquardt inverse kinematics (rbdl_benchmark.cpp:18-111: 4-body
YPP chain, <=5 random restarts, <=10 LM steps per point).  This is the
dependency-free equivalent: damped least-squares IK on the analytic YPP
forward kinematics with joint-box projection, vectorized over the whole
point batch in NumPy.  Like the reference's RBDL path it is an
*independent algorithm* sharing no code with the circle decomposition —
used for cross-validation and benchmark-honesty comparisons, not as a
bit-exact oracle (iterative IK has its own convergence tolerance; unlike
the reference's RBDL chain we do project onto the joint limits, and the
absolute-tibia orientation limit is enforced as a final feasibility
check).
"""

from __future__ import annotations

import numpy as np

f32 = np.float32


def _fk_and_jac(q, leg):
    """FK tip positions + Jacobians for joint batches ``q [N, 3]``."""
    coxa, femur, tibia = q[:, 0], q[:, 1], q[:, 2]
    ch, sh = np.cos(coxa), np.sin(coxa)
    cf, sf = np.cos(femur), np.sin(femur)
    ct, st = np.cos(tibia + femur), np.sin(tibia + femur)
    L1 = float(leg.coxa_length)
    L2 = float(leg.femur_length)
    L3 = float(leg.tibia_length)
    horiz = L1 + cf * L2 + ct * L3
    x = float(leg.body) + ch * horiz
    y = sh * horiz
    z = sf * L2 + st * L3
    pos = np.stack([x, y, z], axis=-1)

    dh_df = -sf * L2 - st * L3
    dh_dt = -st * L3
    jac = np.empty((q.shape[0], 3, 3))
    jac[:, 0, 0] = -sh * horiz
    jac[:, 1, 0] = ch * horiz
    jac[:, 2, 0] = 0.0
    jac[:, 0, 1] = ch * dh_df
    jac[:, 1, 1] = sh * dh_df
    jac[:, 2, 1] = cf * L2 + ct * L3
    jac[:, 0, 2] = ch * dh_dt
    jac[:, 1, 2] = sh * dh_dt
    jac[:, 2, 2] = ct * L3
    return pos, jac


def ik_reachability(
    points: np.ndarray,
    leg,
    restarts: int = 5,
    iters: int = 10,
    tol: float = 1.0,
    damping: float = 1e-2,
    seed: int = 0,
) -> np.ndarray:
    """``[N] bool``: LM-IK converges to each target within ``tol`` mm.

    Joint iterates are projected onto the joint box each step; a converged
    solution must also satisfy the absolute-tibia orientation limit.
    """
    pts = np.asarray(points, np.float64)
    n = pts.shape[0]
    rng = np.random.default_rng(seed)
    lo = np.array(
        [float(leg.min_angle_coxa), float(leg.min_angle_femur),
         float(leg.min_angle_tibia)]
    )
    hi = np.array(
        [float(leg.max_angle_coxa), float(leg.max_angle_femur),
         float(leg.max_angle_tibia)]
    )
    reached = np.zeros(n, bool)
    eye = np.eye(3)
    for _ in range(restarts):
        active = ~reached
        if not active.any():
            break
        idx = np.nonzero(active)[0]
        q = rng.uniform(lo, hi, (idx.size, 3))
        target = pts[idx]
        for _ in range(iters):
            pos, jac = _fk_and_jac(q, leg)
            err = target - pos
            jtj = jac.transpose(0, 2, 1) @ jac + damping * eye
            rhs = np.einsum("nij,nj->ni", jac.transpose(0, 2, 1), err)
            try:
                step = np.linalg.solve(jtj, rhs[..., None])[..., 0]
            except np.linalg.LinAlgError:
                break
            q = np.clip(q + step, lo, hi)
        pos, _ = _fk_and_jac(q, leg)
        err = np.linalg.norm(target - pos, axis=-1)
        abs_ang = q[:, 1] + q[:, 2]
        ok = (
            (err < tol)
            & (abs_ang > float(leg.tibia_absolute_neg) - 1e-6)
            & (abs_ang < float(leg.tibia_absolute_pos) + 1e-6)
        )
        reached[idx[ok]] = True
    return reached
