"""Bundle adjustment with Schur-complement reduction, fully on device.

Replaces g2o's BlockSolver_6_3 + LinearSolverEigen path used by
Optimizer::LocalBundleAdjustment / BundleAdjustment (Optimizer.cpp:192-451,
453-621): point vertices marginalized via the Schur complement
(setMarginalized(true), Optimizer.cpp:309), Levenberg-Marquardt outer loop,
Huber kernel in the first phase, chi2 outlier cut between phases
(cpp:365-398).

TPU design (SURVEY.md §7 step 7): the observation graph is a fixed-size COO
edge list. Each LM iteration:
  * residual/Jacobian for all edges at once (vmapped analytic Jacobians),
  * Hcc/Hpp/b assembled by segment-sum scatter-adds,
  * point blocks (3x3) inverted in batch,
  * the reduced camera system S = Hcc - W Hpp^-1 Wᵀ is solved MATRIX-FREE by
    preconditioned CG: each matvec is two gathers + two segment-sums + one
    batched 3x3 apply (O(E) memory, no 6Mx6M materialization) — the same
    operator the distributed BA shards over a keyframe mesh axis.
Gauge/boundary keyframes are handled by projecting their tangent updates to
zero inside the CG operator (the fixed KFs of LocalBA, Optimizer.cpp:260-282).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu.geometry import mat3_apply, se3_exp, se3_compose
from cubemapslam_tpu.optim.residuals import reproj_residual, reproj_jacobians
from cubemapslam_tpu.optim.pose_opt import _huber_weight, CHI2_TH, HUBER_DELTA


class BAProblem(NamedTuple):
    """Fixed-shape BA state: camera table, point table, COO observations."""

    R: jnp.ndarray            # (M,3,3) world->camera rotations
    t: jnp.ndarray            # (M,3)
    cam_fixed: jnp.ndarray    # (M,) bool — gauge + boundary KFs
    cam_valid: jnp.ndarray    # (M,) bool
    X: jnp.ndarray            # (P,3) world points
    pt_valid: jnp.ndarray     # (P,) bool
    obs_cam: jnp.ndarray      # (E,) int32
    obs_pt: jnp.ndarray       # (E,) int32
    obs_face: jnp.ndarray     # (E,) int32
    obs_uv: jnp.ndarray       # (E,2) in-face pixels
    obs_inv_sigma2: jnp.ndarray  # (E,)
    obs_valid: jnp.ndarray    # (E,) bool


def _psum(x, axis_name):
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def _edge_terms(cam, prob: BAProblem, w: jnp.ndarray):
    """Residuals + weighted normal-equation blocks for all edges."""
    Rc = prob.R[prob.obs_cam]
    tc = prob.t[prob.obs_cam]
    Xp = prob.X[prob.obs_pt]
    e = reproj_residual(cam, Rc, tc, Xp, prob.obs_face, prob.obs_uv)
    Jc, Jp = reproj_jacobians(cam, Rc, tc, Xp, prob.obs_face)
    JcT = Jc.transpose(0, 2, 1) * w[:, None, None]      # (E,6,2)
    JpT = Jp.transpose(0, 2, 1) * w[:, None, None]      # (E,3,2)
    Hcc_e = JcT @ Jc                                     # (E,6,6)
    Hpp_e = JpT @ Jp                                     # (E,3,3)
    W_e = JcT @ Jp                                       # (E,6,3)
    bc_e = -(JcT @ e[..., None])[..., 0]                 # (E,6) = -JᵀWe
    bp_e = -(JpT @ e[..., None])[..., 0]                 # (E,3)
    return e, Hcc_e, Hpp_e, W_e, bc_e, bp_e


def _chi2(cam, prob: BAProblem):
    Rc = prob.R[prob.obs_cam]
    tc = prob.t[prob.obs_cam]
    Xp = prob.X[prob.obs_pt]
    e = reproj_residual(cam, Rc, tc, Xp, prob.obs_face, prob.obs_uv)
    return jnp.sum(e * e, axis=-1) * prob.obs_inv_sigma2


def _robust_cost(chi2, active, robust):
    rho = jnp.where(robust & (chi2 > CHI2_TH),
                    2.0 * HUBER_DELTA * jnp.sqrt(jnp.maximum(chi2, 1e-20))
                    - CHI2_TH, chi2)
    return jnp.sum(jnp.where(active, rho, 0.0))


def _lm_step(cam, prob: BAProblem, active, robust, lm_lambda,
             cg_iters: int, axis_name=None):
    """One damped GN step via Schur + matrix-free CG. Returns candidate
    (R, t, X).

    With ``axis_name`` set, the observation arrays are the local shard of an
    SPMD program (keyframe-block partitioned edges): every segment-sum into
    the camera/point tables is followed by a psum, so the reduced system —
    and hence the pose/point updates — is bitwise identical on all devices
    while each device only touches its own edges. This is the collective
    layout of the distributed global BA (SURVEY.md §7 step 10)."""
    M = prob.R.shape[0]
    P = prob.X.shape[0]
    chi2 = _chi2(cam, prob)
    w = prob.obs_inv_sigma2 * jnp.where(robust, _huber_weight(chi2), 1.0)
    w = jnp.where(active, w, 0.0)
    _, Hcc_e, Hpp_e, W_e, bc_e, bp_e = _edge_terms(cam, prob, w)

    Hcc = _psum(jnp.zeros((M, 6, 6)).at[prob.obs_cam].add(Hcc_e),
                axis_name)
    Hpp = _psum(jnp.zeros((P, 3, 3)).at[prob.obs_pt].add(Hpp_e), axis_name)
    bc = _psum(jnp.zeros((M, 6)).at[prob.obs_cam].add(bc_e), axis_name)
    bp = _psum(jnp.zeros((P, 3)).at[prob.obs_pt].add(bp_e), axis_name)

    # damping (LM): scale diagonals; regularize empty blocks
    eyeP = jnp.eye(3)
    Hpp_d = Hpp + (lm_lambda * jnp.eye(3))[None] * jnp.maximum(
        jnp.trace(Hpp, axis1=1, axis2=2)[:, None, None] / 3.0, 1e-6)
    Hpp_d = Hpp_d + 1e-8 * eyeP[None]
    Hpp_inv = jnp.linalg.inv(Hpp_d)
    Hpp_inv = jnp.where(prob.pt_valid[:, None, None], Hpp_inv, 0.0)

    Hcc_d = Hcc + (lm_lambda * jnp.eye(6))[None] * jnp.maximum(
        jnp.trace(Hcc, axis1=1, axis2=2)[:, None, None] / 6.0, 1e-6)
    Hcc_d = Hcc_d + 1e-8 * jnp.eye(6)[None]

    free = prob.cam_valid & ~prob.cam_fixed            # (M,)

    def schur_matvec(x):
        """x: (M,6) -> S x, with fixed cameras projected out."""
        x = jnp.where(free[:, None], x, 0.0)
        hx = (Hcc_d @ x[..., None])[..., 0]            # (M,6)
        v = (W_e.transpose(0, 2, 1)
             @ x[prob.obs_cam][..., None])[..., 0]     # (E,3)
        s = _psum(jnp.zeros((P, 3)).at[prob.obs_pt].add(v), axis_name)
        y = (Hpp_inv @ s[..., None])[..., 0]           # (P,3)
        z = (W_e @ y[prob.obs_pt][..., None])[..., 0]  # (E,6)
        coup = _psum(jnp.zeros((M, 6)).at[prob.obs_cam].add(z), axis_name)
        out = hx - coup
        return jnp.where(free[:, None], out, x)

    # reduced rhs: bc - W Hpp^-1 bp
    yb = (Hpp_inv @ bp[..., None])[..., 0]
    zb = (W_e @ yb[prob.obs_pt][..., None])[..., 0]
    rhs = bc - _psum(jnp.zeros((M, 6)).at[prob.obs_cam].add(zb), axis_name)
    rhs = jnp.where(free[:, None], rhs, 0.0)

    # block-Jacobi preconditioner
    Pinv = jnp.linalg.inv(Hcc_d)

    def precond(r):
        return jnp.where(free[:, None], (Pinv @ r[..., None])[..., 0], r)

    def cg_body(_, carry):
        x, r, z, p = carry
        Ap = schur_matvec(p)
        rz = jnp.sum(r * z)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-20)
        x = x + alpha * p
        r_new = r - alpha * Ap
        z_new = precond(r_new)
        beta = jnp.sum(r_new * z_new) / jnp.maximum(rz, 1e-20)
        p = z_new + beta * p
        return (x, r_new, z_new, p)

    x0 = jnp.zeros((M, 6))
    r0 = rhs
    z0 = precond(r0)
    dc, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, (x0, r0, z0, z0))

    # back-substitute point updates
    v = (W_e.transpose(0, 2, 1) @ dc[prob.obs_cam][..., None])[..., 0]
    s = _psum(jnp.zeros((P, 3)).at[prob.obs_pt].add(v), axis_name)
    dp = (Hpp_inv @ (bp - s)[..., None])[..., 0]
    dp = jnp.where(prob.pt_valid[:, None], dp, 0.0)

    dR, dt = se3_exp(dc)
    R_new, t_new = se3_compose(dR, dt, prob.R, prob.t)
    R_new = jnp.where(free[:, None, None], R_new, prob.R)
    t_new = jnp.where(free[:, None], t_new, prob.t)
    X_new = prob.X + dp
    return R_new, t_new, X_new


def bundle_adjust(cam: CubemapCamera, prob: BAProblem,
                  phase_iters: Tuple[int, ...] = (5, 10),
                  chi2_cut: float = CHI2_TH,
                  cg_iters: int = 30,
                  axis_name=None
                  ) -> Tuple[BAProblem, jnp.ndarray]:
    """Two-phase LM BA (LocalBundleAdjustment schedule, Optimizer.cpp:341-398:
    5 robust iters, chi2 outlier cut, 10 non-robust iters, final cut).

    Returns (updated problem, per-edge inlier mask).
    """
    active = prob.obs_valid

    def lm_loop(prob, active, robust, n_iters):
        def body(_, carry):
            prob, lm_lambda = carry
            chi2 = _chi2(cam, prob)
            cost = _psum(_robust_cost(chi2, active, robust), axis_name)
            R_n, t_n, X_n = _lm_step(cam, prob, active, robust, lm_lambda,
                                     cg_iters, axis_name)
            cand = prob._replace(R=R_n, t=t_n, X=X_n)
            cost_n = _psum(_robust_cost(_chi2(cam, cand), active, robust),
                           axis_name)
            improved = cost_n < cost
            prob = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    jnp.reshape(improved, (1,) * new.ndim), new, old),
                cand, prob)
            lm_lambda = jnp.where(improved, lm_lambda * 0.5, lm_lambda * 4.0)
            # lambda floor 1e-6 (not ~0): the damping term is what bounds
            # motion along near-null gauge directions in the CG solve
            return prob, jnp.clip(lm_lambda, 1e-6, 1e4)

        prob, _ = jax.lax.fori_loop(0, n_iters, body,
                                    (prob, jnp.float32(1e-4)))
        return prob

    # Scale-gauge anchor. With a single fixed camera, uniform scaling about
    # its center is an EXACT cost null direction of monocular BA (the
    # classic 7th gauge dof); the matrix-free CG accumulates motion along
    # it once LM's lambda shrinks (measured x10 map inflation per call on
    # an orbit sequence — g2o's direct Cholesky stays on the gauge slice
    # numerically, so the reference never needed this). Fix: remember the
    # distance from the anchor to the farthest valid camera at ENTRY, and
    # retract the pure-scale gauge motion after optimization. Scaling is
    # exactly cost-invariant, so this changes nothing but the gauge.
    fixedv = prob.cam_fixed & prob.cam_valid
    n_fixedv = jnp.sum(fixedv.astype(jnp.int32))
    anchor = jnp.where(jnp.any(fixedv), jnp.argmax(fixedv),
                       jnp.argmax(prob.cam_valid)).astype(jnp.int32)

    def centers(p):
        return -mat3_apply(p.R.transpose(0, 2, 1), p.t)

    c0 = centers(prob)
    ref_d = jnp.linalg.norm(c0 - c0[anchor], axis=-1)
    gauge_j = jnp.argmax(jnp.where(prob.cam_valid, ref_d, -1.0))
    d_in = ref_d[gauge_j]

    for phase, n in enumerate(phase_iters):
        robust = phase == 0
        prob = lm_loop(prob, active, robust, n)
        chi2 = _chi2(cam, prob)
        # outlier cut + FOV cheirality (behind-camera points)
        Xc = mat3_apply(prob.R[prob.obs_cam],
                        prob.X[prob.obs_pt]) + prob.t[prob.obs_cam]
        d = jnp.linalg.norm(Xc, axis=-1)
        in_fov = Xc[..., 2] / jnp.maximum(d, 1e-12) > cam.cos_fov_th
        active = active & (chi2 <= chi2_cut) & in_fov

    c1 = centers(prob)
    d_out = jnp.linalg.norm(c1[gauge_j] - c1[anchor])
    # only when scale is actually free (<=1 fixed camera) and well-defined
    s = jnp.where((n_fixedv <= 1) & (d_out > 1e-9) & (d_in > 1e-9),
                  d_in / d_out, 1.0)
    ca = c1[anchor]
    c_new = ca + s * (c1 - ca)
    t_new = -mat3_apply(prob.R, c_new)
    X_new = ca + s * (prob.X - ca)
    free = prob.cam_valid & ~prob.cam_fixed
    prob = prob._replace(
        t=jnp.where(free[:, None], t_new, prob.t),
        X=jnp.where(prob.pt_valid[:, None], X_new, prob.X))
    return prob, active
