"""Bearing EPnP + RANSAC, fully batched.

Re-design of the reference PnPsolver (src/PnPsolver.cpp, 1232 LoC): Lepetit
EPnP adapted to bearing rays — the M-matrix rows are cross products of the
bearing with the barycentric control-point combination instead of normalized
image coordinates (fill_M_with_bearing, cpp:447-462); 4 control points via
PCA (cpp:385-419); camera-frame control points from the 4-vector null space
of MᵀM with betas recovered by the three EPnP approximations
(find_betas_approx_{1,2,3}, cpp:678-788) each refined by 5 Gauss-Newton
iterations on the inter-control-point distance residuals (gauss_newton +
compute_A_and_b_gauss_newton, cpp:790-869); R,t by Horn alignment per
candidate (estimate_R_and_t, cpp:580-638), best candidate by reprojection.
Inliers are cubemap reprojections within chi2*sigma2 (CheckInliers
cpp:312-343), with a final refit on the best inlier set (Refine cpp:263-309).

TPU design: every RANSAC hypothesis (minimal 4-point set, PnPsolver.h ctor
default mRansacMinSet=4 used by Tracking.cpp:1035) is solved in one vmapped
batch of 12x12 eigendecompositions; the three beta candidates are evaluated
in-line and the sequential 5-iteration round-robin of
Tracking::Relocalization becomes a single all-iterations call.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cubemapslam_tpu import camera as C
from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu.geometry import hat
from cubemapslam_tpu.solvers.horn import horn_alignment
from cubemapslam_tpu.solvers.sampling import sample_minimal_sets

MIN_SET = 4

# symmetric products beta_a*beta_b indexed like the reference's L_6x10
# columns: [b11 b12 b22 b13 b23 b33 b14 b24 b34 b44]
_SYM_PAIRS = ((0, 0), (0, 1), (1, 1), (0, 2), (1, 2), (2, 2),
              (0, 3), (1, 3), (2, 3), (3, 3))


def _control_points(pw: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """4 control points: centroid + PCA axes (choose_control_points,
    PnPsolver.cpp:385-419). pw (N,3), w (N,) weights -> (4,3)."""
    wn = jnp.maximum(jnp.sum(w), 1e-12)
    c0 = jnp.sum(pw * w[:, None], axis=0) / wn
    q = (pw - c0) * w[:, None]
    cov = q.T @ q / wn
    evals, evecs = jnp.linalg.eigh(cov)       # ascending
    # scale axes by sqrt(eigenvalue) (cpp:406-416)
    axes = evecs.T * jnp.sqrt(jnp.maximum(evals, 1e-12))[:, None]
    return jnp.concatenate([c0[None], c0[None] + axes[::-1]], axis=0)


def _barycentric(pw: jnp.ndarray, cw: jnp.ndarray) -> jnp.ndarray:
    """alphas such that p = sum_j alpha_j c_j (compute_barycentric,
    cpp:421-445). pw (N,3), cw (4,3) -> (N,4)."""
    B = (cw[1:] - cw[0]).T                    # (3,3)
    Binv = jnp.linalg.inv(B + 1e-12 * jnp.eye(3))
    a123 = (pw - cw[0]) @ Binv.T              # (N,3)
    a0 = 1.0 - jnp.sum(a123, axis=1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=1)


def _lstsq(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Small damped least squares via normal equations."""
    AtA = A.T @ A + 1e-9 * jnp.eye(A.shape[1])
    return jnp.linalg.solve(AtA, A.T @ b)


def _betas_candidates(L: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    """The three EPnP beta initializations from the (6,10) product matrix
    (find_betas_approx_{1,2,3}, PnPsolver.cpp:678-788). Returns (3,4)."""
    # approx 1: unknowns [b11 b12 b13 b14]
    x = _lstsq(L[:, jnp.asarray([0, 1, 3, 6])], rho)
    b0 = jnp.sqrt(jnp.abs(x[0]))
    sgn = jnp.where(x[0] < 0, -1.0, 1.0)
    safe = jnp.where(b0 > 0, b0, 1.0)
    beta1 = jnp.stack([b0, sgn * x[1] / safe, sgn * x[2] / safe,
                       sgn * x[3] / safe])

    # approx 2: unknowns [b11 b12 b22]
    y = _lstsq(L[:, jnp.asarray([0, 1, 2])], rho)
    b0 = jnp.sqrt(jnp.abs(y[0]))
    b1 = jnp.where(y[0] * y[2] > 0, jnp.sqrt(jnp.abs(y[2])), 0.0)
    b0 = jnp.where(y[1] < 0, -b0, b0)   # keep b0*b1 sign consistent w/ b12
    beta2 = jnp.stack([b0, b1, jnp.zeros(()), jnp.zeros(())])

    # approx 3: unknowns [b11 b12 b22 b13 b23]
    z = _lstsq(L[:, jnp.asarray([0, 1, 2, 3, 4])], rho)
    b0 = jnp.sqrt(jnp.abs(z[0]))
    b1 = jnp.where(z[0] * z[2] > 0, jnp.sqrt(jnp.abs(z[2])), 0.0)
    b0s = jnp.where(z[1] < 0, -b0, b0)
    safe = jnp.where(b0 > 0, b0, 1.0)
    b2 = z[3] / jnp.where(b0s != 0, b0s, 1.0)
    beta3 = jnp.stack([b0s, b1, b2, jnp.zeros(())])
    return jnp.stack([beta1, beta2, beta3])


def _gauss_newton(dv: jnp.ndarray, rho: jnp.ndarray, beta: jnp.ndarray,
                  n_iters: int = 5) -> jnp.ndarray:
    """Refine betas on the distance-preservation residuals
    r_p = ||sum_a beta_a dv[a,p]||^2 - rho_p (gauss_newton, cpp:829-869)."""
    def step(b, _):
        q = jnp.einsum("a,apk->pk", b, dv)          # (6,3)
        r = jnp.sum(q * q, axis=-1) - rho           # (6,)
        J = 2.0 * jnp.einsum("pk,apk->pa", q, dv)   # (6,4)
        JtJ = J.T @ J + 1e-9 * jnp.eye(4)
        db = jnp.linalg.solve(JtJ, -J.T @ r)
        return b + db, None
    beta, _ = jax.lax.scan(step, beta, None, length=n_iters)
    return beta


def _solve_epnp_candidates(pw: jnp.ndarray, bearings: jnp.ndarray,
                           w: jnp.ndarray):
    """One EPnP solve over weighted correspondences, returning the THREE
    refined beta candidates' poses.

    pw (N,3) world points, bearings (N,3) unit rays in camera frame,
    w (N,) {0,1} selection weights. Returns (R (3,3,3), t (3,3))
    world->camera, one per beta candidate.
    """
    cw = _control_points(pw, w)
    alphas = _barycentric(pw, cw)             # (N,4)
    # M rows: [b]x sum_j alpha_j cc_j = 0  ->  (3N, 12)
    bx = hat(bearings)                        # (N,3,3)
    M = (alphas[:, None, :, None] * bx[:, :, None, :])  # (N,3,4,3)
    M = M.reshape(-1, 12) * jnp.repeat(w, 3)[:, None]
    MtM = M.T @ M
    _, evecs = jnp.linalg.eigh(MtM)
    V = evecs[:, :4]                          # 4-dim null-space basis
    v = V.T.reshape(4, 4, 3)                  # v[a] = control points of basis a
    iu, ju = jnp.triu_indices(4, 1)           # 6 control-point pairs
    dv = v[:, iu] - v[:, ju]                  # (4,6,3)
    rho = jnp.sum((cw[iu] - cw[ju]) ** 2, axis=-1)  # (6,)
    # L (6,10) over symmetric beta products
    cols = []
    for a, b in _SYM_PAIRS:
        f = 1.0 if a == b else 2.0
        cols.append(f * jnp.sum(dv[a] * dv[b], axis=-1))
    L = jnp.stack(cols, axis=1)

    betas0 = _betas_candidates(L, rho)        # (3,4)
    betas = jax.vmap(lambda b: _gauss_newton(dv, rho, b))(betas0)

    def pose_of(beta):
        cc = (V @ beta).reshape(4, 3)
        pc = alphas @ cc                      # (N,3) camera-frame points
        # sign: bearings should point toward the points (majority vote)
        sgn = jnp.sign(jnp.sum(jnp.sum(pc * bearings, axis=1) * w))
        sgn = jnp.where(sgn == 0, 1.0, sgn)
        pc = pc * sgn
        _, R, t = horn_alignment(pc, pw, weights=w, fix_scale=True)
        return R, t

    return jax.vmap(pose_of)(betas)


class PnPResult(NamedTuple):
    success: jnp.ndarray    # () bool
    R: jnp.ndarray          # (3,3) world->camera
    t: jnp.ndarray          # (3,)
    inliers: jnp.ndarray    # (N,) bool
    n_inliers: jnp.ndarray  # () int32


def _count_inliers(cam: CubemapCamera, R, t, pw, uv, max_err2, valid):
    pc = pw @ R.T + t
    uvp, face = C.ray_to_cubemap(cam, pc)
    err2 = jnp.sum((uvp - uv) ** 2, axis=-1)
    inl = valid & (face != C.UNKNOWN_FACE) & (err2 < max_err2)
    return inl, jnp.sum(inl.astype(jnp.int32))


def _best_candidate(cam, Rs, ts, pw, uv, max_err2, valid):
    """Evaluate the 3 beta-candidate poses; keep the max-inlier one
    (the reference picks by reprojection error, cpp:540-578)."""
    inls, ns = jax.vmap(
        lambda R, t: _count_inliers(cam, R, t, pw, uv, max_err2, valid))(
        Rs, ts)
    b = jnp.argmax(ns)
    return Rs[b], ts[b], inls[b], ns[b]


def pnp_ransac(cam: CubemapCamera, key: jax.Array,
               pw: jnp.ndarray, bearings: jnp.ndarray, uv: jnp.ndarray,
               level_sigma2: jnp.ndarray, valid: jnp.ndarray,
               n_iters: int = 300, chi2_th: float = 5.991,
               min_inliers: int = 10) -> PnPResult:
    """Batched RANSAC bearing-EPnP (PnPsolver::iterate, cpp:167-261 with the
    parameters Tracking.cpp:1035 passes: 300 iters, chi2 5.991, >=10
    inliers). pw world points, bearings unit rays (camera frame of the
    *matched keypoints*), uv their cubemap pixels, level_sigma2 per-point
    scale variance."""
    max_err2 = chi2_th * level_sigma2
    sets = sample_minimal_sets(key, valid, n_iters, MIN_SET)

    def one(idx):
        w = jnp.zeros(pw.shape[0]).at[idx].set(1.0) * valid
        Rs, ts = _solve_epnp_candidates(pw, bearings, w)
        return _best_candidate(cam, Rs, ts, pw, uv, max_err2, valid)

    Rs, ts, inls, ns = jax.vmap(one)(sets)
    best = jnp.argmax(ns)
    # refine on the best inlier set (Refine, cpp:263-309)
    w_ref = inls[best].astype(jnp.float32)
    Rc, tc = _solve_epnp_candidates(pw, bearings, w_ref)
    R_ref, t_ref, inl_ref, n_ref = _best_candidate(
        cam, Rc, tc, pw, uv, max_err2, valid)
    use_ref = n_ref >= ns[best]
    R = jnp.where(use_ref, R_ref, Rs[best])
    t = jnp.where(use_ref, t_ref, ts[best])
    inl = jnp.where(use_ref, inl_ref, inls[best])
    n = jnp.where(use_ref, n_ref, ns[best])
    return PnPResult(success=n >= min_inliers, R=R, t=t, inliers=inl,
                     n_inliers=n)
