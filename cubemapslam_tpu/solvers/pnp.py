"""Bearing EPnP + RANSAC, fully batched.

Re-design of the reference PnPsolver (src/PnPsolver.cpp, 1232 LoC): Lepetit
EPnP adapted to bearing rays — the M-matrix rows are cross products of the
bearing with the barycentric control-point combination instead of normalized
image coordinates (fill_M_with_bearing, cpp:447-462); 4 control points via
PCA (cpp:385-419); camera-frame control points from the null space of MᵀM
with the beta-1 scale recovered by inter-control-point distance preservation;
R,t by Horn alignment (estimate_R_and_t, cpp:580-638). Inliers are cubemap
reprojections within chi2*sigma2 (CheckInliers cpp:312-343), with a final
refit on the best inlier set (Refine cpp:263-309).

TPU design: every RANSAC hypothesis (minimal 6-point set) is solved in one
vmapped batch of 12x12 eigendecompositions; the sequential 5-iteration
round-robin of Tracking::Relocalization becomes a single all-iterations call.
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

MIN_SET = 6


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


def _solve_epnp(pw: jnp.ndarray, bearings: jnp.ndarray, w: jnp.ndarray):
    """One EPnP solve over weighted correspondences.

    pw (N,3) world points, bearings (N,3) unit rays in camera frame,
    w (N,) {0,1} selection weights. Returns (R, t) world->camera.
    """
    cw = _control_points(pw, w)
    alphas = _barycentric(pw, cw)             # (N,4)
    # M rows: [b]x sum_j alpha_j cc_j = 0  ->  (3N, 12)
    bx = hat(bearings)                        # (N,3,3)
    M = (alphas[:, None, :, None] * bx[:, :, None, :])  # (N,3,4,3)
    M = M.reshape(-1, 12) * jnp.repeat(w, 3)[:, None]
    MtM = M.T @ M
    _, evecs = jnp.linalg.eigh(MtM)
    v = evecs[:, 0].reshape(4, 3)             # null-space control points
    # beta from distance preservation between control points (cpp:678-727)
    iu, ju = jnp.triu_indices(4, 1)
    dc = v[iu] - v[ju]
    dw_ = cw[iu] - cw[ju]
    num = jnp.sum(jnp.linalg.norm(dc, axis=1)
                  * jnp.linalg.norm(dw_, axis=1))
    den = jnp.maximum(jnp.sum(jnp.sum(dc * dc, axis=1)), 1e-12)
    beta = num / den
    cc = beta * v
    pc = alphas @ cc                          # (N,3) camera-frame points
    # sign: bearings should point toward the points (majority vote)
    sgn = jnp.sign(jnp.sum(jnp.sum(pc * bearings, axis=1) * w))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    pc = pc * sgn
    _, R, t = horn_alignment(pc, pw, weights=w, fix_scale=True)
    return R, t


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
        R, t = _solve_epnp(pw, bearings, w)
        inl, n = _count_inliers(cam, R, t, pw, uv, max_err2, valid)
        return R, t, inl, n

    Rs, ts, inls, ns = jax.vmap(one)(sets)
    best = jnp.argmax(ns)
    # refine on the best inlier set (Refine, cpp:263-309)
    w_ref = inls[best].astype(jnp.float32)
    R_ref, t_ref = _solve_epnp(pw, bearings, w_ref)
    inl_ref, n_ref = _count_inliers(cam, R_ref, t_ref, pw, uv, max_err2,
                                    valid)
    use_ref = n_ref >= ns[best]
    R = jnp.where(use_ref, R_ref, Rs[best])
    t = jnp.where(use_ref, t_ref, ts[best])
    inl = jnp.where(use_ref, inl_ref, inls[best])
    n = jnp.where(use_ref, n_ref, ns[best])
    return PnPResult(success=n >= min_inliers, R=R, t=t, inliers=inl,
                     n_inliers=n)
