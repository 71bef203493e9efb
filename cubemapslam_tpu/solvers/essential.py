"""Ray-based two-view initialization: batched 8-point essential RANSAC.

Mirrors the reference Initializer (src/Initializer.cpp): the H/F duo of
ORB-SLAM2 is replaced by the essential matrix on bearing rays
(ComputeE21 cpp:158-195), scored by a symmetric angular-epipolar chi-square
with per-keypoint anisotropic sigma (CheckEssiential cpp:197-277), decomposed
into 4 (R,t) hypotheses (DecomposeE cpp:496-521) and disambiguated by
triangulation cheirality/reprojection/parallax (CheckRT cpp:398-494,
ReconstructE cpp:279-377).

TPU design: all RANSAC iterations evaluate at once (vmapped batched SVD on
(B,8,9) systems); CheckRT runs the 4 hypotheses as one batch of 4N
triangulations; every data-dependent loop is a masked reduction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cubemapslam_tpu import camera as C
from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu.solvers.sampling import sample_minimal_sets
from cubemapslam_tpu.solvers.triangulate import triangulate_rays

CHI2_TH = 3.841
SCORE_TH = 5.991
PARALLAX_COS_TH = 0.99998


def compute_e21(rays1: jnp.ndarray, rays2: jnp.ndarray) -> jnp.ndarray:
    """8-point essential on rays, batched over hypothesis sets.

    rays1/rays2: (B,8,3). Returns (B,3,3) with rank-2 projection via double
    SVD (ComputeE21, Initializer.cpp:158-195). Constraint: ray2ᵀ E21 ray1 = 0.
    """
    x1 = rays1[..., None, :]                   # (B,8,1,3)
    x2 = rays2[..., :, None]                   # (B,8,3,1)
    A = (x2 * x1).reshape(*rays1.shape[:-2], 8, 9)   # rows: kron(ray2, ray1)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    E = vt[..., 8, :].reshape(*rays1.shape[:-2], 3, 3)
    U, S, Vt = jnp.linalg.svd(E)
    S = S.at[..., 2].set(0.0)
    return U @ (S[..., :, None] * Vt)


def check_essential(cam: CubemapCamera, E21: jnp.ndarray,
                    rays1: jnp.ndarray, rays2: jnp.ndarray,
                    uv1: jnp.ndarray, uv2: jnp.ndarray,
                    valid: jnp.ndarray, sigma: float = 1.0):
    """Symmetric angular epipolar score (CheckEssiential cpp:197-277).

    E21 may be batched (B,3,3); rays/uv are (N,...). Returns
    (inliers (B,N) bool, score (B,)).
    """
    def one(E):
        n2 = rays1 @ E.T                       # (N,3): E21 ray1
        num2 = jnp.sum(n2 * rays2, axis=-1)
        d2 = jnp.sum(n2 * n2, axis=-1)
        sq1 = num2 * num2 / jnp.maximum(d2, 1e-20)
        s2 = sigma * C.vector_sigma_along_normal(cam, uv2, n2)
        chi1 = sq1 / jnp.maximum(s2 * s2, 1e-20)

        n1 = rays2 @ E                         # (N,3): E21ᵀ ray2
        num1 = jnp.sum(n1 * rays1, axis=-1)
        d1 = jnp.sum(n1 * n1, axis=-1)
        sq2 = num1 * num1 / jnp.maximum(d1, 1e-20)
        s1 = sigma * C.vector_sigma_along_normal(cam, uv1, n1)
        chi2_ = sq2 / jnp.maximum(s1 * s1, 1e-20)

        inl = (chi1 <= CHI2_TH) & (chi2_ <= CHI2_TH) & valid
        score = (jnp.where((chi1 <= CHI2_TH) & valid, SCORE_TH - chi1, 0.0)
                 + jnp.where((chi2_ <= CHI2_TH) & valid, SCORE_TH - chi2_,
                             0.0))
        return inl, jnp.sum(score)

    return jax.vmap(one)(E21)


def find_essential(cam: CubemapCamera, key: jax.Array,
                   rays1: jnp.ndarray, rays2: jnp.ndarray,
                   uv1: jnp.ndarray, uv2: jnp.ndarray,
                   valid: jnp.ndarray, n_iters: int = 200,
                   sigma: float = 1.0):
    """RANSAC over all iterations at once (FindEssential cpp:120-156).

    Returns (E21 (3,3), inliers (N,), score scalar)."""
    sets = sample_minimal_sets(key, valid, n_iters, 8)
    E = compute_e21(rays1[sets], rays2[sets])
    inl, score = check_essential(cam, E, rays1, rays2, uv1, uv2, valid,
                                 sigma)
    best = jnp.argmax(score)
    return E[best], inl[best], score[best]


def decompose_e(E: jnp.ndarray):
    """E -> (R1, R2, t-unit) (DecomposeE, Initializer.cpp:496-521)."""
    U, _, Vt = jnp.linalg.svd(E)
    t = U[:, 2]
    t = t / jnp.linalg.norm(t)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    E.dtype)
    R1 = U @ W @ Vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = U @ W.T @ Vt
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    return R1, R2, t


def check_rt(cam: CubemapCamera, R: jnp.ndarray, t: jnp.ndarray,
             rays1: jnp.ndarray, rays2: jnp.ndarray,
             uv1: jnp.ndarray, uv2: jnp.ndarray,
             inliers: jnp.ndarray, th2: float):
    """Triangulate and gate one (R,t) hypothesis (CheckRT cpp:398-494).

    Returns (n_good, p3d (N,3) in frame 1, good (N,), parallax_deg)."""
    p3d = triangulate_rays(rays1, rays2, R, t)
    finite = jnp.all(jnp.isfinite(p3d), axis=-1)
    O2 = -R.T @ t
    n1 = p3d
    d1 = jnp.linalg.norm(n1, axis=-1)
    n2 = p3d - O2
    d2 = jnp.linalg.norm(n2, axis=-1)
    cos_par = jnp.sum(n1 * n2, axis=-1) / jnp.maximum(d1 * d2, 1e-12)
    low_par = cos_par >= PARALLAX_COS_TH
    # FOV cheirality in both frames (z/dist > cosFovTh), waived at ~zero
    # parallax exactly as the reference does
    cheir1 = (p3d[:, 2] / jnp.maximum(d1, 1e-12)) > cam.cos_fov_th
    p3d2 = p3d @ R.T + t
    cheir2 = (p3d2[:, 2] / jnp.maximum(d2, 1e-12)) > cam.cos_fov_th
    ok = finite & inliers & (cheir1 | low_par) & (cheir2 | low_par)
    # cubemap reprojection error both frames
    uvp1, f1 = C.ray_to_cubemap(cam, p3d)
    uvp2, f2 = C.ray_to_cubemap(cam, p3d2)
    e1 = jnp.sum((uvp1 - uv1) ** 2, axis=-1)
    e2 = jnp.sum((uvp2 - uv2) ** 2, axis=-1)
    ok &= (f1 != C.UNKNOWN_FACE) & (e1 <= th2)
    ok &= (f2 != C.UNKNOWN_FACE) & (e2 <= th2)
    n_good = jnp.sum(ok.astype(jnp.int32))
    # parallax of the 50th-smallest cos among good points (cpp:482-489)
    cp = jnp.where(ok, cos_par, 2.0)        # invalid -> sorted last
    cp_sorted = jnp.sort(cp)
    idx = jnp.minimum(50, jnp.maximum(n_good - 1, 0))
    parallax = jnp.rad2deg(jnp.arccos(jnp.clip(cp_sorted[idx], -1.0, 1.0)))
    parallax = jnp.where(n_good > 0, parallax, 0.0)
    good = ok & (cos_par < PARALLAX_COS_TH)
    return n_good, p3d, good, parallax


class TwoViewResult(NamedTuple):
    success: jnp.ndarray    # () bool
    R21: jnp.ndarray        # (3,3)
    t21: jnp.ndarray        # (3,)
    p3d: jnp.ndarray        # (N,3) in frame 1
    good: jnp.ndarray       # (N,) triangulated inlier mask
    n_good: jnp.ndarray     # () int32
    inliers: jnp.ndarray    # (N,) epipolar inliers of best E


def reconstruct_e(cam: CubemapCamera, E: jnp.ndarray,
                  rays1, rays2, uv1, uv2, inliers,
                  sigma2: float = 1.0,
                  min_parallax: float = 1.0,
                  min_triangulated: int = 50,
                  good_ratio: float = 0.9) -> TwoViewResult:
    """Disambiguate the 4 (R,t) hypotheses (ReconstructE cpp:279-377).
    good_ratio is the fraction of epipolar inliers that must survive the
    cheirality/reprojection gates (0.9 in the reference, cpp:311)."""
    R1, R2, t = decompose_e(E)
    th2 = 4.0 * sigma2

    Rs = jnp.stack([R1, R2, R1, R2])
    ts = jnp.stack([t, t, -t, -t])
    n_good, p3d, good, parallax = jax.vmap(
        lambda Rh, th: check_rt(cam, Rh, th, rays1, rays2, uv1, uv2,
                                inliers, th2))(Rs, ts)
    max_good = jnp.max(n_good)
    n_inl = jnp.sum(inliers.astype(jnp.int32))
    n_min_good = jnp.maximum((good_ratio * n_inl).astype(jnp.int32),
                             jnp.int32(min_triangulated))
    n_similar = jnp.sum((n_good > 0.7 * max_good).astype(jnp.int32))
    best = jnp.argmax(n_good)
    ok = ((max_good >= n_min_good) & (n_similar == 1)
          & (parallax[best] > min_parallax))
    return TwoViewResult(success=ok, R21=Rs[best], t21=ts[best],
                         p3d=p3d[best], good=good[best] & ok,
                         n_good=n_good[best], inliers=inliers)


def initialize_two_view(cam: CubemapCamera, key: jax.Array,
                        rays1, rays2, uv1, uv2, valid,
                        n_iters: int = 200, sigma: float = 1.0,
                        min_parallax: float = 1.0,
                        min_triangulated: int = 50,
                        good_ratio: float = 0.9) -> TwoViewResult:
    """Full two-view bootstrap (InitializeWithRays, Initializer.cpp:53-116).

    All arrays are per-*match* (aligned pairs), fixed length with validity.
    """
    E, inl, _ = find_essential(cam, key, rays1, rays2, uv1, uv2, valid,
                               n_iters, sigma)
    return reconstruct_e(cam, E, rays1, rays2, uv1, uv2, inl,
                         sigma * sigma, min_parallax, min_triangulated,
                         good_ratio)
