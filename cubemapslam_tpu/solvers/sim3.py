"""Sim3 RANSAC (loop-closure alignment), batched.

Re-design of Sim3Solver (src/Sim3Solver.cpp): Horn closed-form Sim3 from
3-point minimal sets (ComputeSim3 cpp:250-361), inliers checked by projecting
both point sets through the candidate transform into both keyframes' cubemaps
with chi2 9.21*sigma2 gates in each direction (CheckInliers cpp:364-394,
thresholds set at cpp:114-118). bFixScale=False for monocular
(System.cpp:119). All RANSAC iterations evaluate as one vmapped batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cubemapslam_tpu import camera as C
from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu.solvers.horn import horn_alignment
from cubemapslam_tpu.solvers.sampling import sample_minimal_sets


class Sim3Result(NamedTuple):
    success: jnp.ndarray    # () bool
    s12: jnp.ndarray        # () scale: p1 = s12 R12 p2 + t12
    R12: jnp.ndarray        # (3,3)
    t12: jnp.ndarray        # (3,)
    inliers: jnp.ndarray    # (N,) bool
    n_inliers: jnp.ndarray  # () int32


def _check_inliers(cam: CubemapCamera, s12, R12, t12, p1, p2, uv1, uv2,
                   max_err1, max_err2, valid):
    """Project p2 through T12 against uv1 and p1 through T21 against uv2."""
    p2_in1 = s12 * (p2 @ R12.T) + t12
    uvp1, f1 = C.ray_to_cubemap(cam, p2_in1)
    e1 = jnp.sum((uvp1 - uv1) ** 2, axis=-1)
    s21 = 1.0 / s12
    R21 = R12.T
    t21 = -s21 * (R21 @ t12)
    p1_in2 = s21 * (p1 @ R21.T) + t21
    uvp2, f2 = C.ray_to_cubemap(cam, p1_in2)
    e2 = jnp.sum((uvp2 - uv2) ** 2, axis=-1)
    inl = (valid & (f1 != C.UNKNOWN_FACE) & (f2 != C.UNKNOWN_FACE)
           & (e1 < max_err1) & (e2 < max_err2))
    return inl, jnp.sum(inl.astype(jnp.int32))


def sim3_ransac(cam: CubemapCamera, key: jax.Array,
                p1: jnp.ndarray, p2: jnp.ndarray,
                uv1: jnp.ndarray, uv2: jnp.ndarray,
                level_sigma2_1: jnp.ndarray, level_sigma2_2: jnp.ndarray,
                valid: jnp.ndarray, n_iters: int = 300,
                fix_scale: bool = False, chi2_th: float = 9.21,
                min_inliers: int = 20) -> Sim3Result:
    """p1/p2: (N,3) matched map points in KF1/KF2 camera frames; uv1/uv2
    their observed cubemap pixels; per-point chi2 gates scale with the
    keypoint level sigma (cpp:114-118)."""
    max_err1 = chi2_th * level_sigma2_1
    max_err2 = chi2_th * level_sigma2_2
    sets = sample_minimal_sets(key, valid, n_iters, 3)

    def one(idx):
        w = jnp.zeros(p1.shape[0]).at[idx].set(1.0) * valid
        s, R, t = horn_alignment(p1, p2, weights=w, fix_scale=fix_scale)
        s = jnp.maximum(s, 1e-6)
        inl, n = _check_inliers(cam, s, R, t, p1, p2, uv1, uv2,
                                max_err1, max_err2, valid)
        return s, R, t, inl, n

    ss, Rs, ts, inls, ns = jax.vmap(one)(sets)
    best = jnp.argmax(ns)
    # polish with all inliers of the best hypothesis
    w_ref = inls[best].astype(jnp.float32)
    s_r, R_r, t_r = horn_alignment(p1, p2, weights=w_ref,
                                   fix_scale=fix_scale)
    s_r = jnp.maximum(s_r, 1e-6)
    inl_r, n_r = _check_inliers(cam, s_r, R_r, t_r, p1, p2, uv1, uv2,
                                max_err1, max_err2, valid)
    use_r = n_r >= ns[best]
    s = jnp.where(use_r, s_r, ss[best])
    R = jnp.where(use_r, R_r, Rs[best])
    t = jnp.where(use_r, t_r, ts[best])
    inl = jnp.where(use_r, inl_r, inls[best])
    n = jnp.where(use_r, n_r, ns[best])
    return Sim3Result(success=n >= min_inliers, s12=s, R12=R, t12=t,
                      inliers=inl, n_inliers=n)
