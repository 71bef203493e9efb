"""Pose-only optimization (motion-only BA).

Mirrors Optimizer::PoseOptimization (Optimizer.cpp:48-190): one SE3 vertex,
unary multipinhole edges with Huber delta = sqrt(5.991), 4 rounds of 10 LM
iterations, outliers reclassified by chi2 after each round, robust kernel
dropped from round 3 (cpp:160-165 analog).

TPU design: edges are fixed-size arrays with a validity mask; each LM
iteration is residuals -> weights -> 6x6 normal equations by one reduction ->
damped solve; rounds/iters are lax.fori_loop, so the whole optimization is a
single jitted program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu.geometry import se3_exp, se3_compose
from cubemapslam_tpu.optim.residuals import (eval_point, pose_jac_from_state,
                                              reproj_residual)

CHI2_TH = 5.991
HUBER_DELTA = jnp.sqrt(jnp.float32(CHI2_TH))


def _huber_weight(chi2: jnp.ndarray) -> jnp.ndarray:
    """IRLS weight of the Huber kernel on the whitened residual norm."""
    r = jnp.sqrt(jnp.maximum(chi2, 1e-20))
    return jnp.where(r <= HUBER_DELTA, 1.0, HUBER_DELTA / r)


def pose_optimization(cam: CubemapCamera, R0: jnp.ndarray, t0: jnp.ndarray,
                      Xw: jnp.ndarray, face: jnp.ndarray,
                      uv_face: jnp.ndarray, inv_sigma2: jnp.ndarray,
                      valid: jnp.ndarray,
                      n_rounds: int = 4, n_iters: int = 10
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                 jnp.ndarray]:
    """Optimize (R0,t0) world->camera against N fixed landmarks.

    Returns (R, t, inliers, n_inliers). Edges with chi2 > 5.991 after a
    round are excluded from the next round and reported as outliers
    (Optimizer.cpp:139-170).
    """

    # face rotations are loop-invariant: gather once (residuals.py:30 was
    # re-gathered every LM iteration)
    R_face = cam.face_R[jnp.clip(face, 0, 4)]
    N = Xw.shape[0]

    def eval_at(R, t):
        e, Xc, local = eval_point(cam, R, t, Xw, R_face, uv_face)
        chi2 = jnp.sum(e * e, axis=-1) * inv_sigma2
        return e, chi2, Xc, local

    def rho_cost(chi2, robust, inl):
        rho = jnp.where(robust,
                        jnp.where(chi2 <= CHI2_TH, chi2,
                                  2.0 * HUBER_DELTA * jnp.sqrt(
                                      jnp.maximum(chi2, 1e-20)) - CHI2_TH),
                        chi2)
        return jnp.sum(jnp.where(inl & valid, rho, 0.0))

    def gn_iter(carry, robust):
        # the full eval state (e/chi2/Xc/local/cost) is carried at the
        # CURRENT point so each LM iteration evaluates the model exactly
        # once (at the trial point) — the sequential iteration chain is
        # device-latency-bound
        i, R, t, lm_lambda, inl, e, chi2, Xc, local, cost = carry
        w = inv_sigma2 * jnp.where(robust, _huber_weight(chi2), 1.0)
        w = jnp.where(inl & valid, w, 0.0)
        Jp = pose_jac_from_state(cam, Xc, local, R_face)  # (N,2,6)
        # normal equations as an exact-f32 outer-product reduction on the
        # VPU: an MXU dot of this (6, 2N)@(2N, 6) shape is pathological
        # under Precision.HIGHEST (measured ~60us per LM iteration)
        JW = Jp * w[:, None, None]                        # (N,2,6)
        H = jnp.sum(JW[..., :, None] * Jp[..., None, :], axis=(0, 1))
        b = -jnp.sum(JW * e[..., None], axis=(0, 1))
        H_d = H + lm_lambda * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
        delta = jnp.linalg.solve(H_d, b)
        dR, dt = se3_exp(delta)
        R_new, t_new = se3_compose(dR, dt, R, t)
        e2, chi22, Xc2, local2 = eval_at(R_new, t_new)
        cost2 = rho_cost(chi22, robust, inl)
        improved = cost2 < cost
        R = jnp.where(improved, R_new, R)
        t = jnp.where(improved, t_new, t)
        e = jnp.where(improved, e2, e)
        chi2 = jnp.where(improved, chi22, chi2)
        Xc = jnp.where(improved, Xc2, Xc)
        local = jnp.where(improved, local2, local)
        cost = jnp.where(improved, cost2, cost)
        lm_lambda = jnp.where(improved, lm_lambda * 0.5, lm_lambda * 4.0)
        lm_lambda = jnp.clip(lm_lambda, 1e-8, 1e4)
        # converged: the accepted step is tiny (g2o's LM also terminates
        # early; running out the fixed 10 iterations is pure latency)
        done = improved & (jnp.sum(delta * delta) < 1e-12)
        i = jnp.where(done, n_iters, i + 1)
        return (i, R, t, lm_lambda, inl, e, chi2, Xc, local, cost)

    def round_body(r, carry):
        R, t, _, inl, e, chi2, Xc, local, _ = carry
        robust = r < 2  # rounds 3-4 drop the Huber kernel (cpp:160-165)
        cost = rho_cost(chi2, robust, inl)
        state = (jnp.int32(0), R, t, jnp.float32(1e-3), inl, e, chi2,
                 Xc, local, cost)
        state = jax.lax.while_loop(
            lambda c: c[0] < n_iters, lambda c: gn_iter(c, robust), state)
        _, R, t, lmb, _, e, chi2, Xc, local, cost = state
        inl = valid & (chi2 <= CHI2_TH)
        return (R, t, lmb, inl, e, chi2, Xc, local, cost)

    e0, chi20, Xc0, local0 = eval_at(R0, t0)
    init = (R0, t0, jnp.float32(1e-3), valid, e0, chi20, Xc0, local0,
            jnp.float32(0.0))
    R, t, _, inl, _, _, _, _, _ = jax.lax.fori_loop(
        0, n_rounds, round_body, init)
    return R, t, inl, jnp.sum(inl.astype(jnp.int32))
