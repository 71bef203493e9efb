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
from cubemapslam_tpu.optim.residuals import reproj_residual, reproj_jacobians

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

    def chi2_of(R, t):
        e = reproj_residual(cam, R, t, Xw, face, uv_face)
        chi2 = jnp.sum(e * e, axis=-1) * inv_sigma2
        return e, chi2

    def rho_cost(chi2, robust, inl):
        rho = jnp.where(robust,
                        jnp.where(chi2 <= CHI2_TH, chi2,
                                  2.0 * HUBER_DELTA * jnp.sqrt(
                                      jnp.maximum(chi2, 1e-20)) - CHI2_TH),
                        chi2)
        return jnp.sum(jnp.where(inl & valid, rho, 0.0))

    def gn_iter(carry, robust):
        # e/chi2/cost are carried at the CURRENT point so each LM iteration
        # evaluates residuals exactly once (at the trial point) — the
        # sequential 40-iteration chain is device-latency-bound
        R, t, lm_lambda, inl, e, chi2, cost = carry
        w = inv_sigma2 * jnp.where(robust, _huber_weight(chi2), 1.0)
        w = jnp.where(inl & valid, w, 0.0)
        Jp, _ = reproj_jacobians(cam, R, t, Xw, face)    # (N,2,6)
        JtW = Jp.transpose(0, 2, 1) * w[:, None, None]   # (N,6,2)
        H = jnp.sum(JtW @ Jp, axis=0)                    # (6,6)
        b = -jnp.sum((JtW @ e[..., None])[..., 0], axis=0)  # (6,) = -JᵀWe
        H_d = H + lm_lambda * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
        delta = jnp.linalg.solve(H_d, b)
        dR, dt = se3_exp(delta)
        R_new, t_new = se3_compose(dR, dt, R, t)
        e2, chi22 = chi2_of(R_new, t_new)
        cost2 = rho_cost(chi22, robust, inl)
        improved = cost2 < cost
        R = jnp.where(improved, R_new, R)
        t = jnp.where(improved, t_new, t)
        e = jnp.where(improved, e2, e)
        chi2 = jnp.where(improved, chi22, chi2)
        cost = jnp.where(improved, cost2, cost)
        lm_lambda = jnp.where(improved, lm_lambda * 0.5, lm_lambda * 4.0)
        lm_lambda = jnp.clip(lm_lambda, 1e-8, 1e4)
        return (R, t, lm_lambda, inl, e, chi2, cost)

    def round_body(r, carry):
        R, t, _, inl, e, chi2, _ = carry
        robust = r < 2  # rounds 3-4 drop the Huber kernel (cpp:160-165)
        cost = rho_cost(chi2, robust, inl)
        carry = (R, t, jnp.float32(1e-3), inl, e, chi2, cost)
        carry = jax.lax.fori_loop(
            0, n_iters, lambda i, c: gn_iter(c, robust), carry)
        R, t, lmb, _, e, chi2, cost = carry
        inl = valid & (chi2 <= CHI2_TH)
        return (R, t, lmb, inl, e, chi2, cost)

    e0, chi20 = chi2_of(R0, t0)
    init = (R0, t0, jnp.float32(1e-3), valid, e0, chi20, jnp.float32(0.0))
    R, t, _, inl, _, _, _ = jax.lax.fori_loop(0, n_rounds, round_body, init)
    return R, t, inl, jnp.sum(inl.astype(jnp.int32))
