"""Single-vertex Sim3 refinement over matched point pairs.

Mirrors Optimizer::OptimizeSim3 (Optimizer.cpp:888-1091): one Sim3 vertex
S12, fixed 3D point pairs expressed in each keyframe's camera frame, a
forward edge projecting S12 p2 onto KF1's cubemap face of the matched
keypoint and an inverse edge projecting S12^-1 p1 onto KF2's — both with
Huber sqrt(th2), inliers cut at chi2 > th2 mid-way, then further iterations
(cpp:1010-1055). Jacobians by forward-mode autodiff through the Sim3 exp
(the reference's Sim3 multipinhole edges use numeric Jacobians,
g2o_cubemap_vertices_edges.h:162,200).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from cubemapslam_tpu import geometry as G
from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu.optim.residuals import project_to_face


def optimize_sim3(cam: CubemapCamera,
                  s12: jnp.ndarray, R12: jnp.ndarray, t12: jnp.ndarray,
                  p1: jnp.ndarray, p2: jnp.ndarray,
                  uv1: jnp.ndarray, face1: jnp.ndarray,
                  uv2: jnp.ndarray, face2: jnp.ndarray,
                  inv_sigma2_1: jnp.ndarray, inv_sigma2_2: jnp.ndarray,
                  valid: jnp.ndarray,
                  th2: float = 10.0, fix_scale: bool = False,
                  n_iters_a: int = 5, n_iters_b: int = 10
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                             jnp.ndarray, jnp.ndarray]:
    """Refine S12 (p1 ~= S12 p2). Returns (s, R, t, inliers, n_inliers)."""
    delta = jnp.sqrt(jnp.float32(th2))

    def residuals(xi, s, R, t):
        ds, dR, dt = G.sim3_exp(xi)
        s_, R_, t_ = G.sim3_compose(ds, dR, dt, s, R, t)
        p2_in1 = G.sim3_apply(s_, R_, t_, p2)
        e1 = uv1 - project_to_face(cam, p2_in1, face1)
        si, Ri, ti = G.sim3_inverse(s_, R_, t_)
        p1_in2 = G.sim3_apply(si, Ri, ti, p1)
        e2 = uv2 - project_to_face(cam, p1_in2, face2)
        return e1, e2

    def chi2_of(s, R, t):
        e1, e2 = residuals(jnp.zeros(7), s, R, t)
        c1 = jnp.sum(e1 * e1, axis=-1) * inv_sigma2_1
        c2 = jnp.sum(e2 * e2, axis=-1) * inv_sigma2_2
        return c1, c2

    def gn_phase(state, active, n_iters, robust):
        def body(_, st):
            s, R, t = st
            e1, e2 = residuals(jnp.zeros(7), s, R, t)

            def flat_res(xi):
                r1, r2 = residuals(xi, s, R, t)
                return jnp.concatenate([r1.reshape(-1), r2.reshape(-1)])

            J = jax.jacfwd(flat_res)(jnp.zeros(7))       # (4N?, 7) stacked
            n = p1.shape[0]
            J1 = J[:2 * n].reshape(n, 2, 7)
            J2 = J[2 * n:].reshape(n, 2, 7)
            c1 = jnp.sum(e1 * e1, axis=-1) * inv_sigma2_1
            c2 = jnp.sum(e2 * e2, axis=-1) * inv_sigma2_2

            def hw(c):
                r = jnp.sqrt(jnp.maximum(c, 1e-20))
                return jnp.where(robust & (r > delta), delta / r, 1.0)

            w1 = inv_sigma2_1 * hw(c1) * active
            w2 = inv_sigma2_2 * hw(c2) * active
            H = (jnp.einsum("nik,n,nil->kl", J1, w1, J1)
                 + jnp.einsum("nik,n,nil->kl", J2, w2, J2))
            b = -(jnp.einsum("nik,n,ni->k", J1, w1, e1)
                  + jnp.einsum("nik,n,ni->k", J2, w2, e2))
            if fix_scale:
                # freeze the scale coordinate of the tangent
                H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
                b = b.at[6].set(0.0)
            H = H + 1e-6 * jnp.eye(7)
            dx = jnp.linalg.solve(H, b)
            ds, dR, dt = G.sim3_exp(dx)
            return G.sim3_compose(ds, dR, dt, s, R, t)

        return jax.lax.fori_loop(0, n_iters, body, state)

    active = valid.astype(jnp.float32)
    state = (s12, R12, t12)
    state = gn_phase(state, active, n_iters_a, True)
    c1, c2 = chi2_of(*state)
    inl = valid & (c1 <= th2) & (c2 <= th2)
    state = gn_phase(state, inl.astype(jnp.float32), n_iters_b, False)
    c1, c2 = chi2_of(*state)
    inl = valid & (c1 <= th2) & (c2 <= th2)
    s, R, t = state
    return s, R, t, inl, jnp.sum(inl.astype(jnp.int32))
