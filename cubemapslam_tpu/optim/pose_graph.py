"""Essential-graph Sim3 pose-graph optimization.

Mirrors Optimizer::OptimizeEssentialGraph (Optimizer.cpp:623-886): vertices
are per-keyframe Sim3 S_iw (corrected loop region seeded with its corrected
Sim3, the rest from SE3 with s=1); edges are loop connections, spanning-tree
parents, high-covisibility pairs (w>=100) and past loop edges, each with the
relative measurement S_ji frozen at graph-build time and identity 7x7
information; the loop keyframe is fixed; ~20 LM iterations.

TPU design: all vertices update in one (M,7) tangent table; per-edge
residual e = log(S_ji * S_i * S_j^-1) with Jacobians from forward-mode
autodiff through the Sim3 exp/log (the reference's EdgeSim3 uses g2o numeric
Jacobians — autodiff is exact and batched); the normal system is assembled
by scatter-add into a dense (7M,7M) matrix and solved by Cholesky.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from cubemapslam_tpu import geometry as G


def _edge_residual(xi_i, xi_j, s_i, R_i, t_i, s_j, R_j, t_j,
                   s_m, R_m, t_m):
    """e = log( S_ji_meas * (exp(xi_i) S_i) * (exp(xi_j) S_j)^-1 )."""
    ds_i, dR_i, dt_i = G.sim3_exp(xi_i)
    ds_j, dR_j, dt_j = G.sim3_exp(xi_j)
    Si = G.sim3_compose(ds_i, dR_i, dt_i, s_i, R_i, t_i)
    Sj = G.sim3_compose(ds_j, dR_j, dt_j, s_j, R_j, t_j)
    Sj_inv = G.sim3_inverse(*Sj)
    err = G.sim3_compose(s_m, R_m, t_m, *G.sim3_compose(*Si, *Sj_inv))
    return G.sim3_log(*err)


def optimize_essential_graph(
        s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
        vert_valid: jnp.ndarray, vert_fixed: jnp.ndarray,
        edge_i: jnp.ndarray, edge_j: jnp.ndarray,
        meas_s: jnp.ndarray, meas_R: jnp.ndarray, meas_t: jnp.ndarray,
        edge_valid: jnp.ndarray,
        n_iters: int = 20) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Optimize Sim3 vertices S_iw over relative-Sim3 edges.

    s/R/t: (M,), (M,3,3), (M,3); edges (E,) indices with measurements
    S_ji = S_jw S_wi (meas maps vertex-i frame into vertex-j's... stored so
    that e = log(S_meas * S_i * S_j^-1) vanishes when consistent).
    Returns optimized (s, R, t).
    """
    M = s.shape[0]

    def gn_iter(k, state):
        s, R, t = state

        def edge_terms(ei, ej, ms, mR, mt):
            def f(xi2):
                return _edge_residual(xi2[:7], xi2[7:],
                                      s[ei], R[ei], t[ei],
                                      s[ej], R[ej], t[ej], ms, mR, mt)
            e0 = f(jnp.zeros(14))
            J = jax.jacfwd(f)(jnp.zeros(14))          # (7,14)
            return e0, J[:, :7], J[:, 7:]

        e0, Ji, Jj = jax.vmap(edge_terms)(edge_i, edge_j,
                                          meas_s, meas_R, meas_t)
        w = edge_valid.astype(jnp.float32)
        JiT = Ji.transpose(0, 2, 1) * w[:, None, None]
        JjT = Jj.transpose(0, 2, 1) * w[:, None, None]
        # dense (M,7,M,7) normal matrix via scatter-add
        H = jnp.zeros((M, 7, M, 7))
        H = H.at[edge_i, :, edge_i, :].add(JiT @ Ji)
        H = H.at[edge_j, :, edge_j, :].add(JjT @ Jj)
        H = H.at[edge_i, :, edge_j, :].add(JiT @ Jj)
        H = H.at[edge_j, :, edge_i, :].add(JjT @ Ji)
        b = jnp.zeros((M, 7))
        b = b.at[edge_i].add(-(JiT @ e0[..., None])[..., 0])
        b = b.at[edge_j].add(-(JjT @ e0[..., None])[..., 0])

        free = vert_valid & ~vert_fixed
        free7 = jnp.repeat(free, 7)
        Hd = H.reshape(M * 7, M * 7)
        Hd = jnp.where(free7[:, None] & free7[None, :], Hd, 0.0)
        Hd = Hd + jnp.diag(jnp.where(free7, 1e-6, 1.0))
        bd = jnp.where(free7, b.reshape(-1), 0.0)
        dx = jnp.linalg.solve(Hd, bd).reshape(M, 7)
        dx = jnp.where(free[:, None], dx, 0.0)
        ds, dR, dt = G.sim3_exp(dx)
        return G.sim3_compose(ds, dR, dt, s, R, t)

    s, R, t = jax.lax.fori_loop(0, n_iters, gn_iter, (s, R, t))
    return s, R, t


def remap_points_through_sim3(X: jnp.ndarray,
                              s_old: jnp.ndarray, R_old: jnp.ndarray,
                              t_old: jnp.ndarray,
                              s_new: jnp.ndarray, R_new: jnp.ndarray,
                              t_new: jnp.ndarray) -> jnp.ndarray:
    """Remap world points owned by a keyframe after its Sim3 changed:
    X' = S_new^-1 (S_old X) (CorrectLoop / essential-graph recovery,
    Optimizer.cpp:840-886)."""
    p_cam = G.sim3_apply(s_old, R_old, t_old, X)
    return G.sim3_apply(*G.sim3_inverse(s_new, R_new, t_new), p_cam)
