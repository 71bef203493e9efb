"""Horn 1987 closed-form absolute orientation (batched).

Used by Sim3Solver::ComputeSim3 (Sim3Solver.cpp:250-361) and the EPnP
R/t recovery (PnPsolver::estimate_R_and_t, PnPsolver.cpp:580-638): the
optimal rotation is the largest-eigenvalue eigenvector of the 4x4 quaternion
N-matrix built from the cross-covariance of the demeaned point sets.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from cubemapslam_tpu.geometry import quat_to_rot


def horn_alignment(p_to: jnp.ndarray, p_from: jnp.ndarray,
                   weights: jnp.ndarray = None,
                   fix_scale: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Solve p_to ~= s R p_from + t in closed form.

    p_to/p_from: (...,N,3); weights (...,N) optional {0,1} mask. Returns
    (s (...,), R (...,3,3), t (...,3)).
    """
    if weights is None:
        weights = jnp.ones(p_to.shape[:-1], p_to.dtype)
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2), 1e-12)
    c_to = jnp.sum(p_to * w, axis=-2) / wsum[..., 0:1]
    c_from = jnp.sum(p_from * w, axis=-2) / wsum[..., 0:1]
    q_to = (p_to - c_to[..., None, :]) * w
    q_from = (p_from - c_from[..., None, :]) * w
    # cross-covariance S[i,j] = sum q_from_i q_to_j  (maps from->to)
    S = jnp.einsum("...ni,...nj->...ij", q_from, q_to)
    Sxx, Sxy, Sxz = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    Syx, Syy, Syz = S[..., 1, 0], S[..., 1, 1], S[..., 1, 2]
    Szx, Szy, Szz = S[..., 2, 0], S[..., 2, 1], S[..., 2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, Syy - Sxx - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, Szz - Sxx - Syy], -1),
    ], -2)
    evals, evecs = jnp.linalg.eigh(N)
    q_wxyz = evecs[..., :, 3]                  # largest eigenvalue
    q_xyzw = jnp.concatenate([q_wxyz[..., 1:], q_wxyz[..., 0:1]], -1)
    R = quat_to_rot(q_xyzw)
    rot_from = jnp.einsum("...ij,...nj->...ni", R, q_from)
    if fix_scale:
        s = jnp.ones(p_to.shape[:-2], p_to.dtype)
    else:
        num = jnp.sum(q_to * rot_from, axis=(-1, -2))
        den = jnp.maximum(jnp.sum(q_from * q_from, axis=(-1, -2)), 1e-12)
        s = num / den
    t = c_to - s[..., None] * jnp.einsum("...ij,...j->...i", R, c_from)
    return s, R, t
