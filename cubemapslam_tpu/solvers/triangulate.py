"""Two-ray linear triangulation, batched.

The reference triangulates with a hand-built 4x4 DLT over bearing rays
(Initializer::Triangulate, Initializer.cpp:378-393; reused by
LocalMapping::CreateNewMapPoints, LocalMapping.cpp:266-383). Here the
constraint "P_i X is parallel to ray_i" is written as the full cross-product
rows [ray]_x P_i, giving a (6,4) system whose least-squares null vector is the
homogeneous point — batched SVD over all pairs at once.
"""

from __future__ import annotations

import jax.numpy as jnp

from cubemapslam_tpu.geometry import hat


def triangulate_rays(rays1: jnp.ndarray, rays2: jnp.ndarray,
                     R21: jnp.ndarray, t21: jnp.ndarray) -> jnp.ndarray:
    """Triangulate N correspondences.

    rays1/rays2: (N,3) unit bearings in each camera frame. (R21, t21) maps
    frame-1 points to frame 2. Returns (N,3) points in frame 1.
    """
    N = rays1.shape[0]
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P1 = jnp.broadcast_to(P1, (N, 3, 4))
    P2 = jnp.concatenate([R21, t21.reshape(3, 1)], axis=1)
    P2 = jnp.broadcast_to(P2, (N, 3, 4))
    A1 = hat(rays1) @ P1                      # (N,3,4)
    A2 = hat(rays2) @ P2
    A = jnp.concatenate([A1, A2], axis=1)     # (N,6,4)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    X = vt[:, 3, :]                           # (N,4)
    w = X[:, 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[:, :3] / w_safe[:, None]
