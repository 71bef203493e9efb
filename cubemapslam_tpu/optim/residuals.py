"""Multipinhole reprojection residuals + analytic Jacobians.

The optimization-side camera model of the reference lives in its custom g2o
edges (g2o_cubemap_vertices_edges.cpp): each edge stores the keypoint's face
and its in-face pixel measurement; ``multipinhole_project`` rotates the
camera-frame point into that face's frame and applies the shared pinhole
intrinsics (cpp:116-124). The analytic Jacobians compose the pinhole
projection Jacobian with the face rotation and the SE3 action
(cpp:61-114 pose-only; cpp:164-223 pose+point).

Here the same math is one vmapped function; the face rotation is a gather
from the (5,3,3) tensor. Tangent convention: left-multiplicative SE3 update
T <- exp([rho, phi]) T, so dXc/d(rho,phi) = [I | -hat(Xc)].
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu.geometry import hat, mat3_apply


def project_to_face(cam: CubemapCamera, Xc: jnp.ndarray,
                    face: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame point(s) -> in-face pixel(s) on the *given* face
    (multipinhole_project / TransformRaysToTargetFace)."""
    R_face = cam.face_R[jnp.clip(face, 0, 4)]
    local = mat3_apply(R_face, Xc)
    fx, fy, cx, cy = (cam.fxycxy[0], cam.fxycxy[1],
                      cam.fxycxy[2], cam.fxycxy[3])
    z = local[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    return jnp.stack([local[..., 0] * fx / z_safe + cx,
                      local[..., 1] * fy / z_safe + cy], axis=-1)


def reproj_residual(cam: CubemapCamera, R: jnp.ndarray, t: jnp.ndarray,
                    Xw: jnp.ndarray, face: jnp.ndarray,
                    uv_face: jnp.ndarray) -> jnp.ndarray:
    """e = observed - projected, in in-face pixels. Broadcasts over edges."""
    Xc = mat3_apply(R, Xw) + t
    return uv_face - project_to_face(cam, Xc, face)


def _proj_jac_local(cam: CubemapCamera, local: jnp.ndarray) -> jnp.ndarray:
    """du/dlocal for the shared pinhole: (...,2,3)."""
    fx, fy = cam.fxycxy[0], cam.fxycxy[1]
    x, y, z = local[..., 0], local[..., 1], local[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([fx * iz, zero, -fx * x * iz2], -1),
        jnp.stack([zero, fy * iz, -fy * y * iz2], -1),
    ], -2)


def eval_point(cam: CubemapCamera, R: jnp.ndarray, t: jnp.ndarray,
               Xw: jnp.ndarray, R_face: jnp.ndarray, uv_face: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One shared pass: residual e, camera-frame Xc and face-local point
    (R_face is the pre-gathered per-edge face rotation; the gather is
    loop-invariant in LM and hoisted by the caller)."""
    Xc = mat3_apply(R, Xw) + t
    local = mat3_apply(R_face, Xc)
    fx, fy, cx, cy = (cam.fxycxy[0], cam.fxycxy[1],
                      cam.fxycxy[2], cam.fxycxy[3])
    z = local[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    proj = jnp.stack([local[..., 0] * fx / z_safe + cx,
                      local[..., 1] * fy / z_safe + cy], axis=-1)
    return uv_face - proj, Xc, local


def pose_jac_from_state(cam: CubemapCamera, Xc: jnp.ndarray,
                        local: jnp.ndarray, R_face: jnp.ndarray
                        ) -> jnp.ndarray:
    """de/dxi (...,2,6) from a cached eval_point state (no reprojection).

    Fully unrolled (N,)-shaped lane math exploiting the pinhole Jacobian's
    sparsity: J_proj = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]], so
    (J_proj R_face)[r, k] is two fused multiply-adds per entry."""
    fx, fy = cam.fxycxy[0], cam.fxycxy[1]
    lx, ly, lz = local[..., 0], local[..., 1], local[..., 2]
    z_safe = jnp.where(jnp.abs(lz) < 1e-12, 1e-12, lz)
    iz = 1.0 / z_safe
    a0 = fx * iz                    # J_proj[0,0]
    a2 = -fx * lx * iz * iz         # J_proj[0,2]
    b1 = fy * iz                    # J_proj[1,1]
    b2 = -fy * ly * iz * iz         # J_proj[1,2]
    JR = [[a0 * R_face[..., 0, k] + a2 * R_face[..., 2, k]
           for k in range(3)],
          [b1 * R_face[..., 1, k] + b2 * R_face[..., 2, k]
           for k in range(3)]]
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    rows = []
    for r in range(2):
        A0, A1, A2 = JR[r]
        # JR @ hat(Xc): hat = [[0,-z,y],[z,0,-x],[-y,x,0]]
        h0 = A1 * z - A2 * y
        h1 = -A0 * z + A2 * x
        h2 = A0 * y - A1 * x
        rows.append(jnp.stack([-A0, -A1, -A2, h0, h1, h2], axis=-1))
    return jnp.stack(rows, axis=-2)                     # (...,2,6)


def reproj_jacobians(cam: CubemapCamera, R: jnp.ndarray, t: jnp.ndarray,
                     Xw: jnp.ndarray, face: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Analytic (de/dxi (...,2,6), de/dXw (...,2,3)).

    de/dxi = -J_proj R_face [I | -hat(Xc)]   (xi = [rho, phi], left update)
    de/dXw = -J_proj R_face R
    Mirrors g2o_cubemap_vertices_edges.cpp:61-223 (modulo the tangent
    ordering, which is internal to this optimizer).
    """
    Xc = mat3_apply(R, Xw) + t
    R_face = cam.face_R[jnp.clip(face, 0, 4)]
    local = mat3_apply(R_face, Xc)
    J_pose = pose_jac_from_state(cam, Xc, local, R_face)
    # J_point = -(J_proj R_face) R, unrolled like pose_jac_from_state
    fx, fy = cam.fxycxy[0], cam.fxycxy[1]
    lx, ly, lz = local[..., 0], local[..., 1], local[..., 2]
    z_safe = jnp.where(jnp.abs(lz) < 1e-12, 1e-12, lz)
    iz = 1.0 / z_safe
    a0 = fx * iz
    a2 = -fx * lx * iz * iz
    b1 = fy * iz
    b2 = -fy * ly * iz * iz
    JR = [[a0 * R_face[..., 0, k] + a2 * R_face[..., 2, k]
           for k in range(3)],
          [b1 * R_face[..., 1, k] + b2 * R_face[..., 2, k]
           for k in range(3)]]
    rows = []
    for r in range(2):
        A0, A1, A2 = JR[r]
        rows.append(jnp.stack(
            [-(A0 * R[..., 0, 0] + A1 * R[..., 1, 0] + A2 * R[..., 2, 0]),
             -(A0 * R[..., 0, 1] + A1 * R[..., 1, 1] + A2 * R[..., 2, 1]),
             -(A0 * R[..., 0, 2] + A1 * R[..., 1, 2] + A2 * R[..., 2, 2])],
            axis=-1))
    J_point = jnp.stack(rows, axis=-2)                  # (...,2,3)
    return J_pose, J_point
