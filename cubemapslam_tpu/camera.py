"""Cubemap + Scaramuzza omnidirectional camera model as pure JAX.

TPU-native re-design of the reference's ``CamModelGeneral`` singleton
(include/CamModelGeneral.h, src/CamModelGeneral.cpp): instead of per-point
virtual dispatch over a mutable singleton, the camera is an immutable pytree of
arrays and every mapping (fisheye<->ray, ray<->cubemap, face selection, face
rotations, angular noise) is a batched, jit-friendly function over ``(..., )``
point arrays. The 5 per-face rotations are one constant ``(5,3,3)`` tensor so
face dispatch is a gather, not a switch.

Face conventions (match reference eFace, CamModelGeneral.h:55-62):
    FRONT=0, LEFT=1, RIGHT=2, UPPER=3, LOWER=4, UNKNOWN=-1.

Cubemap cross layout (System.cpp:83-84, CamModelGeneral.cpp:95-154): one
3W x 3H image; face offsets in face units are FRONT(1,1), LEFT(0,1),
RIGHT(2,1), UPPER(1,0), LOWER(1,2). All faces share pinhole intrinsics
fx=fy=cx=cy=W/2.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cubemapslam_tpu.config import SlamConfig

# Face ids (CamModelGeneral.h:55-62)
UNKNOWN_FACE = -1
FRONT = 0
LEFT = 1
RIGHT = 2
UPPER = 3
LOWER = 4

# R_rig_to_face: local = R @ rig  (cvtRigToFaces, CamModelGeneral.h:417-443)
#   FRONT: (x, y, z)   LEFT: (z, y, -x)   RIGHT: (-z, y, x)
#   UPPER: (x, z, -y)  LOWER: (x, -z, y)
_FACE_R_NP = np.array(
    [
        [[1, 0, 0], [0, 1, 0], [0, 0, 1]],     # FRONT
        [[0, 0, 1], [0, 1, 0], [-1, 0, 0]],    # LEFT
        [[0, 0, -1], [0, 1, 0], [1, 0, 0]],    # RIGHT
        [[1, 0, 0], [0, 0, 1], [0, -1, 0]],    # UPPER
        [[1, 0, 0], [0, 0, -1], [0, 1, 0]],    # LOWER
    ],
    dtype=np.float32,
)

# Cross-layout offsets in face units (ox, oy) (CamModelGeneral.cpp:109-150)
_FACE_OFFSET_NP = np.array(
    [[1, 1], [0, 1], [2, 1], [1, 0], [1, 2]], dtype=np.float32
)

# Octant-test priority order used by TransformRaysToCubemap
# (CamModelGeneral.cpp:102-151): front, right, left, lower, upper.
_OCTANT_PRIORITY = np.array([FRONT, RIGHT, LEFT, LOWER, UPPER], dtype=np.int32)


class CubemapCamera(NamedTuple):
    """Immutable camera parameters; all leaves are jnp arrays (pytree)."""

    poly: jnp.ndarray        # (P,)  forward poly a0..aP-1, z = -horner(poly, rho)
    inv_poly: jnp.ndarray    # (Q,)  inverse poly rho(theta)
    c: jnp.ndarray           # affine c (scalar)
    d: jnp.ndarray
    e: jnp.ndarray
    u0: jnp.ndarray
    v0: jnp.ndarray
    fisheye_wh: jnp.ndarray  # (2,) [W, H] as float
    face_wh: jnp.ndarray     # (2,) [W, H] face size as float
    fxycxy: jnp.ndarray      # (4,) [fx, fy, cx, cy] shared pinhole intrinsics
    cos_fov_th: jnp.ndarray  # scalar cos(fov/2)
    face_R: jnp.ndarray      # (5,3,3) rig->face rotations
    face_offset: jnp.ndarray  # (5,2) face-unit offsets in the cross layout

    @property
    def inv_affine(self):
        return self.c - self.d * self.e

    @staticmethod
    def from_config(cfg: SlamConfig, dtype=jnp.float32) -> "CubemapCamera":
        return CubemapCamera(
            poly=jnp.asarray(cfg.poly, dtype),
            inv_poly=jnp.asarray(cfg.inv_poly, dtype),
            c=jnp.asarray(cfg.affine_c, dtype),
            d=jnp.asarray(cfg.affine_d, dtype),
            e=jnp.asarray(cfg.affine_e, dtype),
            u0=jnp.asarray(cfg.u0, dtype),
            v0=jnp.asarray(cfg.v0, dtype),
            fisheye_wh=jnp.asarray(
                [cfg.fisheye_width, cfg.fisheye_height], dtype),
            face_wh=jnp.asarray([cfg.cube_face_w, cfg.cube_face_h], dtype),
            fxycxy=jnp.asarray(
                [cfg.face_fx, cfg.face_fy, cfg.face_cx, cfg.face_cy], dtype),
            cos_fov_th=jnp.asarray(cfg.cos_fov_th, dtype),
            face_R=jnp.asarray(_FACE_R_NP, dtype),
            face_offset=jnp.asarray(_FACE_OFFSET_NP, dtype),
        )


def _horner(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate sum_i coeffs[i] * x**i (CamModelGeneral.h:43-50)."""
    def body(carry, c):
        return carry * x + c, None
    res, _ = jax.lax.scan(body, jnp.zeros_like(x), coeffs, reverse=True)
    return res


# ---------------------------------------------------------------------------
# Fisheye image <-> unit rays (Scaramuzza model)
# ---------------------------------------------------------------------------

def img_to_ray(cam: CubemapCamera, uv: jnp.ndarray) -> jnp.ndarray:
    """Fisheye pixel(s) -> unit bearing ray(s). (ImgToWorld, h:242-300).

    uv: (..., 2) pixels; returns (..., 3) unit rays (+z forward is -poly dir).
    """
    u_t = uv[..., 0] - cam.u0
    v_t = uv[..., 1] - cam.v0
    inv_aff = cam.inv_affine
    x = (u_t - cam.d * v_t) / inv_aff
    y = (-cam.e * u_t + cam.c * v_t) / inv_aff
    rho = jnp.sqrt(x * x + y * y)
    z = -_horner(cam.poly, rho)
    X = jnp.stack([x, y, z], axis=-1)
    return X / jnp.linalg.norm(X, axis=-1, keepdims=True)


def ray_to_img(cam: CubemapCamera, rays: jnp.ndarray) -> jnp.ndarray:
    """Ray(s) -> fisheye pixel(s) via theta=atan(-z/rho) and the inverse
    polynomial (WorldToImg, CamModelGeneral.h:359-374)."""
    x, y, z = rays[..., 0], rays[..., 1], rays[..., 2]
    norm = jnp.sqrt(x * x + y * y)
    norm = jnp.where(norm == 0.0, 1e-14, norm)
    theta = jnp.arctan(-z / norm)
    rho = _horner(cam.inv_poly, theta)
    uu = x / norm * rho
    vv = y / norm * rho
    u = uu * cam.c + vv * cam.d + cam.u0
    v = uu * cam.e + vv + cam.v0
    return jnp.stack([u, v], axis=-1)


# ---------------------------------------------------------------------------
# Face selection
# ---------------------------------------------------------------------------

def face_from_ray(rays: jnp.ndarray) -> jnp.ndarray:
    """Octant test on rig rays -> face id, reference priority order
    (TransformRaysToCubemap, CamModelGeneral.cpp:102-151). (...,3) -> (...,)"""
    x, y, z = rays[..., 0], rays[..., 1], rays[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    conds = jnp.stack(
        [
            (z > 0) & (ax <= z) & (ay <= z),      # FRONT
            (x > 0) & (ay <= x) & (az <= x),      # RIGHT
            (x < 0) & (ay <= -x) & (az <= -x),    # LEFT
            (y > 0) & (ax <= y) & (az <= y),      # LOWER
            (y < 0) & (ax <= -y) & (az <= -y),    # UPPER
        ],
        axis=-1,
    )
    any_hit = jnp.any(conds, axis=-1)
    first = jnp.argmax(conds, axis=-1)  # first True in priority order
    prio = jnp.asarray(_OCTANT_PRIORITY)
    return jnp.where(any_hit, prio[first], UNKNOWN_FACE)


def face_from_cubemap_uv(cam: CubemapCamera, uv: jnp.ndarray) -> jnp.ndarray:
    """Cubemap-cross pixel -> face id by 2D cell (FaceInCubemap, h:445-470)."""
    i = jnp.floor(uv[..., 0] / cam.face_wh[0]).astype(jnp.int32)
    j = jnp.floor(uv[..., 1] / cam.face_wh[1]).astype(jnp.int32)
    # cell (i,j) in the 3x3 cross; -1 where off-cross.
    cell_face = jnp.asarray(
        [[UNKNOWN_FACE, LEFT, UNKNOWN_FACE],
         [UPPER, FRONT, LOWER],
         [UNKNOWN_FACE, RIGHT, UNKNOWN_FACE]], dtype=jnp.int32)
    inside = (i >= 0) & (i < 3) & (j >= 0) & (j < 3)
    i_c = jnp.clip(i, 0, 2)
    j_c = jnp.clip(j, 0, 2)
    return jnp.where(inside, cell_face[i_c, j_c], UNKNOWN_FACE)


# ---------------------------------------------------------------------------
# Rays <-> cubemap
# ---------------------------------------------------------------------------

def rig_to_face(cam: CubemapCamera, rays: jnp.ndarray,
                face: jnp.ndarray) -> jnp.ndarray:
    """Rotate rig-frame points into per-point face frames (cvtRigToFaces)."""
    R = cam.face_R[jnp.clip(face, 0, 4)]          # (...,3,3)
    return jnp.einsum("...ij,...j->...i", R, rays)


def face_to_rig(cam: CubemapCamera, pts: jnp.ndarray,
                face: jnp.ndarray) -> jnp.ndarray:
    """Inverse of rig_to_face (cvtFacesToRig, h:388-414)."""
    R = cam.face_R[jnp.clip(face, 0, 4)]
    return jnp.einsum("...ji,...j->...i", R, pts)


def ray_to_cubemap(cam: CubemapCamera, rays: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rig ray(s)/point(s) -> cubemap-cross pixel + face.

    Mirrors TransformRaysToCubemap (CamModelGeneral.cpp:95-154): octant face
    select, rotate into the face frame, pinhole projection, reject projections
    falling outside the face, then add the cross-layout offset.

    Returns (uv (...,2) cubemap-cross pixels, face (...,) int32; UNKNOWN=-1
    with uv=(-1,-1) where invalid).
    """
    face = face_from_ray(rays)
    local = rig_to_face(cam, rays, face)
    fx, fy, cx, cy = (cam.fxycxy[0], cam.fxycxy[1],
                      cam.fxycxy[2], cam.fxycxy[3])
    z = local[..., 2]
    z_safe = jnp.where(z == 0, 1e-14, z)
    up = local[..., 0] * fx / z_safe + cx
    vp = local[..., 1] * fy / z_safe + cy
    in_face = ((up >= 0) & (up < cam.face_wh[0])
               & (vp >= 0) & (vp < cam.face_wh[1]))
    valid = (face != UNKNOWN_FACE) & in_face
    off = cam.face_offset[jnp.clip(face, 0, 4)]
    u_cm = up + off[..., 0] * cam.face_wh[0]
    v_cm = vp + off[..., 1] * cam.face_wh[1]
    uv = jnp.stack([jnp.where(valid, u_cm, -1.0),
                    jnp.where(valid, v_cm, -1.0)], axis=-1)
    face = jnp.where(valid, face, UNKNOWN_FACE)
    return uv, face


def ray_to_face_uv(cam: CubemapCamera, rays: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Like ray_to_cubemap but returns in-face coordinates without the cross
    offset (TransformRaysToCubemapFace, CamModelGeneral.cpp:172-226)."""
    uv, face = ray_to_cubemap(cam, rays)
    off = cam.face_offset[jnp.clip(face, 0, 4)]
    in_face = uv - off * cam.face_wh
    in_face = jnp.where(face[..., None] != UNKNOWN_FACE, in_face, -1.0)
    return in_face, face


def ray_to_target_face(cam: CubemapCamera, rays: jnp.ndarray,
                       face: jnp.ndarray) -> jnp.ndarray:
    """Project onto a *given* face even if the point lies outside it —
    used by the optimizer edges (TransformRaysToTargetFace, cpp:228-263).
    Returns in-face (u,v)."""
    local = rig_to_face(cam, rays, face)
    fx, fy, cx, cy = (cam.fxycxy[0], cam.fxycxy[1],
                      cam.fxycxy[2], cam.fxycxy[3])
    z = local[..., 2]
    z_safe = jnp.where(z == 0, 1e-14, z)
    up = local[..., 0] * fx / z_safe + cx
    vp = local[..., 1] * fy / z_safe + cy
    return jnp.stack([up, vp], axis=-1)


def cubemap_to_ray(cam: CubemapCamera, uv: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cubemap-cross pixel -> unit rig ray + face
    (TransformCubemapToRays, CamModelGeneral.h:494-513)."""
    face = face_from_cubemap_uv(cam, uv)
    fx, fy, cx, cy = (cam.fxycxy[0], cam.fxycxy[1],
                      cam.fxycxy[2], cam.fxycxy[3])
    in_u = uv[..., 0] - jnp.floor(uv[..., 0] / cam.face_wh[0]) * cam.face_wh[0]
    in_v = uv[..., 1] - jnp.floor(uv[..., 1] / cam.face_wh[1]) * cam.face_wh[1]
    local = jnp.stack(
        [(in_u - cx) / fx, (in_v - cy) / fy, jnp.ones_like(in_u)], axis=-1)
    rig = face_to_rig(cam, local, face)
    n = jnp.linalg.norm(rig, axis=-1, keepdims=True)
    rig = rig / jnp.where(n > 0, n, 1.0)
    rig = jnp.where(face[..., None] != UNKNOWN_FACE, rig, 0.0)
    return rig, face


def cubemap_uv_to_in_face(cam: CubemapCamera, uv: jnp.ndarray) -> jnp.ndarray:
    """Cross coords -> in-face coords (GetPosInFace, h:204-209)."""
    return uv - jnp.floor(uv / cam.face_wh) * cam.face_wh


# ---------------------------------------------------------------------------
# Fisheye <-> cubemap (for warp-map building)
# ---------------------------------------------------------------------------

def cubemap_to_fisheye(cam: CubemapCamera, uv: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cubemap-cross pixel -> fisheye pixel; invalid -> (-1,-1)
    (CubemapToFisheye, CamModelGeneral.cpp:265-290). Returns (uv_f, valid)."""
    ray, face = cubemap_to_ray(cam, uv)
    uv_f = ray_to_img(cam, ray)
    inside = ((uv_f[..., 0] >= 0) & (uv_f[..., 0] < cam.fisheye_wh[0])
              & (uv_f[..., 1] >= 0) & (uv_f[..., 1] < cam.fisheye_wh[1]))
    valid = inside & (face != UNKNOWN_FACE)
    uv_f = jnp.where(valid[..., None], uv_f, -1.0)
    return uv_f, valid


def fisheye_to_cubemap(cam: CubemapCamera, uv_f: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fisheye pixel -> cubemap pixel + face (FisheyeToCubemap, h:377-385)."""
    ray = img_to_ray(cam, uv_f)
    return ray_to_cubemap(cam, ray)


# ---------------------------------------------------------------------------
# Angular noise model (for the ray-epipolar checks)
# ---------------------------------------------------------------------------

def epipolar_radius(cam: CubemapCamera, uv: jnp.ndarray) -> jnp.ndarray:
    """Distance of an in-face point from the face center
    (GetEpipolarRadius, CamModelGeneral.h:211-216). uv is cross coords."""
    in_face = cubemap_uv_to_in_face(cam, uv)
    cx, cy = cam.fxycxy[2], cam.fxycxy[3]
    return jnp.sqrt((in_face[..., 0] - cx) ** 2 + (in_face[..., 1] - cy) ** 2)


def vector_sigma(cam: CubemapCamera, uv: jnp.ndarray,
                 sigma_px: float = 1.0) -> jnp.ndarray:
    """1-pixel image noise -> angular sigma on the bearing ray
    (GetVectorSigma, CamModelGeneral.cpp:292-297)."""
    r = epipolar_radius(cam, uv)
    fx = cam.fxycxy[0]
    return sigma_px * fx / (fx * fx + r * (r + sigma_px))


def vector_sigma_along_normal_pairwise(cam: CubemapCamera,
                                       uv2: jnp.ndarray,
                                       normals: jnp.ndarray,
                                       sigma_px: float = 1.0
                                       ) -> jnp.ndarray:
    """(N1,N2) anisotropic angular sigmas for every (epipolar normal,
    keypoint-2) pair — the pairwise form of vector_sigma_along_normal.

    The per-pair dependence on the normal enters only through the face-frame
    components nfx/nfy and the two in-face projections OP.epi / OP.vert,
    all LINEAR in the normal: they factor into four (N1,3) @ (3,N2) MXU
    matmuls against per-keypoint vectors, with the trigonometric tail
    elementwise on (N1,N2). A vmapped per-normal camera call evaluates the
    full model N1*N2 times (~40 ms per neighbor at the Lafida working
    scale — this form is ~1 ms)."""
    face = face_from_cubemap_uv(cam, uv2)
    Rf = cam.face_R[jnp.clip(face, 0, 4)]               # (N2,3,3)
    r0 = Rf[:, 0, :]
    r1 = Rf[:, 1, :]
    in_face = cubemap_uv_to_in_face(cam, uv2)
    fx, cx, cy = cam.fxycxy[0], cam.fxycxy[2], cam.fxycxy[3]
    OPx = in_face[..., 0] - cx
    OPy = in_face[..., 1] - cy
    A = OPx[:, None] * r1 - OPy[:, None] * r0           # (N2,3)
    B = OPx[:, None] * r0 + OPy[:, None] * r1
    a = normals @ A.T                                   # (N1,N2)
    b = normals @ B.T
    nfx = normals @ r0.T
    nfy = normals @ r1.T
    s = jnp.sqrt(nfx * nfx + nfy * nfy)
    eps = 1e-12
    OO1 = jnp.abs(a) / jnp.maximum(s, eps)
    PO1 = jnp.abs(b) / jnp.maximum(s, eps)
    CO1 = jnp.sqrt(OO1 * OO1 + fx * fx)
    tan1 = PO1 / CO1
    tan2 = (PO1 + sigma_px) / CO1
    tan3 = (tan2 - tan1) / (1 + tan1 * tan2)
    return 1.0 / jnp.sqrt(1.0 / jnp.maximum(tan3 * tan3, eps) + 1.0)


def vector_sigma_along_normal(cam: CubemapCamera, uv: jnp.ndarray,
                              normal_rig: jnp.ndarray,
                              sigma_px: float = 1.0) -> jnp.ndarray:
    """Anisotropic angular sigma: pixel noise projected perpendicular to the
    epipolar direction given the epipolar-plane normal in the rig frame
    (GetVectorSigma with normal, CamModelGeneral.cpp:307-333)."""
    face = face_from_cubemap_uv(cam, uv)
    n_cam = rig_to_face(cam, normal_rig, face)
    epi = jnp.stack([n_cam[..., 1], -n_cam[..., 0],
                     jnp.zeros_like(n_cam[..., 0])], axis=-1)
    vert = jnp.stack([n_cam[..., 0], n_cam[..., 1],
                      jnp.zeros_like(n_cam[..., 0])], axis=-1)
    in_face = cubemap_uv_to_in_face(cam, uv)
    fx, cx, cy = cam.fxycxy[0], cam.fxycxy[2], cam.fxycxy[3]
    OP = jnp.stack([in_face[..., 0] - cx, in_face[..., 1] - cy,
                    jnp.zeros_like(in_face[..., 0])], axis=-1)
    eps = 1e-12
    epi_n = jnp.linalg.norm(epi, axis=-1)
    vert_n = jnp.linalg.norm(vert, axis=-1)
    OO1 = jnp.abs(jnp.sum(OP * epi, axis=-1) / jnp.maximum(epi_n, eps))
    CO1 = jnp.sqrt(OO1 * OO1 + fx * fx)
    PO1 = jnp.abs(jnp.sum(OP * vert, axis=-1) / jnp.maximum(vert_n, eps))
    tan1 = PO1 / CO1
    tan2 = (PO1 + sigma_px) / CO1
    tan3 = (tan2 - tan1) / (1 + tan1 * tan2)
    return 1.0 / jnp.sqrt(1.0 / jnp.maximum(tan3 * tan3, eps) + 1.0)
