"""Fisheye -> cubemap warping.

TPU-native re-design of the reference warp (System.cpp:276-378): a per-pixel
(u,v) lookup table of size 3H x 3W is precomputed once via the camera model
(CreateUndistortRectifyMap, System.cpp:301-324), then every frame is resampled
by a bilinear gather (CvtFisheyeToCubeMap_reverseQuery_withInterpolation,
System.cpp:327-355; a nearest variant exists at 357-378).

Instead of 5 per-face cv::remap calls, the whole cross is one batched gather:
the precompute step folds the bilinear weights and the 4 source addresses into
flat index/weight tensors so the per-frame work is 4 x take + fma, which XLA
fuses into a single pass over HBM.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cubemapslam_tpu import camera as C
from cubemapslam_tpu.camera import CubemapCamera


class WarpMap(NamedTuple):
    """Precomputed resampling plan for one calibration (static per run)."""

    idx00: jnp.ndarray   # (Hc, Wc) int32 flat index of top-left source texel
    w: jnp.ndarray       # (Hc, Wc, 4) float32 bilinear weights (00,01,10,11)
    valid: jnp.ndarray   # (Hc, Wc) bool — cross cell AND inside fisheye image
    src_wh: jnp.ndarray  # (2,) int32 fisheye [W, H]


def build_warp_map(cam: CubemapCamera, cube_w: int, cube_h: int) -> WarpMap:
    """Precompute the cubemap->fisheye reverse-query map (one-time).

    Mirrors System.cpp:301-324 but emits fused bilinear gather operands.
    """
    ju = jnp.arange(cube_w, dtype=jnp.float32)
    jv = jnp.arange(cube_h, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(ju, jv)  # (Hc, Wc)
    uv = jnp.stack([uu, vv], axis=-1)
    uv_f, valid = C.cubemap_to_fisheye(cam, uv)

    W = cam.fisheye_wh[0].astype(jnp.int32)
    H = cam.fisheye_wh[1].astype(jnp.int32)
    x = uv_f[..., 0]
    y = uv_f[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    idx00 = y0i * W + x0i
    w = jnp.stack(
        [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy], axis=-1)
    w = jnp.where(valid[..., None], w, 0.0)
    return WarpMap(idx00=idx00, w=w.astype(jnp.float32), valid=valid,
                   src_wh=jnp.stack([W, H]))


@jax.jit
def warp_bilinear(fisheye: jnp.ndarray, wm: WarpMap) -> jnp.ndarray:
    """Resample a grayscale fisheye image into the cubemap cross (bilinear).

    fisheye: (H, W) uint8/float; returns (Hc, Wc) float32 with 0 outside the
    cross/image (the reference leaves non-face regions black too).
    """
    flat = fisheye.reshape(-1).astype(jnp.float32)
    W = wm.src_wh[0]
    i00 = wm.idx00
    g00 = jnp.take(flat, i00, axis=0)
    g01 = jnp.take(flat, i00 + 1, axis=0)
    g10 = jnp.take(flat, i00 + W, axis=0)
    g11 = jnp.take(flat, i00 + W + 1, axis=0)
    out = (wm.w[..., 0] * g00 + wm.w[..., 1] * g01
           + wm.w[..., 2] * g10 + wm.w[..., 3] * g11)
    return out


@jax.jit
def warp_nearest(fisheye: jnp.ndarray, wm: WarpMap) -> jnp.ndarray:
    """Nearest-neighbor variant (CvtFisheyeToCubeMap, System.cpp:357-378)."""
    flat = fisheye.reshape(-1).astype(jnp.float32)
    W = wm.src_wh[0]
    # nearest = the corner with the largest bilinear weight
    pick = jnp.argmax(wm.w, axis=-1)
    off_choices = jnp.stack(
        [jnp.zeros((), jnp.int32), jnp.ones((), jnp.int32), W, W + 1])
    out = jnp.take(flat, wm.idx00 + off_choices[pick], axis=0)
    return jnp.where(wm.valid, out, 0.0)


def fov_mask(cam: CubemapCamera, cube_w: int, cube_h: int) -> jnp.ndarray:
    """(Hc,Wc) {0,1} mask of cubemap pixels whose ray lies within the
    fisheye FOV cone (the role of the Masks/*.png cubemap masks +
    ``withFisheyeMask``: regions beyond fov/2 from the optical axis are
    never imaged and must not produce features)."""
    ju = jnp.arange(cube_w, dtype=jnp.float32)
    jv = jnp.arange(cube_h, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(ju, jv)
    ray, face = C.cubemap_to_ray(cam, jnp.stack([uu, vv], axis=-1))
    ok = (face != C.UNKNOWN_FACE) & (ray[..., 2] >= cam.cos_fov_th)
    return ok.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("face_w", "face_h"))
def extract_faces(cube: jnp.ndarray, face_w: int, face_h: int) -> jnp.ndarray:
    """Split the 3Wx3H cross into a (5, face_h, face_w) stack ordered by face
    id (FRONT, LEFT, RIGHT, UPPER, LOWER) for batched per-face processing."""
    fw, fh = face_w, face_h
    front = jax.lax.dynamic_slice(cube, (fh, fw), (fh, fw))
    left = jax.lax.dynamic_slice(cube, (fh, 0), (fh, fw))
    right = jax.lax.dynamic_slice(cube, (fh, 2 * fw), (fh, fw))
    upper = jax.lax.dynamic_slice(cube, (0, fw), (fh, fw))
    lower = jax.lax.dynamic_slice(cube, (2 * fh, fw), (fh, fw))
    return jnp.stack([front, left, right, upper, lower])
