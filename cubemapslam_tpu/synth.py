"""Synthetic world rendering: textured billboards traced into cubemap or
fisheye frames along a known trajectory.

This is the framework's dataset-scale proof harness (the reference validates
by running real datasets end-to-end, Scripts/*.sh + cubemap_lafida.cpp — with
no public blobs in-tree, a ray-traced synthetic world with exact ground truth
serves the same role for tests, the benchmark, and vocabulary training).

A world is a set of billboards: small world-anchored textured planes facing
the origin. Every rendered corner is a true 3D point, so feature tracks are
geometrically consistent across views (stamping fixed-pixel patches would
inject view-dependent bias). Rendering is host-side numpy: per frame, each
billboard is projected, and the pixels of a window around it are ray-plane
intersected + bilinearly textured.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cubemapslam_tpu import camera as C


def _cpu():
    """Rendering is a host-side utility: pin its jax math to the CPU device
    (under the axon TPU tunnel, per-op dispatch + transfers would dominate)."""
    return jax.default_device(jax.local_devices(backend="cpu")[0])

PATCH = 14  # texture patch side length (pixels of the texture map)


def make_world(rng: np.random.Generator, n: int = 500,
               r_lo: float = 2.5, r_hi: float = 6.0,
               centers: Optional[np.ndarray] = None,
               fx: float = 80.0) -> Tuple[np.ndarray, Dict]:
    """Random textured billboards on a shell around the trajectory.

    centers: optional (M,3) trajectory waypoints — billboards are placed on
    shells around randomly chosen waypoints so long trajectories stay inside
    textured surroundings. fx: target face focal length in pixels —
    billboards are sized to span ~PATCH pixels at their initial distance
    (pass cfg.cube_face_w/2 when rendering at non-test resolutions).
    """
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = rng.uniform(r_lo, r_hi, (n, 1))
    pts = (d * r).astype(np.float32)
    if centers is not None:
        anchor = np.asarray(centers)[rng.integers(0, len(centers), n)]
        pts = (pts + anchor).astype(np.float32)
    # blocky high-contrast texture per billboard: ~3px cells give strong,
    # viewpoint-stable FAST corners and repeatable rBRIEF descriptors (the
    # earlier smoothed-blob texture produced weak corners whose descriptors
    # decayed within ~20 degrees of viewpoint change, starving wide-baseline
    # matching and loop detection)
    cells = rng.uniform(15, 240, (n, 5, 5)).astype(np.float32)
    patches = np.repeat(np.repeat(cells, 3, axis=1), 3, axis=2)
    patches = patches[:, :PATCH, :PATCH]
    # shading ramp in a random direction: balanced random texture has a
    # centroid ~at the patch center, making the IC orientation pure noise
    # (measured ~18deg angle jitter frame-to-frame -> rBRIEF bin flips ->
    # Hamming >60 for re-detected corners); a dominant gradient pins it
    gdir = rng.uniform(0.0, 2.0 * np.pi, n).astype(np.float32)
    grid = (np.arange(PATCH, dtype=np.float32) / (PATCH - 1)) - 0.5
    ramp = (1.0 + 0.9 * (np.cos(gdir)[:, None, None] * grid[None, None, :]
                         + np.sin(gdir)[:, None, None]
                         * grid[None, :, None]))
    patches = np.clip(patches * ramp, 0.0, 255.0)
    # world tangent frames + world size (~PATCH px at the initial distance
    # for a fx=80 face)
    nrm = d.astype(np.float32)
    a = np.where(np.abs(nrm[:, 2:3]) < 0.9, np.array([[0, 0, 1.0]]),
                 np.array([[1.0, 0, 0]])).astype(np.float32)
    e1 = np.cross(nrm, a)
    e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e2 = np.cross(nrm, e1)
    # 2.5x the descriptor support: rBRIEF samples a 31px patch, so a
    # billboard must span ~35px at its working distance or most pattern
    # comparisons hit flat background and the descriptor's entropy sits in
    # a few brittle bits (measured: ~60% match loss per 2.6deg viewpoint
    # step at 14px; stable at 35px)
    size = (2.5 * PATCH / fx) * r[:, 0]
    return pts, {"tex": patches, "n": nrm, "e1": e1.astype(np.float32),
                 "e2": e2.astype(np.float32),
                 "size": size.astype(np.float32)}


class Renderer:
    """Renders a world into cubemap-cross or raw fisheye frames.

    Caches the per-pixel ray grid (the expensive part) per target geometry.
    """

    def __init__(self, cam, cfg, target: str = "cubemap"):
        # keep a CPU-resident copy of the camera so projection math never
        # touches the accelerator (host rendering utility). The copy goes
        # through numpy: direct device_put(tpu_array, cpu_device) hangs over
        # the axon tunnel.
        with _cpu():
            self.cam = jax.tree.map(
                lambda x: jnp.asarray(np.asarray(x))
                if isinstance(x, jax.Array) else x, cam)
        self.cfg = cfg
        self.target = target
        if target == "cubemap":
            H, W = cfg.cube_h, cfg.cube_w
            uu, vv = np.meshgrid(np.arange(W, dtype=np.float32),
                                 np.arange(H, dtype=np.float32))
            with _cpu():
                r_, _ = C.cubemap_to_ray(cam, jnp.stack(
                    [jnp.asarray(uu), jnp.asarray(vv)], axis=-1))
            self.rays_img = np.asarray(r_)
            # angular scale for window sizing: face pinhole focal length
            self.fx = float(cam.fxycxy[0])
        elif target == "fisheye":
            H, W = cfg.fisheye_height, cfg.fisheye_width
            uu, vv = np.meshgrid(np.arange(W, dtype=np.float32),
                                 np.arange(H, dtype=np.float32))
            with _cpu():
                r_ = C.img_to_ray(cam, jnp.stack(
                    [jnp.asarray(uu), jnp.asarray(vv)], axis=-1))
            self.rays_img = np.asarray(r_)
            # approx focal scale of the fisheye center (inv-poly at theta=0
            # measures rho'(0) ~ first-order px/rad)
            self.fx = float(abs(np.asarray(cam.poly)[0]) / 1.0) \
                if len(np.asarray(cam.poly)) else 250.0
        else:
            raise ValueError(target)
        self.H, self.W = H, W
        self.bg = 20.0

    def _project(self, pc: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Camera points -> (uv, visible) in the target image."""
        pcj = jnp.asarray(pc, jnp.float32)
        if self.target == "cubemap":
            with _cpu():
                uv, face = C.ray_to_cubemap(self.cam, pcj)
            return np.asarray(uv), np.asarray(face) >= 0
        d = np.linalg.norm(pc, axis=-1)
        cosang = pc[:, 2] / np.maximum(d, 1e-12)
        vis = cosang >= self.cam.cos_fov_th
        with _cpu():
            uv = np.asarray(C.ray_to_img(self.cam, pcj))
        vis &= ((uv[:, 0] >= 0) & (uv[:, 0] < self.W)
                & (uv[:, 1] >= 0) & (uv[:, 1] < self.H))
        return uv, vis

    def render(self, pts: np.ndarray, patches: Dict,
               R: np.ndarray, t: np.ndarray) -> np.ndarray:
        """Ray-trace the billboards into one frame. R,t: world->camera."""
        img = np.full((self.H, self.W), self.bg, np.float32)
        pc = (R @ pts.T).T + t
        uv, vis = self._project(pc)
        tex = patches["tex"]
        n_c = (R @ patches["n"].T).T
        e1_c = (R @ patches["e1"].T).T
        e2_c = (R @ patches["e2"].T).T
        sizes = patches["size"]
        for i in np.where(vis)[0]:
            d_i = float(np.linalg.norm(pc[i]))
            half_px = int(np.ceil(0.75 * sizes[i] / d_i * self.fx)) + 2
            u0, v0 = int(round(uv[i, 0])), int(round(uv[i, 1]))
            x0, x1 = u0 - half_px, u0 + half_px + 1
            y0, y1 = v0 - half_px, v0 + half_px + 1
            if x0 < 0 or y0 < 0 or x1 > self.W or y1 > self.H:
                continue
            rays = self.rays_img[y0:y1, x0:x1]             # (h,w,3)
            denom = rays @ n_c[i]
            denom_safe = np.where(np.abs(denom) > 1e-6, denom, 1e-6)
            lam = (pc[i] @ n_c[i]) / denom_safe
            X = rays * lam[..., None]                      # (h,w,3)
            rel = X - pc[i]
            tu = (rel @ e1_c[i]) / sizes[i] + 0.5
            tv = (rel @ e2_c[i]) / sizes[i] + 0.5
            inside = ((lam > 0) & (denom > 1e-6)
                      & (tu >= 0) & (tu < 1) & (tv >= 0) & (tv < 1))
            px = np.clip(tu * (PATCH - 1), 0, PATCH - 1.001)
            py = np.clip(tv * (PATCH - 1), 0, PATCH - 1.001)
            xi = px.astype(np.int32)
            yi = py.astype(np.int32)
            fxp = px - xi
            fyp = py - yi
            T = tex[i]
            val = (T[yi, xi] * (1 - fxp) * (1 - fyp)
                   + T[yi, np.minimum(xi + 1, PATCH - 1)] * fxp * (1 - fyp)
                   + T[np.minimum(yi + 1, PATCH - 1), xi] * (1 - fxp) * fyp
                   + T[np.minimum(yi + 1, PATCH - 1),
                       np.minimum(xi + 1, PATCH - 1)] * fxp * fyp)
            region = img[y0:y1, x0:x1]
            img[y0:y1, x0:x1] = np.where(inside, np.maximum(region, val),
                                         region)
        return img


# ---------------------------------------------------------------------------
# Trajectories (world->camera pose lists)
# ---------------------------------------------------------------------------

def _pose(R: np.ndarray, t_wc: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    return R, -R @ t_wc.astype(np.float32)


def _yaw(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]],
                    np.float32)


def forward_trajectory(n_frames: int, step: float = 0.12,
                       yaw_rate: float = 0.004) -> List[Tuple[np.ndarray,
                                                              np.ndarray]]:
    """Forward + slight lateral motion with small yaw (short VO tests)."""
    poses = []
    for k in range(n_frames):
        R = _yaw(yaw_rate * k)
        t_wc = np.array([step * k, 0.0, step * 0.5 * k], np.float32)
        poses.append(_pose(R, t_wc))
    return poses


def loop_trajectory(n_frames: int, radius: float = 3.0,
                    n_loops: float = 1.15,
                    bob: float = 0.0,
                    facing: str = "center"
                    ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Closed circuit with a genuine revisit: the camera travels a circle of
    ``radius`` in the x-z plane, covering ``n_loops`` revolutions
    (n_loops > 1 revisits the start with accumulated drift — the
    loop-closure scenario). Ground truth for ATE.

    facing: "center" keeps the optical axis toward the circle's far side
    (fixating orbit); "tangent" points it along the direction of travel —
    the vehicle-loop geometry of the reference's loop2/parkinglot
    sequences (Scripts/runCubemapLoop2*.sh), with translation-dominant
    optical flow."""
    poses = []
    for k in range(n_frames):
        phi = 2.0 * np.pi * n_loops * k / n_frames
        # world position on the circle
        t_wc = np.array([radius * np.sin(phi),
                         bob * np.sin(3.0 * phi),
                         radius * (1.0 - np.cos(phi))], np.float32)
        yaw = phi if facing == "center" else phi - 0.5 * np.pi
        poses.append(_pose(_yaw(yaw), t_wc))
    return poses
