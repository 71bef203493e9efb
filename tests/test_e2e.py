"""End-to-end VO test on a rendered synthetic cubemap sequence.

A synthetic world of bright square patches on a surrounding shell is rendered
into cubemap-cross images along a known trajectory; the full pipeline
(extract -> init -> track -> map) must produce a trajectory that Sim3-aligns
to ground truth with small error — the synthetic-scene integration strategy
SURVEY.md §4 prescribes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cubemapslam_tpu import camera as C
from cubemapslam_tpu import geometry as G
from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.runtime.system import CubemapSLAM, TrackState
from cubemapslam_tpu.solvers.horn import horn_alignment
from cubemapslam_tpu.warp import fov_mask


PATCH = 14  # texture patch side length


def make_world(rng, n=500, r_lo=2.5, r_hi=6.0):
    """Random 3D billboards on a shell around the trajectory: each world
    point carries a unique texture on a small world-anchored plane, so every
    rendered corner is a TRUE 3D point (stamping fixed-pixel patches makes
    corner positions view-dependent — the pinhole angular scale varies
    across a cube face — which injects motion-correlated bias)."""
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = rng.uniform(r_lo, r_hi, (n, 1))
    pts = (d * r).astype(np.float32)
    # low-frequency unique texture per billboard
    half = rng.uniform(30, 255, (n, PATCH // 2, PATCH // 2)).astype(
        np.float32)
    patches = np.repeat(np.repeat(half, 2, axis=1), 2, axis=2)
    patches = (patches
               + np.roll(patches, 1, 1) + np.roll(patches, -1, 1)
               + np.roll(patches, 1, 2) + np.roll(patches, -1, 2)) / 5.0
    # world tangent frames + world size (~PATCH px at the initial distance
    # for a fx=80 face)
    nrm = d.astype(np.float32)
    a = np.where(np.abs(nrm[:, 2:3]) < 0.9, np.array([[0, 0, 1.0]]),
                 np.array([[1.0, 0, 0]])).astype(np.float32)
    e1 = np.cross(nrm, a)
    e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e2 = np.cross(nrm, e1)
    size = (PATCH / 80.0) * r[:, 0]
    return pts, {"tex": patches, "n": nrm, "e1": e1.astype(np.float32),
                 "e2": e2.astype(np.float32),
                 "size": size.astype(np.float32)}


def render(cam, cfg, pts, patches, R, t):
    """Ray-trace the billboards into the cubemap cross."""
    H, W = cfg.cube_h, cfg.cube_w
    img = np.full((H, W), 20.0, np.float32)
    pc = (R @ pts.T).T + t
    uv, face = C.ray_to_cubemap(cam, jnp.asarray(pc, jnp.float32))
    uv = np.asarray(uv)
    face = np.asarray(face)
    fx = float(cam.fxycxy[0])
    tex = patches["tex"]
    # rotate billboard frames into the camera frame
    n_c = (R @ patches["n"].T).T
    e1_c = (R @ patches["e1"].T).T
    e2_c = (R @ patches["e2"].T).T
    sizes = patches["size"]
    # precompute per-pixel rays once per (cam geometry); cached on cam id
    global _RAY_CACHE
    try:
        rays_img = _RAY_CACHE[(H, W)]
    except (NameError, KeyError):
        uu, vv = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        r_, f_ = C.cubemap_to_ray(cam, jnp.stack(
            [jnp.asarray(uu), jnp.asarray(vv)], axis=-1))
        rays_img = np.asarray(r_)
        try:
            _RAY_CACHE[(H, W)] = rays_img
        except NameError:
            _RAY_CACHE = {(H, W): rays_img}
    for i in np.where(face >= 0)[0]:
        d_i = float(np.linalg.norm(pc[i]))
        half_px = int(np.ceil(0.75 * sizes[i] / d_i * fx)) + 2
        u0, v0 = int(round(uv[i, 0])), int(round(uv[i, 1]))
        x0, x1 = u0 - half_px, u0 + half_px + 1
        y0, y1 = v0 - half_px, v0 + half_px + 1
        if x0 < 0 or y0 < 0 or x1 > W or y1 > H:
            continue
        rays = rays_img[y0:y1, x0:x1]                  # (h,w,3)
        # intersect ray with the billboard plane (P, n)
        denom = rays @ n_c[i]
        denom_safe = np.where(np.abs(denom) > 1e-6, denom, 1e-6)
        lam = (pc[i] @ n_c[i]) / denom_safe
        X = rays * lam[..., None]                      # (h,w,3)
        rel = X - pc[i]
        tu = (rel @ e1_c[i]) / sizes[i] + 0.5
        tv = (rel @ e2_c[i]) / sizes[i] + 0.5
        inside = ((lam > 0) & (denom > 1e-6)
                  & (tu >= 0) & (tu < 1) & (tv >= 0) & (tv < 1))
        # bilinear texture sample
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


def trajectory_poses(n_frames):
    """Forward + slight lateral motion with small yaw."""
    poses = []
    for k in range(n_frames):
        yaw = 0.004 * k
        R = np.asarray(G.so3_exp(jnp.asarray([0.0, yaw, 0.0],
                                             jnp.float32)))
        t_wc = np.array([0.12 * k, 0.0, 0.06 * k], np.float32)
        # world->cam: R_cw = R, t_cw = -R t_wc
        poses.append((R, -R @ t_wc))
    return poses


@pytest.mark.slow
class TestEndToEnd:
    def test_vo_on_synthetic_sequence(self, rng):
        cfg = SlamConfig(cube_face_w=160, cube_face_h=160, n_features=600,
                         n_levels=3, max_keyframes=24, max_landmarks=4096,
                         min_init_keypoints=80, min_init_matches=60,
                         min_track_inliers=20, fps=5.0)
        slam = CubemapSLAM(cfg)
        mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)
        pts, patches = make_world(rng, n=600)
        poses = trajectory_poses(16)
        est = {}
        for k, (R, t) in enumerate(poses):
            img = render(slam.cam, cfg, pts, patches, R, t)
            T = slam.track_cubemap(jnp.asarray(img), float(k) / 10.0,
                                   mask=mask)
            if T is not None:
                est[k] = T
        assert slam.state == TrackState.OK
        assert len(est) >= 10, f"tracked only {sorted(est)}"
        assert slam.n_kf >= 2

        # Sim3-align estimated camera centers to ground truth
        ks = sorted(est)
        centers_est = np.stack([
            -est[k][:3, :3].T @ est[k][:3, 3] for k in ks])
        centers_gt = np.stack([
            -poses[k][0].T @ poses[k][1] for k in ks])
        s, Ra, ta = horn_alignment(jnp.asarray(centers_gt, jnp.float32),
                                   jnp.asarray(centers_est, jnp.float32))
        aligned = float(s) * (np.asarray(Ra) @ centers_est.T).T + \
            np.asarray(ta)
        ate = np.sqrt(np.mean(np.sum((aligned - centers_gt) ** 2, axis=1)))
        scene = np.linalg.norm(centers_gt[-1] - centers_gt[0])
        assert ate < 0.15 * scene + 0.02, (ate, scene)

    def test_tum_trajectory_output(self, rng, tmp_path):
        cfg = SlamConfig(cube_face_w=160, cube_face_h=160, n_features=600,
                         n_levels=3, max_keyframes=24, max_landmarks=4096,
                         min_init_keypoints=80, min_init_matches=60,
                         min_track_inliers=20, fps=5.0)
        slam = CubemapSLAM(cfg)
        mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)
        pts, patches = make_world(rng, n=600)
        for k, (R, t) in enumerate(trajectory_poses(8)):
            img = render(slam.cam, cfg, pts, patches, R, t)
            slam.track_cubemap(jnp.asarray(img), float(k) / 10.0,
                               mask=mask)
        out = tmp_path / "traj.txt"
        slam.save_keyframe_trajectory_tum(str(out))
        lines = out.read_text().strip().splitlines()
        assert len(lines) == sum(
            np.asarray(slam.arena.kf_valid)[:slam.n_kf])
        for ln in lines:
            vals = [float(x) for x in ln.split()]
            assert len(vals) == 8
            # unit quaternion
            assert abs(np.linalg.norm(vals[4:]) - 1.0) < 1e-3
