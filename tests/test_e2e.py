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
    """Random 3D points on a shell around the trajectory, each carrying a
    unique random texture patch (unique descriptors — uniform squares are
    4-fold symmetric after orientation steering and fail the ratio test)."""
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = rng.uniform(r_lo, r_hi, (n, 1))
    pts = d * r
    # low-frequency texture (white noise is hypersensitive to resampling
    # phase): random at half resolution, bilinearly upsampled
    half = rng.uniform(30, 255, (n, PATCH // 2, PATCH // 2)).astype(
        np.float32)
    patches = np.repeat(np.repeat(half, 2, axis=1), 2, axis=2)
    patches = (patches
               + np.roll(patches, 1, 1) + np.roll(patches, -1, 1)
               + np.roll(patches, 1, 2) + np.roll(patches, -1, 2)) / 5.0
    return pts.astype(np.float32), patches


def render(cam, cfg, pts, patches, R, t):
    """Project world points and stamp their texture patches with sub-pixel
    bilinear placement."""
    H, W = cfg.cube_h, cfg.cube_w
    img = np.full((H, W), 20.0, np.float32)
    pc = (R @ pts.T).T + t
    uv, face = C.ray_to_cubemap(cam, jnp.asarray(pc, jnp.float32))
    uv = np.asarray(uv)
    face = np.asarray(face)
    s = PATCH
    for i in np.where(face >= 0)[0]:
        u, v = float(uv[i, 0]), float(uv[i, 1])
        x0, y0 = int(np.floor(u)), int(np.floor(v))
        if not (2 <= x0 < W - s - 3 and 2 <= y0 < H - s - 3):
            continue
        fu, fv = u - x0, v - y0
        P = patches[i]
        canvas = np.zeros((s + 1, s + 1), np.float32)
        canvas[:s, :s] += P * (1 - fu) * (1 - fv)
        canvas[:s, 1:] += P * fu * (1 - fv)
        canvas[1:, :s] += P * (1 - fu) * fv
        canvas[1:, 1:] += P * fu * fv
        img[y0:y0 + s + 1, x0:x0 + s + 1] = np.maximum(
            img[y0:y0 + s + 1, x0:x0 + s + 1], canvas)
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
