"""End-to-end VO test on a rendered synthetic cubemap sequence.

A synthetic world of textured billboards (cubemapslam_tpu/synth.py) is
rendered into cubemap-cross images along a known trajectory; the full
pipeline (extract -> init -> track -> map) must produce a trajectory that
Sim3-aligns to ground truth with small error — the synthetic-scene
integration strategy SURVEY.md §4 prescribes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.runtime.system import CubemapSLAM, TrackState
from cubemapslam_tpu.solvers.horn import horn_alignment
from cubemapslam_tpu.synth import Renderer, make_world, forward_trajectory
from cubemapslam_tpu.warp import fov_mask


def trajectory_poses(n_frames):
    return forward_trajectory(n_frames)


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
        ren = Renderer(slam.cam, cfg, "cubemap")
        poses = trajectory_poses(16)
        est = {}
        for k, (R, t) in enumerate(poses):
            img = ren.render(pts, patches, R, t)
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
        ren = Renderer(slam.cam, cfg, "cubemap")
        for k, (R, t) in enumerate(trajectory_poses(8)):
            img = ren.render(pts, patches, R, t)
            slam.track_cubemap(jnp.asarray(img), float(k) / 10.0,
                               mask=mask)
        out = tmp_path / "traj.txt"
        slam.save_keyframe_trajectory_tum(str(out))
        lines = out.read_text().strip().splitlines()
        # n_kf is a monotonic counter, not a slot bound — count LIVE slots
        assert len(lines) == int(np.asarray(slam.arena.kf_valid).sum())
        for ln in lines:
            vals = [float(x) for x in ln.split()]
            assert len(vals) == 8
            # unit quaternion
            assert abs(np.linalg.norm(vals[4:]) - 1.0) < 1e-3


def _yaw(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def _pitch(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)


def _pose(R, t_wc):
    return R, (-R @ t_wc).astype(np.float32)


def _run_scenario(rng, poses, n_world=1200, **cfg_kw):
    cfg = SlamConfig(cube_face_w=160, cube_face_h=160, n_features=600,
                     n_levels=3, max_keyframes=48, max_landmarks=8192,
                     min_init_keypoints=80, min_init_matches=60,
                     min_track_inliers=20, fps=5.0, **cfg_kw)
    slam = CubemapSLAM(cfg)
    mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)
    centers = np.stack([-R.T @ t for R, t in poses])
    pts, patches = make_world(rng, n=n_world, centers=centers)
    ren = Renderer(slam.cam, cfg, "cubemap")
    est = {}
    for k, (R, t) in enumerate(poses):
        img = ren.render(pts, patches, R, t)
        T = slam.track_cubemap(jnp.asarray(img), k * 0.1, mask=mask)
        if T is not None:
            est[k] = T
    ks = sorted(est)
    ate, span = None, 0.0
    if len(ks) >= 5:
        ce = np.stack([-est[k][:3, :3].T @ est[k][:3, 3] for k in ks])
        cg = np.stack([centers[k] for k in ks])
        s, Ra, ta = horn_alignment(jnp.asarray(cg, jnp.float32),
                                   jnp.asarray(ce, jnp.float32))
        al = float(s) * (np.asarray(Ra) @ ce.T).T + np.asarray(ta)
        ate = float(np.sqrt(np.mean(np.sum((al - cg) ** 2, axis=1))))
        span = float(np.linalg.norm(cg.max(0) - cg.min(0)))
    return slam, est, ate, span


@pytest.mark.slow
class TestHardScenarios:
    """Aggressive-motion e2e cases the 16-frame forward test never hits
    (VERDICT r2: pure rotation, fast motion, cross-face-heavy)."""

    def test_pure_rotation_segment(self, rng):
        """Translate to build a map, then rotate in place: mono SLAM cannot
        triangulate under pure rotation — tracking must survive on the
        existing map."""
        poses = []
        for k in range(8):
            poses.append(_pose(_yaw(0.004 * k),
                               np.array([0.12 * k, 0, 0.06 * k],
                                        np.float32)))
        base = np.array([0.12 * 7, 0, 0.06 * 7], np.float32)
        for k in range(10):
            poses.append(_pose(_yaw(0.004 * 7 + 0.025 * (k + 1)), base))
        slam, est, ate, span = _run_scenario(rng, poses, n_world=900)
        assert slam.state == TrackState.OK
        assert len(est) >= 14, sorted(est)
        assert ate is not None and ate < 0.30, (ate, span)

    def test_fast_motion(self, rng):
        """3x the nominal translation + yaw after a gentle bootstrap."""
        poses, x, yaw = [], np.zeros(3, np.float32), 0.0
        for k in range(16):
            step = 0.10 if k < 8 else (0.15 if k == 8 else 0.20)
            yr = 0.004 if k < 8 else 0.008
            x = x + np.array([step, 0, step * 0.5], np.float32)
            yaw += yr
            poses.append(_pose(_yaw(yaw), x.copy()))
        slam, est, ate, span = _run_scenario(rng, poses, n_world=1600)
        assert slam.state == TrackState.OK
        assert len(est) >= 12, sorted(est)
        # fast motion trades accuracy for robustness: ~2x the drift bound
        # of the nominal-speed e2e
        assert ate is not None and ate < 0.12 * span + 0.02, (ate, span)

    def test_cross_face_heavy(self, rng):
        """Pitched 50 degrees up: scene content lives on the UPPER face and
        migrates across face boundaries while translating."""
        P = _pitch(np.deg2rad(-50.0))
        poses = [_pose(P @ _yaw(0.004 * k),
                       np.array([0.12 * k, 0.0, 0.05 * k], np.float32))
                 for k in range(16)]
        slam, est, ate, span = _run_scenario(rng, poses, n_world=1200)
        assert slam.state == TrackState.OK
        assert len(est) >= 13, sorted(est)
        # faces actually exercised beyond the front face
        faces = np.asarray(slam.arena.kf_face)[np.asarray(
            slam.arena.kf_valid)]
        ok = np.asarray(slam.arena.kf_kp_valid)[np.asarray(
            slam.arena.kf_valid)]
        assert (faces[ok] == 3).sum() + (faces[ok] == 4).sum() > \
            0.3 * ok.sum(), "upper/lower faces not exercised"
        assert ate is not None and ate < 0.08 * span + 0.02, (ate, span)
