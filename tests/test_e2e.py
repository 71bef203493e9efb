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
