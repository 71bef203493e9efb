"""Fault injection (SURVEY.md §5): occlusion + outlier corruption.

The reference has no fault-injection harness; the synthetic renderer makes
it cheap. Two faults the tracker must absorb:

* transient OCCLUSION: half the cubemap blanked for a few frames (a person
  walking in front of the camera) — tracking must survive on the remaining
  half or recover via relocalization;
* impulsive NOISE: salt-and-pepper corruption of a band of pixels —
  spurious FAST detections must not break pose estimation (the chi2 gates
  of PoseOptimization are the defense, Optimizer.cpp:139-170).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.runtime.system import CubemapSLAM, TrackState
from cubemapslam_tpu.synth import Renderer, make_world, forward_trajectory
from cubemapslam_tpu.warp import fov_mask


def build(rng, n_frames):
    cfg = SlamConfig(cube_face_w=160, cube_face_h=160, n_features=600,
                     n_levels=3, max_keyframes=32, max_landmarks=8192,
                     min_init_keypoints=80, min_init_matches=60,
                     min_track_inliers=20, fps=5.0)
    slam = CubemapSLAM(cfg)
    mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)
    poses = forward_trajectory(n_frames)
    centers = np.stack([-R.T @ t for R, t in poses])
    pts, patches = make_world(rng, n=1100, centers=centers)
    ren = Renderer(slam.cam, cfg, "cubemap")
    return slam, mask, poses, pts, patches, ren


@pytest.mark.slow
class TestFaultInjection:
    def test_transient_half_occlusion(self, rng):
        slam, mask, poses, pts, patches, ren = build(rng, 16)
        ok_after = 0
        for k, (R, t) in enumerate(poses):
            img = ren.render(pts, patches, R, t)
            if 8 <= k <= 10:   # occluder covers the left half
                img[:, : img.shape[1] // 2] = 20.0
            slam.track_cubemap(jnp.asarray(img), k * 0.1, mask=mask)
            if k > 10 and slam.state == TrackState.OK:
                ok_after += 1
        # survived (tracked through or relocalized after the occlusion)
        assert ok_after >= 3, ok_after
        assert slam.state == TrackState.OK

    def test_impulse_noise_band(self, rng):
        slam, mask, poses, pts, patches, ren = build(rng, 14)
        inl = []
        for k, (R, t) in enumerate(poses):
            img = ren.render(pts, patches, R, t)
            if k >= 6:  # salt-and-pepper band across the middle rows
                H = img.shape[0]
                band = slice(H // 3, H // 3 + 40)
                n_px = int(0.08 * 40 * img.shape[1])
                ys = rng.integers(H // 3, H // 3 + 40, n_px)
                xs = rng.integers(0, img.shape[1], n_px)
                img[ys, xs] = np.where(rng.random(n_px) < 0.5, 0.0, 255.0)
            slam.track_cubemap(jnp.asarray(img), k * 0.1, mask=mask)
            m = slam.metrics[-1] if slam.metrics else {}
            if k >= 6 and "inliers" in m:
                inl.append(m["inliers"])
        assert slam.state == TrackState.OK
        # pose estimation keeps a healthy inlier count despite the noise
        assert np.median(inl) >= slam.cfg.min_track_inliers, inl
