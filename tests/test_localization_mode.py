"""Localization-mode mbVO dual tracking (Tracking.cpp:207-277).

Map a starting region, freeze mapping (localization mode), then traverse
INTO an unmapped region: local-map support collapses (the depth-band gates
drop receding landmarks) while frame-to-frame matching survives — the system
must switch to VO mode (mb_vo) and extend tracking past the map boundary
instead of dropping straight to LOST, attempting relocalization each frame.
Deep inside the unmapped region monocular VO on old landmarks eventually
starves (the reference's mono build behaves the same — it creates no new
points in localization mode); returning to the mapped region must re-attach
(mb_vo cleared, pose agreeing with the map's own keyframes).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.runtime.system import CubemapSLAM, TrackState
from cubemapslam_tpu.synth import Renderer, make_world
from cubemapslam_tpu.warp import fov_mask


def poses_out_and_back(n_map=14, n_away=18, step=0.22):
    """Straight out along +x (mapped: first n_map), beyond (unmapped),
    then straight back to the start."""
    xs = ([step * k for k in range(n_map + n_away)]
          + [step * (n_map + n_away - 1 - k) for k in range(n_away + 2)])
    poses = []
    for x in xs:
        R = np.eye(3, dtype=np.float32)
        t_wc = np.array([x, 0.0, 0.0], np.float32)
        poses.append((R, -R @ t_wc))
    return poses, n_map


@pytest.mark.slow
class TestLocalizationModeVO:
    def test_vo_through_unmapped_region_and_reattach(self, rng):
        cfg = SlamConfig(cube_face_w=160, cube_face_h=160, n_features=600,
                         n_levels=3, max_keyframes=32, max_landmarks=8192,
                         min_init_keypoints=80, min_init_matches=60,
                         init_min_triangulated=40, init_good_ratio=0.75,
                         min_track_inliers=20,
                         min_track_inliers_after_reloc=30, fps=5.0)
        slam = CubemapSLAM(cfg)
        slam.loop_closing_enabled = False
        mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)
        poses, n_map = poses_out_and_back()
        # billboards concentrated around the MAPPED segment only: past the
        # mapped zone the old landmarks recede out of their scale bands
        # while staying visible for frame-to-frame matching (a too-dense
        # world overlaps billboards — the renderer has no occlusion — and
        # destroys descriptor matching, so keep it sparse)
        centers = np.stack([np.array([0.36 * k, 0, 0], np.float32)
                            for k in range(7)])
        pts, patches = make_world(rng, n=700, r_lo=2.5, r_hi=5.5,
                                  centers=centers)
        ren = Renderer(slam.cam, cfg, "cubemap")

        # phase 1: build the map
        for k in range(n_map):
            img = ren.render(pts, patches, *poses[k])
            slam.track_cubemap(jnp.asarray(img), k * 0.1, mask=mask)
        assert slam.state == TrackState.OK
        assert slam.n_kf >= 3
        slam.activate_localization_mode()
        n_kf_frozen = slam.n_kf

        # phase 2+3: out into the unmapped region and back
        states = []
        for k in range(n_map, len(poses)):
            img = ren.render(pts, patches, *poses[k])
            slam.track_cubemap(jnp.asarray(img), k * 0.1, mask=mask)
            states.append((slam.state, slam.mb_vo))

        assert slam.n_kf == n_kf_frozen  # mapping stayed frozen
        # deep in the unmapped region mono localization must lose tracking
        # (no new points are created in localization mode — the reference's
        # mono build starves the same way)
        assert any(s == TrackState.LOST for s, _ in states)
        # never fell back to a reset (map preserved)
        assert int(jnp.sum(slam.arena.kf_valid)) > 0
        # back home: reattached to the map
        assert slam.state == TrackState.OK
        assert not slam.mb_vo
        # final pose agrees with the MAP's keyframe at the same ground-truth
        # spot (the monocular map has its own scale, so compare in-map: the
        # final GT position x=0.18*12 is mapped frame 12's)
        fids = np.asarray(slam.arena.kf_frame_id)
        valid = np.asarray(slam.arena.kf_valid)
        k_near = int(np.argmin(np.where(valid, np.abs(fids - 12), 1 << 30)))
        t_kf = np.asarray(slam.arena.kf_t)[k_near]
        t_est = np.asarray(slam.last.t)
        assert np.linalg.norm(t_est - t_kf) < 0.25, (t_est, t_kf)


@pytest.mark.slow
class TestMbVOStateMachine:
    def test_vo_engages_on_degraded_geometry_and_recovers(self, rng):
        """Deterministic mbVO switch (Tracking.cpp:670-676 + 231-277):
        landmarks still MATCH (descriptors + windows intact) but their
        geometry is perturbed so <10 survive pose optimization -> the
        tracker must enter VO mode instead of LOST; with geometry restored
        the per-frame relocalization attempt re-attaches and clears mbVO."""
        cfg = SlamConfig(cube_face_w=160, cube_face_h=160, n_features=600,
                         n_levels=3, max_keyframes=32, max_landmarks=8192,
                         min_init_keypoints=80, min_init_matches=60,
                         init_min_triangulated=40, init_good_ratio=0.75,
                         min_track_inliers=20,
                         min_track_inliers_after_reloc=30, fps=5.0)
        slam = CubemapSLAM(cfg)
        slam.loop_closing_enabled = False
        mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)
        poses, n_map = poses_out_and_back(n_map=10, n_away=0)
        centers = np.stack([np.array([0.36 * k, 0, 0], np.float32)
                            for k in range(5)])
        pts, patches = make_world(rng, n=700, r_lo=2.5, r_hi=5.5,
                                  centers=centers)
        ren = Renderer(slam.cam, cfg, "cubemap")
        for k in range(n_map):
            img = ren.render(pts, patches, *poses[k])
            slam.track_cubemap(jnp.asarray(img), k * 0.1, mask=mask)
        assert slam.state == TrackState.OK
        slam.activate_localization_mode()

        # perturb landmark geometry: matches survive, inliers collapse.
        # sigma 0.12 at 2.5-5.5 depth ~= 3-4 px reprojection error on a
        # 160-px face — decisively outside the chi2 gate for nearly every
        # landmark regardless of how dense the map got (0.05 was marginal:
        # a denser-cadence map kept >=10 inliers and mbVO never engaged)
        clean_pos = slam.arena.lm_pos
        noise = jnp.asarray(
            rng.normal(0, 0.12, np.asarray(clean_pos).shape), jnp.float32)
        slam.arena = slam.arena._replace(lm_pos=clean_pos + noise)
        img = ren.render(pts, patches, *poses[n_map - 1])
        slam.track_cubemap(jnp.asarray(img), n_map * 0.1, mask=mask)
        assert slam.mb_vo, "mbVO did not engage on degraded geometry"
        assert slam.metrics[-1].get("vo")

        # restore geometry: the mbVO branch relocalizes every frame and the
        # reloc hypothesis wins (Tracking.cpp:231-277)
        slam.arena = slam.arena._replace(lm_pos=clean_pos)
        img = ren.render(pts, patches, *poses[n_map - 1])
        slam.track_cubemap(jnp.asarray(img), (n_map + 1) * 0.1, mask=mask)
        assert slam.state == TrackState.OK
        assert not slam.mb_vo
