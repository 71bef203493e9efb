"""Map save/load round trip + viewer artifact generation."""

import numpy as np
import jax.numpy as jnp
import pytest

from cubemapslam_tpu import serialize
from cubemapslam_tpu.runtime.system import CubemapSLAM, TrackState
from cubemapslam_tpu.viz import Viewer
from cubemapslam_tpu.warp import fov_mask

from cubemapslam_tpu.synth import Renderer, make_world, forward_trajectory
from test_loop import cfg_small


@pytest.mark.slow
class TestSerializeAndViz:
    def test_save_load_localize(self, rng, tmp_path):
        cfg = cfg_small()
        slam = CubemapSLAM(cfg)
        slam.loop_closing_enabled = False
        mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)
        pts, patches = make_world(rng, n=1200)
        poses = forward_trajectory(10)
        ren = Renderer(slam.cam, cfg, "cubemap")
        viewer = Viewer(slam, str(tmp_path / "viz"), every_n=5)
        imgs = []
        for k, (R, t) in enumerate(poses):
            img = ren.render(pts, patches, R, t)
            imgs.append(img)
            slam.track_cubemap(jnp.asarray(img), k * 0.1, mask=mask)
            viewer.tick(img)
        assert slam.state == TrackState.OK
        n_lm_before = int(np.asarray(slam.arena.lm_valid).sum())
        map_path = str(tmp_path / "map.npz")
        serialize.save_map(slam, map_path)

        # fresh system: load map, relocalize against it (the prebuilt-map
        # localization configuration of BASELINE.json)
        slam2 = CubemapSLAM(cfg)
        serialize.load_map(slam2, map_path)
        slam2.activate_localization_mode()
        assert slam2.state == TrackState.LOST
        assert int(np.asarray(slam2.arena.lm_valid).sum()) == n_lm_before
        T = slam2.track_cubemap(jnp.asarray(imgs[6]), 99.0, mask=mask)
        assert slam2.state == TrackState.OK
        assert T is not None
        # localization mode creates no new keyframes
        n_kf = slam2.n_kf
        slam2.track_cubemap(jnp.asarray(imgs[7]), 99.1, mask=mask)
        assert slam2.n_kf == n_kf

        # viewer artifacts exist
        viz_files = list((tmp_path / "viz").iterdir())
        assert any(f.name.startswith("map_") for f in viz_files)
        assert any(f.name.startswith("frame_") for f in viz_files)
        # tracking summary accumulates
        assert viewer.frame_drawer.n_tracked_frames > 5
        assert "avg tracked map points" in viewer.frame_drawer.summary()
