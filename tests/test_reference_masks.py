"""Smoke tests against the reference's SHIPPED mask artifacts.

The reference ships 7 grayscale mask PNGs (/root/reference/Masks) consumed
by its mains (cubemap_lafida.cpp:109-121). run_sequence's mask path
(apps/run_sequence.py) must load them: a cubemap-sized mask is used
directly, a fisheye-space mask is warped onto the cubemap cross. Skipped
when the reference artifacts are not mounted.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

MASKS = "/root/reference/Masks"

pytestmark = pytest.mark.skipif(not os.path.isdir(MASKS),
                                reason="reference masks not mounted")


def _load_gray(path):
    from cubemapslam_tpu.apps.run_sequence import load_gray
    return load_gray(path)


class TestReferenceMasks:
    def test_lafida_cubemap_mask_650(self, lafida_cam, lafida_cfg):
        """The 650-face Lafida cubemap mask is exactly cubemap-cross sized
        for the default calibration and keeps a live front-face region."""
        from cubemapslam_tpu import warp as W
        m = _load_gray(os.path.join(MASKS,
                                    "gray_lafida_cubemap_mask_650.png"))
        cfg = lafida_cfg
        assert m.shape == (cfg.cube_h, cfg.cube_w), m.shape
        mask = jnp.asarray((m > 0).astype(np.float32))
        mask = mask * W.fov_mask(lafida_cam, cfg.cube_w, cfg.cube_h)
        mask = np.asarray(mask)
        # live pixels exist and are a strict subset of the FOV cone
        fov = np.asarray(W.fov_mask(lafida_cam, cfg.cube_w, cfg.cube_h))
        assert mask.sum() > 0.1 * fov.sum()
        assert mask.sum() <= fov.sum()
        # the center of the front face is live
        cx, cy = cfg.cube_w // 2, cfg.cube_h // 2
        assert mask[cy, cx] > 0

    def test_fisheye_mask_warps_to_cubemap(self, lafida_cam, lafida_cfg):
        """A fisheye-space mask goes through the nearest-neighbor warp the
        way run_sequence's mask path does."""
        from cubemapslam_tpu import warp as W
        m = _load_gray(os.path.join(MASKS, "gray_fisheye_front_mask.png"))
        cfg = lafida_cfg
        assert m.shape != (cfg.cube_h, cfg.cube_w)  # triggers the warp path
        wm = W.build_warp_map(lafida_cam, cfg.cube_w, cfg.cube_h)
        warped = np.asarray(
            (W.warp_nearest(jnp.asarray(m), wm) > 0).astype(np.float32))
        assert warped.shape == (cfg.cube_h, cfg.cube_w)
        assert warped.sum() > 0

    def test_extractor_respects_mask(self, lafida_cam, lafida_cfg, rng):
        """Keypoints extracted with the shipped mask never land on dead
        pixels (the reference culls masked keypoints,
        ORBExtractor.cpp:888-904)."""
        from cubemapslam_tpu import warp as W
        from cubemapslam_tpu.features import build_extractor
        cfg = lafida_cfg
        m = _load_gray(os.path.join(MASKS,
                                    "gray_lafida_cubemap_mask_650.png"))
        mask = jnp.asarray((m > 0).astype(np.float32))
        mask = mask * W.fov_mask(lafida_cam, cfg.cube_w, cfg.cube_h)
        extract, _ = build_extractor(cfg, lafida_cam, 512,
                                     (cfg.cube_h, cfg.cube_w))
        img = jnp.asarray(
            rng.uniform(0, 255, (cfg.cube_h, cfg.cube_w)), jnp.float32)
        kp = extract(img, mask)
        uv = np.asarray(kp.uv)[np.asarray(kp.valid)]
        mk = np.asarray(mask)
        if len(uv):
            vals = mk[np.clip(uv[:, 1].astype(int), 0, cfg.cube_h - 1),
                      np.clip(uv[:, 0].astype(int), 0, cfg.cube_w - 1)]
            assert (vals > 0).all()
