"""ORB extractor tests on synthetic images."""

import numpy as np
import jax.numpy as jnp

from cubemapslam_tpu import camera as C
from cubemapslam_tpu.features import build_extractor, extractor as E


def synth_cross_image(cfg, rng, n_squares=40):
    """Random bright squares scattered over the cubemap cross faces."""
    H, W = cfg.cube_h, cfg.cube_w
    fw, fh = cfg.cube_face_w, cfg.cube_face_h
    img = np.zeros((H, W), np.float32)
    # valid cross cells: (cx, cy) offsets in face units
    cells = [(1, 1), (0, 1), (2, 1), (1, 0), (1, 2)]
    for _ in range(n_squares):
        cx, cy = cells[rng.integers(0, 5)]
        x = cx * fw + rng.integers(25, fw - 40)
        y = cy * fh + rng.integers(25, fh - 40)
        sz = int(rng.integers(8, 16))
        img[y:y + sz, x:x + sz] = 200.0
    return img


class TestFastBitTrick:
    def test_disk_has_corners_square_center_not(self, rng):
        img = np.full((64, 64), 30.0, np.float32)
        img[20:44, 20:44] = 220.0
        corner, score = E._fast_maps(jnp.asarray(img), 20)
        corner = np.asarray(corner)
        # interior of the square: circle is uniform -> no corner
        assert not corner[28:36, 28:36].any()
        # the 4 square corners are FAST corners
        assert corner[20:23, 20:23].any() or corner[20:23, 41:44].any()

    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 128.0)
        corner, _ = E._fast_maps(img, 7)
        assert not np.asarray(corner).any()


class TestExtractor:
    def test_finds_square_corners(self, small_cfg, small_cam, rng):
        img = synth_cross_image(small_cfg, rng)
        run, params = build_extractor(small_cfg, small_cam,
                                      small_cfg.n_features,
                                      img.shape)
        kp = run(jnp.asarray(img))
        valid = np.asarray(kp.valid)
        assert valid.sum() > 30
        uv = np.asarray(kp.uv)[valid]
        # every detected keypoint sits on/near an intensity edge: check local
        # variance of a 7px window is non-trivial
        for u, v in uv[:50]:
            win = img[max(0, int(v) - 4):int(v) + 5,
                      max(0, int(u) - 4):int(u) + 5]
            assert win.std() > 1.0, (u, v)

    def test_faces_assigned_and_on_cross(self, small_cfg, small_cam, rng):
        img = synth_cross_image(small_cfg, rng)
        run, _ = build_extractor(small_cfg, small_cam, small_cfg.n_features,
                                 img.shape)
        kp = run(jnp.asarray(img))
        valid = np.asarray(kp.valid)
        faces = np.asarray(kp.face)
        assert (faces[valid] >= 0).all() and (faces[valid] <= 4).all()
        # rays are unit-norm for valid keypoints
        rays = np.asarray(kp.rays)[valid]
        np.testing.assert_allclose(np.linalg.norm(rays, axis=1), 1.0,
                                   atol=1e-4)

    def test_deterministic(self, small_cfg, small_cam, rng):
        img = synth_cross_image(small_cfg, rng)
        run, _ = build_extractor(small_cfg, small_cam, 128, img.shape)
        kp1 = run(jnp.asarray(img))
        kp2 = run(jnp.asarray(img))
        np.testing.assert_array_equal(np.asarray(kp1.desc),
                                      np.asarray(kp2.desc))
        np.testing.assert_array_equal(np.asarray(kp1.uv), np.asarray(kp2.uv))

    def test_descriptor_noise_robustness(self, small_cfg, small_cam, rng):
        img = synth_cross_image(small_cfg, rng)
        run, _ = build_extractor(small_cfg, small_cam, 128, img.shape)
        kp1 = run(jnp.asarray(img))
        noisy = img + rng.normal(0, 2.0, img.shape).astype(np.float32)
        kp2 = run(jnp.asarray(noisy))
        v1 = np.asarray(kp1.valid)
        v2 = np.asarray(kp2.valid)
        # match by nearest position (selection ORDER may reshuffle under
        # noise when corner strengths tie; 1px radius allows the +-0.5px
        # quadratic subpixel refinement to move under noise)
        uv1 = np.asarray(kp1.uv)[v1]
        uv2 = np.asarray(kp2.uv)[v2]
        dmat = np.linalg.norm(uv1[:, None] - uv2[None, :], axis=-1)
        j = dmat.argmin(axis=1)
        ok = dmat[np.arange(len(uv1)), j] < 1.0
        assert ok.sum() > 10
        d1 = np.asarray(kp1.desc)[v1][ok]
        d2 = np.asarray(kp2.desc)[v2][j[ok]]
        ham = np.array([bin(int(a ^ b)).count("1")
                        for row1, row2 in zip(d1, d2)
                        for a, b in zip(row1, row2)]).reshape(-1, 8).sum(1)
        assert np.median(ham) < 40  # of 256 bits

    def test_mask_culling(self, small_cfg, small_cam, rng):
        img = synth_cross_image(small_cfg, rng)
        run, _ = build_extractor(small_cfg, small_cam, 128, img.shape)
        mask = np.ones_like(img)
        mask[:, :img.shape[1] // 2] = 0  # kill left half
        kp = run(jnp.asarray(img), jnp.asarray(mask))
        valid = np.asarray(kp.valid)
        uv = np.asarray(kp.uv)
        assert (uv[valid, 0] >= img.shape[1] // 2 - 1).all()

    def test_level_budgets(self, small_cfg, small_cam):
        params = E.plan_levels(256, 4, 1.2, (384, 384))
        assert sum(params.level_k) == params.n_features
        assert params.level_k[0] > params.level_k[-1]
        assert len(params.level_hw) == 4
        assert params.level_hw[1][0] == round(384 / 1.2)
