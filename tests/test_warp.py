"""Warp tests: map validity, bilinear correctness on synthetic images."""

import numpy as np
import jax.numpy as jnp

from cubemapslam_tpu import camera as C
from cubemapslam_tpu import warp as W


class TestWarpMap:
    def test_front_face_mostly_valid(self, lafida_cam, lafida_cfg):
        fw, fh = lafida_cfg.cube_face_w, lafida_cfg.cube_face_h
        wm = W.build_warp_map(lafida_cam, 3 * fw, 3 * fh)
        valid = np.asarray(wm.valid)
        # corner cells of the cross are never valid
        assert not valid[:fh, :fw].any()
        assert not valid[2 * fh:, 2 * fw:].any()
        # front face center region maps into the fisheye image
        assert valid[fh + fh // 2 - 50:fh + fh // 2 + 50,
                     fw + fw // 2 - 50:fw + fw // 2 + 50].all()

    def test_bilinear_on_linear_ramp(self, lafida_cam, lafida_cfg):
        # Bilinear resampling of a linear ramp reproduces the warp-map lookup
        # coordinates exactly; validates index/weight packing.
        fw, fh = lafida_cfg.cube_face_w, lafida_cfg.cube_face_h
        wm = W.build_warp_map(lafida_cam, 3 * fw, 3 * fh)
        Wf, Hf = lafida_cfg.fisheye_width, lafida_cfg.fisheye_height
        xs = np.arange(Wf, dtype=np.float32)[None, :].repeat(Hf, 0)
        out = np.asarray(W.warp_bilinear(jnp.asarray(xs), wm))
        # compare against direct lookup coordinates
        uu, vv = np.meshgrid(np.arange(3 * fw, dtype=np.float32),
                             np.arange(3 * fh, dtype=np.float32))
        uv = jnp.stack([jnp.asarray(uu), jnp.asarray(vv)], axis=-1)
        uv_f, valid = C.cubemap_to_fisheye(lafida_cam, uv)
        uv_f, valid = np.asarray(uv_f), np.asarray(valid)
        # interior pixels (away from image border where clipping distorts)
        interior = (valid & (uv_f[..., 0] > 1) & (uv_f[..., 0] < Wf - 2)
                    & (uv_f[..., 1] > 1) & (uv_f[..., 1] < Hf - 2))
        err = np.abs(out[interior] - uv_f[..., 0][interior])
        assert np.max(err) < 1e-2

    def test_nearest_matches_bilinear_on_constant(self, lafida_cam,
                                                  lafida_cfg):
        fw, fh = lafida_cfg.cube_face_w, lafida_cfg.cube_face_h
        wm = W.build_warp_map(lafida_cam, 3 * fw, 3 * fh)
        img = jnp.full((lafida_cfg.fisheye_height, lafida_cfg.fisheye_width),
                       7.0, jnp.float32)
        b = np.asarray(W.warp_bilinear(img, wm))
        n = np.asarray(W.warp_nearest(img, wm))
        valid = np.asarray(wm.valid)
        np.testing.assert_allclose(b[valid], 7.0, atol=1e-4)
        np.testing.assert_allclose(n[valid], 7.0, atol=1e-4)
        np.testing.assert_allclose(b[~valid], 0.0, atol=1e-6)

    def test_extract_faces(self, lafida_cfg):
        fw, fh = 4, 4
        cube = np.zeros((12, 12), np.float32)
        # mark each face cell with its id + 1
        cube[4:8, 4:8] = 1    # FRONT
        cube[4:8, 0:4] = 2    # LEFT
        cube[4:8, 8:12] = 3   # RIGHT
        cube[0:4, 4:8] = 4    # UPPER
        cube[8:12, 4:8] = 5   # LOWER
        faces = np.asarray(W.extract_faces(jnp.asarray(cube), 4, 4))
        for f in range(5):
            assert (faces[f] == f + 1).all()
