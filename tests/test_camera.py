"""Camera model unit tests: closed-form cases + round trips.

Validates the JAX camera (cubemapslam_tpu/camera.py) against independent numpy
math mirroring the behavior of the reference CamModelGeneral
(include/CamModelGeneral.h:242-374, src/CamModelGeneral.cpp:95-333).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cubemapslam_tpu import camera as C


def np_horner(coeffs, x):
    res = np.zeros_like(x, dtype=np.float64)
    for c in coeffs[::-1]:
        res = res * x + c
    return res


class TestFaceRotations:
    def test_orthonormal(self, lafida_cam):
        R = np.asarray(lafida_cam.face_R)
        for f in range(5):
            np.testing.assert_allclose(R[f] @ R[f].T, np.eye(3), atol=1e-6)
            assert np.linalg.det(R[f]) == pytest.approx(1.0, abs=1e-6)

    def test_roundtrip(self, lafida_cam, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        faces = jnp.asarray(rng.integers(0, 5, size=(100,)), jnp.int32)
        local = C.rig_to_face(lafida_cam, jnp.asarray(pts), faces)
        back = C.face_to_rig(lafida_cam, local, faces)
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)

    def test_reference_values(self, lafida_cam):
        # cvtRigToFaces (CamModelGeneral.h:417-443): LEFT maps rig (x,y,z) to
        # local (z, y, -x); RIGHT to (-z, y, x); UPPER (x,z,-y); LOWER (x,-z,y)
        p = jnp.asarray([1.0, 2.0, 3.0])
        got = {f: np.asarray(C.rig_to_face(lafida_cam, p, jnp.int32(f)))
               for f in [C.FRONT, C.LEFT, C.RIGHT, C.UPPER, C.LOWER]}
        np.testing.assert_allclose(got[C.FRONT], [1, 2, 3])
        np.testing.assert_allclose(got[C.LEFT], [3, 2, -1])
        np.testing.assert_allclose(got[C.RIGHT], [-3, 2, 1])
        np.testing.assert_allclose(got[C.UPPER], [1, 3, -2])
        np.testing.assert_allclose(got[C.LOWER], [1, -3, 2])


class TestFaceSelection:
    def test_axis_rays(self, lafida_cam):
        rays = jnp.asarray([
            [0, 0, 1],    # FRONT
            [-1, 0, 0],   # LEFT
            [1, 0, 0],    # RIGHT
            [0, -1, 0],   # UPPER (y up is negative)
            [0, 1, 0],    # LOWER
            [0, 0, -1],   # behind: UNKNOWN
        ], jnp.float32)
        faces = np.asarray(C.face_from_ray(rays))
        np.testing.assert_array_equal(
            faces, [C.FRONT, C.LEFT, C.RIGHT, C.UPPER, C.LOWER,
                    C.UNKNOWN_FACE])

    def test_cell_lookup(self, lafida_cam):
        W = float(lafida_cam.face_wh[0])
        mid = W / 2
        uv = jnp.asarray([
            [W + mid, W + mid],      # center cell -> FRONT
            [mid, W + mid],          # (0,1) -> LEFT
            [2 * W + mid, W + mid],  # (2,1) -> RIGHT
            [W + mid, mid],          # (1,0) -> UPPER
            [W + mid, 2 * W + mid],  # (1,2) -> LOWER
            [mid, mid],              # corner cell -> UNKNOWN
            [-5.0, mid],             # off-image -> UNKNOWN
        ], jnp.float32)
        faces = np.asarray(C.face_from_cubemap_uv(lafida_cam, uv))
        np.testing.assert_array_equal(
            faces, [C.FRONT, C.LEFT, C.RIGHT, C.UPPER, C.LOWER,
                    C.UNKNOWN_FACE, C.UNKNOWN_FACE])


class TestRayCubemapRoundtrip:
    def test_ray_to_cubemap_to_ray(self, lafida_cam, rng):
        rays = rng.normal(size=(500, 3))
        rays /= np.linalg.norm(rays, axis=1, keepdims=True)
        uv, face = C.ray_to_cubemap(lafida_cam, jnp.asarray(rays, jnp.float32))
        uv, face = np.asarray(uv), np.asarray(face)
        valid = face != C.UNKNOWN_FACE
        assert valid.sum() > 300  # most directions land on the 5-face cross
        rays2, face2 = C.cubemap_to_ray(
            lafida_cam, jnp.asarray(uv[valid], jnp.float32))
        np.testing.assert_array_equal(np.asarray(face2), face[valid])
        np.testing.assert_allclose(np.asarray(rays2), rays[valid], atol=1e-4)

    def test_cross_offsets(self, lafida_cam):
        # Front-axis ray must project into the center cell of the cross.
        uv, face = C.ray_to_cubemap(
            lafida_cam, jnp.asarray([0.0, 0.0, 1.0]))
        W = float(lafida_cam.face_wh[0])
        assert int(face) == C.FRONT
        np.testing.assert_allclose(np.asarray(uv), [W + W / 2, W + W / 2],
                                   atol=1e-3)

    def test_target_face_projection(self, lafida_cam):
        # A point slightly to the right of front-face boundary still projects
        # onto FRONT when forced (TransformRaysToTargetFace cpp:228-263).
        ray = jnp.asarray([1.2, 0.0, 1.0])
        uvf = C.ray_to_target_face(lafida_cam, ray, jnp.int32(C.FRONT))
        W = float(lafida_cam.face_wh[0])
        fx = cx = W / 2
        np.testing.assert_allclose(
            np.asarray(uvf), [1.2 * fx + cx, cx], rtol=1e-5)


class TestFisheyeModel:
    def test_ray_to_img_against_numpy(self, lafida_cam, lafida_cfg, rng):
        rays = rng.normal(size=(200, 3))
        rays[:, 2] = np.abs(rays[:, 2])  # forward hemisphere
        rays /= np.linalg.norm(rays, axis=1, keepdims=True)
        got = np.asarray(C.ray_to_img(lafida_cam, jnp.asarray(rays,
                                                              jnp.float32)))
        # independent numpy model (WorldToImg, CamModelGeneral.h:359-374)
        x, y, z = rays.T
        norm = np.maximum(np.sqrt(x * x + y * y), 1e-14)
        theta = np.arctan(-z / norm)
        rho = np_horner(np.array(lafida_cfg.inv_poly), theta)
        uu, vv = x / norm * rho, y / norm * rho
        c, d, e = (lafida_cfg.affine_c, lafida_cfg.affine_d,
                   lafida_cfg.affine_e)
        exp_u = uu * c + vv * d + lafida_cfg.u0
        exp_v = uu * e + vv + lafida_cfg.v0
        np.testing.assert_allclose(got[:, 0], exp_u, rtol=1e-3, atol=2e-2)
        np.testing.assert_allclose(got[:, 1], exp_v, rtol=1e-3, atol=2e-2)

    def test_img_ray_roundtrip(self, lafida_cam, lafida_cfg, rng):
        # Pixels near the principal point round-trip through the forward and
        # (independently calibrated) inverse polynomials within ~1 px.
        uv = np.stack([
            lafida_cfg.u0 + rng.uniform(-150, 150, 200),
            lafida_cfg.v0 + rng.uniform(-150, 150, 200)], axis=1)
        rays = C.img_to_ray(lafida_cam, jnp.asarray(uv, jnp.float32))
        uv2 = np.asarray(C.ray_to_img(lafida_cam, rays))
        err = np.linalg.norm(uv2 - uv, axis=1)
        assert np.median(err) < 1.0
        assert np.max(err) < 3.0

    def test_fisheye_cubemap_roundtrip(self, lafida_cam, lafida_cfg, rng):
        uv_f = np.stack([
            lafida_cfg.u0 + rng.uniform(-120, 120, 100),
            lafida_cfg.v0 + rng.uniform(-120, 120, 100)], axis=1)
        uv_c, face = C.fisheye_to_cubemap(
            lafida_cam, jnp.asarray(uv_f, jnp.float32))
        valid = np.asarray(face) != C.UNKNOWN_FACE
        assert valid.sum() > 90
        uv_f2, ok = C.cubemap_to_fisheye(lafida_cam, uv_c)
        uv_f2, ok = np.asarray(uv_f2), np.asarray(ok)
        err = np.linalg.norm(uv_f2[valid & ok] - uv_f[valid & ok], axis=1)
        assert np.median(err) < 1.5


class TestVectorSigma:
    def test_center_matches_formula(self, lafida_cam):
        # At the face center r=0 -> sigma = sigma_px / fx
        W = float(lafida_cam.face_wh[0])
        fx = W / 2
        uv = jnp.asarray([W + fx, W + fx])  # front-face center
        sigma = float(C.vector_sigma(lafida_cam, uv))
        assert sigma == pytest.approx(1.0 / fx, rel=1e-5)

    def test_decreases_with_radius(self, lafida_cam):
        W = float(lafida_cam.face_wh[0])
        center = jnp.asarray([W + W / 2, W + W / 2])
        edge = jnp.asarray([W + W - 5.0, W + W / 2])
        assert float(C.vector_sigma(lafida_cam, edge)) < float(
            C.vector_sigma(lafida_cam, center))

    def test_anisotropic_positive(self, lafida_cam, rng):
        W = float(lafida_cam.face_wh[0])
        uv = jnp.asarray(
            np.stack([W + rng.uniform(10, W - 10, 50),
                      W + rng.uniform(10, W - 10, 50)], axis=1), jnp.float32)
        n = rng.normal(size=(50, 3))
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        s = np.asarray(C.vector_sigma_along_normal(
            lafida_cam, uv, jnp.asarray(n, jnp.float32)))
        assert np.all(s > 0)
        assert np.all(s < 0.1)
