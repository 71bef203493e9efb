"""Lie-group ops: round trips, composition laws, quaternion consistency."""

import numpy as np
import jax.numpy as jnp

from cubemapslam_tpu import geometry as G


def rand_rotations(rng, n):
    """Uniform-ish random rotations via QR of Gaussians."""
    A = rng.normal(size=(n, 3, 3))
    Q, R = np.linalg.qr(A)
    det = np.linalg.det(Q)
    Q[:, :, 0] *= det[:, None]
    return Q.astype(np.float32)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        phi = rng.normal(size=(200, 3)).astype(np.float32)
        # keep |phi| < pi for uniqueness
        norms = np.linalg.norm(phi, axis=1, keepdims=True)
        phi = phi / norms * (norms % 3.0)
        R = G.so3_exp(jnp.asarray(phi))
        phi2 = np.asarray(G.so3_log(R))
        np.testing.assert_allclose(phi2, phi, atol=2e-4)

    def test_exp_small_angle(self):
        phi = jnp.asarray([[1e-10, 0, 0], [0.0, 0.0, 0.0]])
        R = np.asarray(G.so3_exp(phi))
        np.testing.assert_allclose(R[1], np.eye(3), atol=1e-7)

    def test_log_near_pi(self, rng):
        axis = rng.normal(size=(50, 3))
        axis /= np.linalg.norm(axis, axis=1, keepdims=True)
        phi = axis * (np.pi - 1e-4)
        R = G.so3_exp(jnp.asarray(phi, jnp.float32))
        phi2 = np.asarray(G.so3_log(R))
        # log may return the antipodal representation; compare rotations
        R2 = np.asarray(G.so3_exp(jnp.asarray(phi2)))
        np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)

    def test_orthonormality(self, rng):
        phi = rng.normal(size=(100, 3)).astype(np.float32)
        R = np.asarray(G.so3_exp(jnp.asarray(phi)))
        np.testing.assert_allclose(
            R @ np.swapaxes(R, 1, 2), np.tile(np.eye(3), (100, 1, 1)),
            atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(100, 6)).astype(np.float32)
        xi[:, 3:] *= 0.8
        R, t = G.se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(G.se3_log(R, t))
        np.testing.assert_allclose(xi2, xi, atol=1e-3)

    def test_compose_inverse(self, rng):
        xi = rng.normal(size=(50, 6)).astype(np.float32)
        R, t = G.se3_exp(jnp.asarray(xi))
        Ri, ti = G.se3_inverse(R, t)
        Rc, tc = G.se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(np.asarray(Rc),
                                   np.tile(np.eye(3), (50, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-5)

    def test_apply(self, rng):
        xi = rng.normal(size=(6,)).astype(np.float32)
        R, t = G.se3_exp(jnp.asarray(xi))
        x = rng.normal(size=(10, 3)).astype(np.float32)
        y = np.asarray(G.se3_apply(R, t, jnp.asarray(x)))
        exp = (np.asarray(R) @ x.T).T + np.asarray(t)
        np.testing.assert_allclose(y, exp, atol=1e-5)


class TestQuaternions:
    def test_rot_quat_roundtrip(self, rng):
        R = rand_rotations(rng, 200)
        q = G.rot_to_quat(jnp.asarray(R))
        R2 = np.asarray(G.quat_to_rot(q))
        np.testing.assert_allclose(R2, R, atol=1e-4)

    def test_unit_norm(self, rng):
        R = rand_rotations(rng, 100)
        q = np.asarray(G.rot_to_quat(jnp.asarray(R)))
        np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(100, 7)).astype(np.float32)
        xi[:, 3:6] *= 0.8
        xi[:, 6] *= 0.3
        s, R, t = G.sim3_exp(jnp.asarray(xi))
        xi2 = np.asarray(G.sim3_log(s, R, t))
        np.testing.assert_allclose(xi2, xi, atol=2e-3)

    def test_identity(self):
        s, R, t = G.sim3_exp(jnp.zeros(7))
        assert float(s) == 1.0
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-6)

    def test_compose_inverse(self, rng):
        xi = rng.normal(size=(30, 7)).astype(np.float32) * 0.5
        s, R, t = G.sim3_exp(jnp.asarray(xi))
        si, Ri, ti = G.sim3_inverse(s, R, t)
        sc, Rc, tc = G.sim3_compose(s, R, t, si, Ri, ti)
        np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(Rc),
                                   np.tile(np.eye(3), (30, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-4)

    def test_apply_matches_composition(self, rng):
        xi1 = rng.normal(size=(7,)).astype(np.float32) * 0.5
        xi2 = rng.normal(size=(7,)).astype(np.float32) * 0.5
        g1 = G.sim3_exp(jnp.asarray(xi1))
        g2 = G.sim3_exp(jnp.asarray(xi2))
        x = rng.normal(size=(20, 3)).astype(np.float32)
        y1 = G.sim3_apply(*g1, G.sim3_apply(*g2, jnp.asarray(x)))
        g12 = G.sim3_compose(*g1, *g2)
        y2 = G.sim3_apply(*g12, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)
