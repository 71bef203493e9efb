"""Solver tests against synthetic scenes with known ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from cubemapslam_tpu import camera as C
from cubemapslam_tpu import geometry as G
from cubemapslam_tpu import solvers as S


def synth_scene(rng, n=200, spread=3.0, depth=5.0):
    pts = rng.uniform(-spread, spread, (n, 3))
    pts[:, 2] += depth
    return pts.astype(np.float32)


def project_scene(cam, pts, R, t):
    """World points -> (rays, uv, valid) in camera (R,t)w->c."""
    pc = (R @ pts.T).T + t
    rays = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    uv, face = C.ray_to_cubemap(cam, jnp.asarray(rays, jnp.float32))
    return (rays.astype(np.float32), np.array(uv),
            np.asarray(face) != C.UNKNOWN_FACE)


class TestTriangulation:
    def test_recovers_points(self, lafida_cam, rng):
        pts = synth_scene(rng, 100)
        R21 = np.asarray(G.so3_exp(jnp.asarray([0.05, -0.1, 0.02])))
        t21 = np.array([0.5, 0.1, -0.2], np.float32)
        rays1 = pts / np.linalg.norm(pts, axis=1, keepdims=True)
        p2 = (R21 @ pts.T).T + t21
        rays2 = p2 / np.linalg.norm(p2, axis=1, keepdims=True)
        X = np.asarray(S.triangulate_rays(
            jnp.asarray(rays1), jnp.asarray(rays2),
            jnp.asarray(R21), jnp.asarray(t21)))
        np.testing.assert_allclose(X, pts, atol=5e-2)


class TestEssential:
    def test_two_view_init(self, lafida_cam, rng):
        pts = synth_scene(rng, 300, spread=4.0, depth=6.0)
        R21 = np.asarray(G.so3_exp(jnp.asarray([0.03, -0.08, 0.01])))
        t21 = np.array([0.8, 0.15, -0.1], np.float32)
        rays1, uv1, v1 = project_scene(lafida_cam, pts, np.eye(3),
                                       np.zeros(3))
        rays2, uv2, v2 = project_scene(lafida_cam, pts, R21, t21)
        valid = v1 & v2
        # 15% outliers: scramble rays2
        n_out = 45
        out_idx = rng.choice(np.where(valid)[0], n_out, replace=False)
        perm = rng.permutation(out_idx)
        rays2[out_idx] = rays2[perm]
        uv2[out_idx] = uv2[perm]

        res = S.initialize_two_view(
            lafida_cam, jax.random.PRNGKey(0),
            jnp.asarray(rays1), jnp.asarray(rays2),
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid))
        assert bool(res.success)
        R_est = np.asarray(res.R21)
        t_est = np.asarray(res.t21)
        # rotation error
        dR = R_est @ R21.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.5
        # translation direction error
        t_dir = t21 / np.linalg.norm(t21)
        cos_t = abs(np.dot(t_est / np.linalg.norm(t_est), t_dir))
        assert cos_t > 0.999
        # triangulated points match scene up to the scale |t|
        good = np.asarray(res.good)
        assert good.sum() > 150
        scale = np.linalg.norm(t21)
        X = np.asarray(res.p3d)[good] * scale
        np.testing.assert_allclose(X, pts[good], atol=0.25)


class TestPnP:
    def test_recovers_pose_with_outliers(self, lafida_cam, rng):
        pts = synth_scene(rng, 150)
        R = np.asarray(G.so3_exp(jnp.asarray([0.2, -0.3, 0.1])))
        t = np.array([0.4, -0.2, 0.6], np.float32)
        rays, uv, valid = project_scene(lafida_cam, pts, R, t)
        # 30% outliers
        n_out = 45
        out_idx = rng.choice(np.where(valid)[0], n_out, replace=False)
        perm = rng.permutation(out_idx)
        rays[out_idx] = rays[perm]
        uv[out_idx] = uv[perm]
        sig2 = np.ones(150, np.float32)
        res = S.pnp_ransac(lafida_cam, jax.random.PRNGKey(1),
                           jnp.asarray(pts), jnp.asarray(rays),
                           jnp.asarray(uv), jnp.asarray(sig2),
                           jnp.asarray(valid), n_iters=200)
        assert bool(res.success)
        dR = np.asarray(res.R) @ R.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.0
        assert np.linalg.norm(np.asarray(res.t) - t) < 0.05
        assert int(res.n_inliers) > 80

    def test_recovers_pose_at_60pct_outliers(self, lafida_cam, rng):
        """The minimal-set-4 + betas_approx_{1,2,3} + Gauss-Newton solver
        (PnPsolver.cpp:678-869; ctor minSet=4 via Tracking.cpp:1035) must
        survive 60% outliers: a clean 4-sample has p=0.4^4=2.6% per
        iteration (>99.9% over 300), where the previous 6-point beta-1
        solver had p=0.4^6=0.4% (~71%) and failed routinely."""
        pts = synth_scene(rng, 150)
        R = np.asarray(G.so3_exp(jnp.asarray([0.15, 0.25, -0.2])))
        t = np.array([-0.3, 0.1, 0.5], np.float32)
        rays, uv, valid = project_scene(lafida_cam, pts, R, t)
        n_out = 90  # 60%
        out_idx = rng.choice(np.where(valid)[0], n_out, replace=False)
        perm = rng.permutation(out_idx)
        rays[out_idx] = rays[perm]
        uv[out_idx] = uv[perm]
        sig2 = np.ones(150, np.float32)
        res = S.pnp_ransac(lafida_cam, jax.random.PRNGKey(3),
                           jnp.asarray(pts), jnp.asarray(rays),
                           jnp.asarray(uv), jnp.asarray(sig2),
                           jnp.asarray(valid), n_iters=300)
        assert bool(res.success)
        dR = np.asarray(res.R) @ R.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.0
        assert np.linalg.norm(np.asarray(res.t) - t) < 0.05
        assert int(res.n_inliers) > 45


class TestSim3:
    def test_recovers_similarity(self, lafida_cam, rng):
        # points seen in two keyframes related by a Sim3
        p2 = synth_scene(rng, 80)
        s_gt = 1.4
        R_gt = np.asarray(G.so3_exp(jnp.asarray([0.1, 0.2, -0.05])))
        t_gt = np.array([0.5, -0.3, 0.2], np.float32)
        p1 = s_gt * (R_gt @ p2.T).T + t_gt
        rays1 = p1 / np.linalg.norm(p1, axis=1, keepdims=True)
        rays2 = p2 / np.linalg.norm(p2, axis=1, keepdims=True)
        uv1 = np.asarray(C.ray_to_cubemap(lafida_cam,
                                          jnp.asarray(rays1))[0])
        uv2 = np.asarray(C.ray_to_cubemap(lafida_cam,
                                          jnp.asarray(rays2))[0])
        valid = (uv1[:, 0] >= 0) & (uv2[:, 0] >= 0)
        # 20% outliers
        out_idx = rng.choice(np.where(valid)[0], 16, replace=False)
        p2b = p2.copy()
        p2b[out_idx] += rng.normal(0, 2.0, (16, 3))
        sig = np.ones(80, np.float32)
        res = S.sim3_ransac(lafida_cam, jax.random.PRNGKey(2),
                            jnp.asarray(p1), jnp.asarray(p2b),
                            jnp.asarray(uv1), jnp.asarray(uv2),
                            jnp.asarray(sig), jnp.asarray(sig),
                            jnp.asarray(valid), n_iters=200,
                            min_inliers=20)
        assert bool(res.success)
        assert abs(float(res.s12) - s_gt) < 0.02
        dR = np.asarray(res.R12) @ R_gt.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.0
        assert np.linalg.norm(np.asarray(res.t12) - t_gt) < 0.05


class TestHorn:
    def test_exact_alignment(self, rng):
        p_from = rng.normal(size=(30, 3)).astype(np.float32)
        R = np.asarray(G.so3_exp(jnp.asarray([0.3, -0.2, 0.5])))
        s, t = 1.7, np.array([1.0, -2.0, 0.5], np.float32)
        p_to = s * (R @ p_from.T).T + t
        s_e, R_e, t_e = S.horn_alignment(jnp.asarray(p_to),
                                         jnp.asarray(p_from))
        assert abs(float(s_e) - s) < 1e-3
        np.testing.assert_allclose(np.asarray(R_e), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t_e), t, atol=1e-3)

    def test_fix_scale(self, rng):
        p_from = rng.normal(size=(30, 3)).astype(np.float32)
        R = np.asarray(G.so3_exp(jnp.asarray([0.3, -0.2, 0.5])))
        t = np.array([1.0, -2.0, 0.5], np.float32)
        p_to = (R @ p_from.T).T + t
        s_e, R_e, t_e = S.horn_alignment(jnp.asarray(p_to),
                                         jnp.asarray(p_from),
                                         fix_scale=True)
        assert float(s_e) == 1.0
        np.testing.assert_allclose(np.asarray(R_e), R, atol=1e-4)
