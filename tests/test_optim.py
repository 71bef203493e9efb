"""Optimizer tests: analytic Jacobians vs autodiff, convergence on synthetic
scenes with noise/outliers."""

import numpy as np
import jax
import jax.numpy as jnp

from cubemapslam_tpu import camera as C
from cubemapslam_tpu import geometry as G
from cubemapslam_tpu import optim as O
from cubemapslam_tpu.optim.ba import BAProblem, bundle_adjust


def scene_and_obs(cam, rng, n=150, depth=5.0):
    pts = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    pts[:, 2] += depth
    return pts


def observe(cam, pts, R, t):
    pc = (R @ pts.T).T + t
    uv, face = C.ray_to_cubemap(cam, jnp.asarray(pc, jnp.float32))
    uv_face = C.cubemap_uv_to_in_face(cam, uv)
    return np.array(uv_face), np.asarray(face)


class TestJacobians:
    def test_analytic_matches_autodiff(self, lafida_cam, rng):
        R, t = G.se3_exp(jnp.asarray(rng.normal(size=6) * 0.3,
                                     jnp.float32))
        Xw = jnp.asarray(rng.uniform(-2, 2, (20, 3)) + [0, 0, 4],
                         jnp.float32)
        pc = np.asarray(G.se3_apply(R, t, Xw))
        faces = np.asarray(C.face_from_ray(jnp.asarray(pc)))
        assert (faces >= 0).all()
        face = jnp.asarray(faces)
        uv = jnp.zeros((20, 2))
        J_pose, J_point = O.reproj_jacobians(lafida_cam, R, t, Xw, face)

        def res_xi(xi, i):
            dR, dt = G.se3_exp(xi)
            R2, t2 = G.se3_compose(dR, dt, R, t)
            return O.reproj_residual(lafida_cam, R2, t2, Xw[i], face[i],
                                     uv[i])

        def res_X(X, i):
            return O.reproj_residual(lafida_cam, R, t, X, face[i], uv[i])

        for i in [0, 5, 13]:
            Ja = jax.jacfwd(res_xi)(jnp.zeros(6), i)
            np.testing.assert_allclose(np.asarray(J_pose[i]),
                                       np.asarray(Ja), atol=1e-2, rtol=1e-3)
            Jx = jax.jacfwd(res_X)(Xw[i], i)
            np.testing.assert_allclose(np.asarray(J_point[i]),
                                       np.asarray(Jx), atol=1e-2, rtol=1e-3)

    def test_cached_state_jacobian_matches(self, lafida_cam, rng):
        """pose_jac_from_state (the LM-loop fast path with cached
        eval_point state) must agree with reproj_jacobians."""
        R, t = G.se3_exp(jnp.asarray(rng.normal(size=6) * 0.3, jnp.float32))
        Xw = jnp.asarray(rng.uniform(-2, 2, (20, 3)) + [0, 0, 4],
                         jnp.float32)
        pc = np.asarray(G.se3_apply(R, t, Xw))
        face = jnp.asarray(np.asarray(C.face_from_ray(jnp.asarray(pc))))
        uv = jnp.zeros((20, 2))
        R_face = lafida_cam.face_R[jnp.clip(face, 0, 4)]
        e, Xc, local = O.eval_point(lafida_cam, R, t, Xw, R_face, uv)
        e_ref = O.reproj_residual(lafida_cam, R, t, Xw, face, uv)
        np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref),
                                   atol=1e-4)
        Js = O.pose_jac_from_state(lafida_cam, Xc, local, R_face)
        J_pose, _ = O.reproj_jacobians(lafida_cam, R, t, Xw, face)
        np.testing.assert_allclose(np.asarray(Js), np.asarray(J_pose),
                                   atol=1e-4, rtol=1e-5)


class TestPoseOptimization:
    def test_converges_from_perturbed_pose(self, lafida_cam, rng):
        pts = scene_and_obs(lafida_cam, rng)
        R_gt = np.asarray(G.so3_exp(jnp.asarray([0.1, -0.2, 0.05])))
        t_gt = np.array([0.3, -0.1, 0.4], np.float32)
        uv_face, face = observe(lafida_cam, pts, R_gt, t_gt)
        valid = face >= 0
        # add 1px noise and 15 outliers
        uv_face += rng.normal(0, 0.5, uv_face.shape)
        out = rng.choice(np.where(valid)[0], 15, replace=False)
        uv_face[out] += rng.uniform(30, 80, (15, 2))
        # start from a perturbed pose
        dR, dt = G.se3_exp(jnp.asarray(rng.normal(size=6) * 0.03,
                                       jnp.float32))
        R0, t0 = G.se3_compose(dR, dt, jnp.asarray(R_gt),
                               jnp.asarray(t_gt))
        R, t, inl, n = O.pose_optimization(
            lafida_cam, R0, t0, jnp.asarray(pts), jnp.asarray(face),
            jnp.asarray(uv_face, jnp.float32),
            jnp.ones(len(pts), jnp.float32), jnp.asarray(valid))
        dRe = np.asarray(R) @ R_gt.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dRe) - 1) / 2, -1, 1)))
        assert ang < 0.2
        assert np.linalg.norm(np.asarray(t) - t_gt) < 0.02
        # outliers detected
        inl = np.asarray(inl)
        assert (~inl[out]).mean() > 0.8
        assert int(n) > 100


class TestBundleAdjust:
    def test_refines_noisy_map(self, lafida_cam, rng):
        n_pts, n_cams = 120, 6
        pts_gt = scene_and_obs(lafida_cam, rng, n_pts, depth=6.0)
        poses = []
        for k in range(n_cams):
            R = np.asarray(G.so3_exp(jnp.asarray(
                rng.normal(size=3) * 0.05, jnp.float32)))
            t = np.array([0.4 * k, 0, 0], np.float32) + rng.normal(
                0, 0.02, 3).astype(np.float32)
            poses.append((R, t))
        obs_cam, obs_pt, obs_face, obs_uv = [], [], [], []
        for ci, (R, t) in enumerate(poses):
            uv_face, face = observe(lafida_cam, pts_gt, R, t)
            ok = face >= 0
            for pi in np.where(ok)[0]:
                obs_cam.append(ci)
                obs_pt.append(pi)
                obs_face.append(face[pi])
                obs_uv.append(uv_face[pi] + rng.normal(0, 0.3, 2))
        E = len(obs_cam)
        # perturb initial geometry
        R0 = np.stack([p[0] for p in poses])
        t0 = np.stack([p[1] for p in poses])
        R_n, t_n = [], []
        for k in range(n_cams):
            if k == 0:
                R_n.append(R0[k]); t_n.append(t0[k])
            else:
                dR, dt = G.se3_exp(jnp.asarray(
                    rng.normal(size=6) * 0.01, jnp.float32))
                Rk, tk = G.se3_compose(dR, dt, jnp.asarray(R0[k]),
                                       jnp.asarray(t0[k]))
                R_n.append(np.asarray(Rk)); t_n.append(np.asarray(tk))
        X0 = pts_gt + rng.normal(0, 0.05, pts_gt.shape).astype(np.float32)

        prob = BAProblem(
            R=jnp.asarray(np.stack(R_n)), t=jnp.asarray(np.stack(t_n)),
            cam_fixed=jnp.asarray([True] + [False] * (n_cams - 1)),
            cam_valid=jnp.ones(n_cams, bool),
            X=jnp.asarray(X0), pt_valid=jnp.ones(n_pts, bool),
            obs_cam=jnp.asarray(obs_cam, jnp.int32),
            obs_pt=jnp.asarray(obs_pt, jnp.int32),
            obs_face=jnp.asarray(obs_face, jnp.int32),
            obs_uv=jnp.asarray(np.array(obs_uv), jnp.float32),
            obs_inv_sigma2=jnp.ones(E, jnp.float32),
            obs_valid=jnp.ones(E, bool))
        out, inl = bundle_adjust(lafida_cam, prob)
        # poses recovered
        for k in range(n_cams):
            dRe = np.asarray(out.R[k]) @ R0[k].T
            ang = np.degrees(np.arccos(np.clip((np.trace(dRe) - 1) / 2,
                                               -1, 1)))
            assert ang < 0.15, k
            assert np.linalg.norm(np.asarray(out.t[k]) - t0[k]) < 0.02, k
        # points recovered well below the init perturbation
        err = np.linalg.norm(np.asarray(out.X) - pts_gt, axis=1)
        assert np.median(err) < 0.02
        assert np.asarray(inl).mean() > 0.9


class TestPoseGraph:
    def test_closes_loop_drift(self, rng):
        # a ring of 12 poses with accumulated drift; loop edge corrects it
        M = 12
        s_gt = np.ones(M, np.float32)
        R_gt, t_gt = [], []
        for k in range(M):
            ang = 2 * np.pi * k / M
            R_gt.append(np.asarray(G.so3_exp(jnp.asarray(
                [0, ang, 0], jnp.float32))))
            t_gt.append(np.array([np.cos(ang), 0, np.sin(ang)],
                                 np.float32))
        R_gt = np.stack(R_gt); t_gt = np.stack(t_gt)
        # drifted estimates: noise grows along the chain
        R_e, t_e, s_e = [R_gt[0]], [t_gt[0]], [1.0]
        for k in range(1, M):
            dR = np.asarray(G.so3_exp(jnp.asarray(
                rng.normal(size=3) * 0.02 * k / M, jnp.float32)))
            R_e.append(dR @ R_gt[k])
            t_e.append(t_gt[k] + rng.normal(0, 0.05 * k / M, 3))
            s_e.append(1.0 + rng.normal(0, 0.01 * k / M))
        R_e = np.stack(R_e).astype(np.float32)
        t_e = np.stack(t_e).astype(np.float32)
        s_e = np.asarray(s_e, np.float32)
        # edges: consecutive (measurements from GROUND TRUTH = drift-free
        # odometry), plus the loop edge 11->0
        ei, ej, ms, mR, mt = [], [], [], [], []
        for k in range(M):
            j = (k + 1) % M
            ei.append(k); ej.append(j)
            # S_ji = S_j * S_i^-1 from ground truth
            Sji = G.sim3_compose(
                jnp.asarray(1.0), jnp.asarray(R_gt[j]), jnp.asarray(t_gt[j]),
                *G.sim3_inverse(jnp.asarray(1.0), jnp.asarray(R_gt[k]),
                                jnp.asarray(t_gt[k])))
            # measurement convention: e = log(meas * S_i * S_j^-1) -> meas
            # must equal S_j S_i^-1 ... e = log(Sji * Si * Sj^-1) = 0. ok
            ms.append(float(Sji[0])); mR.append(np.asarray(Sji[1]))
            mt.append(np.asarray(Sji[2]))
        s_o, R_o, t_o = O.optimize_essential_graph(
            jnp.asarray(s_e), jnp.asarray(R_e), jnp.asarray(t_e),
            jnp.ones(M, bool),
            jnp.asarray([True] + [False] * (M - 1)),
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(ms, jnp.float32), jnp.asarray(np.stack(mR)),
            jnp.asarray(np.stack(mt)), jnp.ones(M, bool), n_iters=15)
        t_o = np.asarray(t_o)
        # drift reduced: last pose error much smaller than before
        err_before = np.linalg.norm(t_e - t_gt, axis=1).max()
        err_after = np.linalg.norm(t_o - t_gt, axis=1).max()
        assert err_after < 0.25 * err_before + 1e-4
        s_o = np.asarray(s_o)
        np.testing.assert_allclose(s_o, 1.0, atol=0.02)


class TestOptimizeSim3:
    def test_refines_noisy_sim3(self, lafida_cam, rng):
        n = 60
        p2 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        p2[:, 2] += 5
        s_gt, R_gt = 1.3, np.asarray(G.so3_exp(jnp.asarray(
            [0.05, 0.1, -0.02])))
        t_gt = np.array([0.2, -0.1, 0.15], np.float32)
        p1 = s_gt * (R_gt @ p2.T).T + t_gt
        uv1, f1 = observe(lafida_cam, p1, np.eye(3, dtype=np.float32),
                          np.zeros(3, np.float32))
        uv2, f2 = observe(lafida_cam, p2, np.eye(3, dtype=np.float32),
                          np.zeros(3, np.float32))
        valid = (f1 >= 0) & (f2 >= 0)
        # perturbed start
        ds, dR, dt = G.sim3_exp(jnp.asarray(
            rng.normal(size=7) * 0.02, jnp.float32))
        s0, R0, t0 = G.sim3_compose(ds, dR, dt, jnp.asarray(s_gt),
                                    jnp.asarray(R_gt), jnp.asarray(t_gt))
        ones = jnp.ones(n, jnp.float32)
        s, R, t, inl, n_inl = O.optimize_sim3(
            lafida_cam, s0, R0, t0, jnp.asarray(p1), jnp.asarray(p2),
            jnp.asarray(uv1, jnp.float32), jnp.asarray(f1),
            jnp.asarray(uv2, jnp.float32), jnp.asarray(f2),
            ones, ones, jnp.asarray(valid))
        assert abs(float(s) - s_gt) < 1e-3
        dRe = np.asarray(R) @ R_gt.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dRe) - 1) / 2, -1, 1)))
        assert ang < 0.1
        assert int(n_inl) > 0.9 * valid.sum()
