"""Relocalization (full pipeline) and loop-closure (constructed-map) tests."""

import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cubemapslam_tpu import camera as C
from cubemapslam_tpu import geometry as G
from cubemapslam_tpu import place as PL
from cubemapslam_tpu import slam_map as SM
from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.runtime.loop_closing import LoopCloser
from cubemapslam_tpu.runtime.mapping import MappingKernels
from cubemapslam_tpu.runtime.system import CubemapSLAM, TrackState
from cubemapslam_tpu.warp import fov_mask

from cubemapslam_tpu.synth import Renderer, make_world


def cfg_small():
    return SlamConfig(cube_face_w=160, cube_face_h=160, n_features=600,
                      n_levels=3, max_keyframes=64, max_landmarks=8192,
                      min_init_keypoints=80, min_init_matches=60,
                      init_min_triangulated=40, init_good_ratio=0.75,
                      min_track_inliers=20,
                      min_track_inliers_after_reloc=30, fps=5.0)


@pytest.mark.slow
class TestRelocalization:
    def test_relocalizes_after_blackout(self, rng):
        cfg = cfg_small()
        slam = CubemapSLAM(cfg)
        slam.loop_closing_enabled = False
        mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)
        pts, patches = make_world(rng, n=1200)
        ren = Renderer(slam.cam, cfg, "cubemap")
        poses = []
        for k in range(10):
            R = np.asarray(G.so3_exp(jnp.asarray([0.0, 0.004 * k, 0.0],
                                                 jnp.float32)))
            t_wc = np.array([0.12 * k, 0.0, 0.06 * k], np.float32)
            poses.append((R, -R @ t_wc))
        est = {}
        for k, (R, t) in enumerate(poses):
            img = ren.render(pts, patches, R, t)
            T = slam.track_cubemap(jnp.asarray(img), k * 0.1, mask=mask)
            if T is not None:
                est[k] = T
        assert slam.state == TrackState.OK
        assert slam.n_kf > 5
        assert 6 in est
        # blackout -> LOST (no reset since n_kf > 5)
        black = np.full((cfg.cube_h, cfg.cube_w), 20.0, np.float32)
        for k in range(2):
            slam.track_cubemap(jnp.asarray(black), 1.0 + k * 0.1,
                               mask=mask)
        assert slam.state == TrackState.LOST
        # replay a known view -> relocalization
        img = ren.render(pts, patches, *poses[6])
        T = slam.track_cubemap(jnp.asarray(img), 2.0, mask=mask)
        assert slam.state == TrackState.OK
        assert T is not None
        # pose close to the CURRENT map's keyframe nearest frame 6
        t_est = np.asarray(slam.last.t)
        fids = np.asarray(slam.arena.kf_frame_id)[:slam.n_kf]
        valid = np.asarray(slam.arena.kf_valid)[:slam.n_kf]
        k_near = int(np.argmin(np.where(valid, np.abs(fids - 6), 1e9)))
        t_kf = np.asarray(slam.arena.kf_t)[k_near]
        assert np.linalg.norm(t_est - t_kf) < 0.2, (t_est, t_kf)


def gt_pose(j):
    """Pose j of the revisited path segment."""
    ang = 0.06 * j
    R = np.asarray(G.so3_exp(jnp.asarray([0, ang, 0], jnp.float32)))
    t_wc = np.array([0.1 * j, 0, 0.05 * j], np.float32)
    return R.astype(np.float32), (-R @ t_wc).astype(np.float32)


def build_drifted_loop_arena(cfg, cam, rng):
    """Construct the exact state CorrectLoop faces: segment A (KFs 0-5) maps
    the scene at ground truth; after connector KFs 6-9, segment B (KFs
    10-13) REVISITS the same viewpoints but its whole web — duplicate
    landmark copies + poses — sits in a Sim3-drifted frame D (x' = s R_d x
    + t_d). Projections stay exact because a Sim3-scaled camera point has
    the same direction: the stored SE3 pose is (R_gt R_dᵀ,
    s t_gt - R_gt R_dᵀ t_d)."""
    n_pts = 500
    d = rng.normal(size=(n_pts, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    W = (d * rng.uniform(3, 7, (n_pts, 1))).astype(np.float32)
    desc = rng.integers(0, 2 ** 32, (n_pts, 8), dtype=np.uint32)

    s_d = 1.06
    R_d = np.asarray(G.so3_exp(jnp.asarray([0.0, 0.03, 0.01],
                                           jnp.float32)))
    t_d = np.array([0.15, -0.05, 0.1], np.float32)

    arena = SM.make_arena(cfg.max_keyframes, cfg.n_features,
                          cfg.max_landmarks)
    N = cfg.n_features
    lm_slot = 0
    lm_of = {}
    for i in range(14):
        seg_b = i >= 10
        if 6 <= i <= 9:
            # connectors wander off to the side
            Rg, tg = gt_pose(5)
            tg = tg + np.array([0, 0.3 * (i - 5), 0], np.float32)
        else:
            Rg, tg = gt_pose(i if not seg_b else i - 10)
        pc = (Rg @ W.T).T + tg                      # TRUE camera points
        uv, face = C.ray_to_cubemap(cam, jnp.asarray(pc, jnp.float32))
        uv, face = np.asarray(uv), np.asarray(face)
        rays = pc / np.linalg.norm(pc, axis=1, keepdims=True)
        vis = np.where(face >= 0)[0]
        if 6 <= i <= 9:
            vis = vis[:40]
        vis = vis[:N]
        if seg_b:
            R_kf = Rg @ R_d.T
            t_kf = s_d * tg - Rg @ R_d.T @ t_d
        else:
            R_kf, t_kf = Rg, tg
        row = dict(uv=np.zeros((N, 2), np.float32),
                   rays=np.zeros((N, 3), np.float32),
                   face=np.full(N, -1, np.int32),
                   desc=np.zeros((N, 8), np.uint32),
                   lm=np.full(N, -1, np.int32),
                   valid=np.zeros(N, bool))
        for j, p in enumerate(vis):
            row["uv"][j] = uv[p]
            row["rays"][j] = rays[p]
            row["face"][j] = face[p]
            row["desc"][j] = desc[p]
            row["valid"][j] = True
            key = (p, seg_b)
            if key not in lm_of:
                lm_of[key] = lm_slot
                xw = (s_d * (R_d @ W[p]) + t_d) if seg_b else W[p]
                arena = arena._replace(
                    lm_pos=arena.lm_pos.at[lm_slot].set(
                        jnp.asarray(xw, jnp.float32)),
                    lm_valid=arena.lm_valid.at[lm_slot].set(True),
                    lm_desc=arena.lm_desc.at[lm_slot].set(
                        jnp.asarray(desc[p])),
                    lm_first_kf=arena.lm_first_kf.at[lm_slot].set(i))
                lm_slot += 1
            row["lm"][j] = lm_of[key]
        arena = arena._replace(
            kf_R=arena.kf_R.at[i].set(jnp.asarray(R_kf)),
            kf_t=arena.kf_t.at[i].set(jnp.asarray(t_kf)),
            kf_valid=arena.kf_valid.at[i].set(True),
            kf_frame_id=arena.kf_frame_id.at[i].set(i),
            kf_uv=arena.kf_uv.at[i].set(jnp.asarray(row["uv"])),
            kf_rays=arena.kf_rays.at[i].set(jnp.asarray(row["rays"])),
            kf_face=arena.kf_face.at[i].set(jnp.asarray(row["face"])),
            kf_level=arena.kf_level.at[i].set(jnp.zeros(N, jnp.int32)),
            kf_angle=arena.kf_angle.at[i].set(jnp.zeros(N)),
            kf_desc=arena.kf_desc.at[i].set(jnp.asarray(row["desc"])),
            kf_kp_valid=arena.kf_kp_valid.at[i].set(
                jnp.asarray(row["valid"])),
            kf_obs_lm=arena.kf_obs_lm.at[i].set(jnp.asarray(row["lm"])),
        )
    return arena, W, desc, (s_d, R_d, t_d)


@pytest.mark.slow
class TestLoopClosure:
    def test_corrects_constructed_drift(self, rng):
        cfg = cfg_small()
        cam = CubemapCamera.from_config(cfg)
        arena, W, desc, (s_d, R_d, t_d) = build_drifted_loop_arena(
            cfg, cam, rng)

        sys_ = types.SimpleNamespace()
        sys_.arena = arena
        sys_.n_kf = 14
        sys_.key = jax.random.PRNGKey(0)
        vocab = PL.train_vocabulary(desc, k=8, depth=3)
        bow = jnp.zeros((cfg.max_keyframes, vocab.n_words))
        for i in range(14):
            bow = bow.at[i].set(PL.bow_vector(
                vocab, arena.kf_desc[i], arena.kf_kp_valid[i]))
        sys_.bow_table = bow

        mapping = MappingKernels(cfg, cam)
        lc = LoopCloser(cfg, cam, None, mapping)
        lc.consistency_th = 1
        t_before = np.asarray(sys_.arena.kf_t).copy()
        closed = False
        for slot in [12, 13]:
            if lc.process(sys_, slot):
                closed = True
                break
        assert closed, "loop not detected/closed on constructed drift"
        # segment-B poses pulled toward ground truth by the correction
        t_after = np.asarray(sys_.arena.kf_t)
        err_before = sum(np.linalg.norm(t_before[i] - gt_pose(i - 10)[1])
                         for i in range(10, 14))
        err_after = sum(np.linalg.norm(t_after[i] - gt_pose(i - 10)[1])
                        for i in range(10, 14))
        assert err_after < 0.6 * err_before, (err_before, err_after)
