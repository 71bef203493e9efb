"""Keyframe-slot recycling mechanics.

The reference map grows unbounded and erases culled KeyFrames
(KeyFrame::SetBadFlag, KeyFrame.cpp:456-570); the fixed arena must instead
return culled slots to a free pool so long sequences never hit a silent
keyframe wall, while everything ordered "by keyframe id" (trajectory output,
essential-graph chain, reference-KF selection) keeps using TEMPORAL order.
"""

import numpy as np
import jax.numpy as jnp

from cubemapslam_tpu import slam_map as SM
from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.features.extractor import Keypoints
from cubemapslam_tpu.runtime.system import CubemapSLAM


def tiny_cfg():
    return SlamConfig(cube_face_w=64, cube_face_h=64, n_features=32,
                      n_levels=2, max_keyframes=6, max_landmarks=256)


def dummy_kp(cfg, seed=0):
    rng = np.random.default_rng(seed)
    N = cfg.n_features
    rays = rng.normal(size=(N, 3)).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=1, keepdims=True)
    return Keypoints(
        uv=jnp.asarray(rng.uniform(10, 100, (N, 2)), jnp.float32),
        response=jnp.ones(N), angle=jnp.zeros(N),
        level=jnp.zeros(N, jnp.int32), face=jnp.zeros(N, jnp.int32),
        desc=jnp.asarray(rng.integers(0, 2 ** 32, (N, 8),
                                      dtype=np.uint32)),
        rays=jnp.asarray(rays), valid=jnp.ones(N, bool))


def fill_keyframes(slam, cfg, n, t0=0):
    no = jnp.full((cfg.n_features,), SM.NO_LM, jnp.int32)
    out = jnp.zeros(cfg.n_features, bool)
    for i in range(n):
        slot = slam._free_kf_slot()
        assert slot >= 0
        slam.arena = slam.kernels.insert_keyframe(
            slam.arena, slot, dummy_kp(cfg, i), no, out,
            jnp.eye(3), jnp.zeros(3), t0 + i, float(t0 + i))
        slam.n_kf += 1


class TestSlotRecycling:
    def test_culled_slots_are_reused(self):
        cfg = tiny_cfg()
        slam = CubemapSLAM(cfg)
        fill_keyframes(slam, cfg, 6)
        assert slam._free_kf_slot() == -1

        # cull two middle keyframes -> their slots become allocatable
        slam.arena = slam.arena._replace(
            kf_valid=slam.arena.kf_valid.at[2].set(False).at[4].set(False))
        assert slam._free_kf_slot() == 2

        # new keyframes land in the freed slots, counter keeps rising
        n_before = slam.n_kf
        fill_keyframes(slam, cfg, 2, t0=100)
        assert slam.n_kf == n_before + 2
        assert bool(slam.arena.kf_valid[2]) and bool(slam.arena.kf_valid[4])
        assert int(jnp.sum(slam.arena.kf_valid)) == 6
        # the recycled slots carry the NEW frame ids
        assert int(slam.arena.kf_frame_id[2]) == 100
        assert int(slam.arena.kf_frame_id[4]) == 101

    def test_trajectory_in_temporal_order_across_recycled_slots(self):
        cfg = tiny_cfg()
        slam = CubemapSLAM(cfg)
        fill_keyframes(slam, cfg, 6)
        slam.arena = slam.arena._replace(
            kf_valid=slam.arena.kf_valid.at[1].set(False))
        fill_keyframes(slam, cfg, 1, t0=50)   # slot 1 now holds frame 50
        traj = slam.keyframe_trajectory()
        stamps = [t for (t, _, _) in traj]
        assert stamps == sorted(stamps)
        assert stamps[-1] == 50.0

    def test_full_arena_refuses_keyframe_with_warning(self):
        import warnings
        cfg = tiny_cfg()
        slam = CubemapSLAM(cfg)
        fill_keyframes(slam, cfg, 6)
        slam.ref_kf = 0
        # give the ref KF tracked landmarks so c2 fires
        slam.arena = slam.arena._replace(
            kf_obs_lm=slam.arena.kf_obs_lm.at[0].set(
                jnp.arange(cfg.n_features, dtype=jnp.int32)),
            lm_valid=slam.arena.lm_valid.at[:cfg.n_features].set(True))
        slam.frame_id = 100
        slam.last_kf_frame_id = 0
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            assert slam._need_new_keyframe(
                n_inliers=20, n_ref=cfg.n_features, first_free=-1) is False
        assert slam.arena_full_refusals == 1
        assert any("arena full" in str(w.message) for w in rec)

    def test_reference_keyframe_is_temporally_first(self):
        cfg = tiny_cfg()
        slam = CubemapSLAM(cfg)
        fill_keyframes(slam, cfg, 3)           # frame ids 0,1,2
        # slot 0 culled + recycled with a LATER frame id
        slam.arena = slam.arena._replace(
            kf_valid=slam.arena.kf_valid.at[0].set(False))
        fill_keyframes(slam, cfg, 1, t0=10)    # slot 0 -> frame id 10
        # landmark 7 observed by slot 0 (frame 10) and slot 2 (frame 2)
        arena = slam.arena
        arena = arena._replace(
            kf_obs_lm=arena.kf_obs_lm.at[0, 0].set(7).at[2, 0].set(7),
            lm_valid=arena.lm_valid.at[7].set(True))
        seg, live = SM._flat_obs(arena)
        kf_idx = jnp.repeat(jnp.arange(arena.n_kf_cap, dtype=jnp.int32),
                            arena.n_feat)
        ref = SM.reference_keyframes(arena, seg, live, kf_idx)
        assert int(ref[7]) == 2  # frame id 2 < 10, despite slot 0 < 2
