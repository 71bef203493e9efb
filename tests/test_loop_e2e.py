"""Full-pipeline loop-closure e2e at reference strength.

Drives synth.loop_trajectory (tangent facing — the reference's vehicle-loop
geometry, Scripts/runCubemapLoop2*.sh) through the REAL track_cubemap
pipeline at consistency_th=3 (LoopClosing.cpp:43): detection -> Sim3 RANSAC
-> SearchBySim3 widening -> OptimizeSim3 >=20 -> Scw >=40 -> neighborhood
SearchAndFuse -> essential graph -> global BA. A pretrained vocabulary
artifact (scripts/train_vocab.py path) feeds place recognition, and a
no-revisit control must close zero loops.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cubemapslam_tpu import place as PL
from cubemapslam_tpu import slam_map as SM
from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.runtime.system import CubemapSLAM, TrackState
from cubemapslam_tpu.solvers.horn import horn_alignment
from cubemapslam_tpu.synth import (Renderer, forward_trajectory, make_world,
                                   loop_trajectory)
from cubemapslam_tpu.warp import fov_mask


def loop_cfg(**kw):
    return SlamConfig(cube_face_w=160, cube_face_h=160, n_features=600,
                      n_levels=3, max_keyframes=144, max_landmarks=16384,
                      min_init_keypoints=80, min_init_matches=60,
                      init_min_triangulated=40, init_good_ratio=0.75,
                      min_track_inliers=20, fps=5.0, **kw)


def ate_of(slam, centers_gt):
    valid = np.asarray(slam.arena.kf_valid)
    fids = np.asarray(slam.arena.kf_frame_id)
    Rs = np.asarray(slam.arena.kf_R)
    ts = np.asarray(slam.arena.kf_t)
    ks = np.where(valid)[0]
    est = np.stack([-Rs[k].T @ ts[k] for k in ks])
    gt = np.stack([centers_gt[fids[k]] for k in ks])
    s, Ra, ta = horn_alignment(jnp.asarray(gt, jnp.float32),
                               jnp.asarray(est, jnp.float32))
    aligned = float(s) * (np.asarray(Ra) @ est.T).T + np.asarray(ta)
    return float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=1))))


def pretrained_vocab(rng, pts, patches, ren, extract, mask, tmp_path):
    """Train + save a vocabulary on a rendered corpus; return its path
    (the offline ORBvoc pipeline, ORBVocabulary.h:36-37)."""
    descs = []
    for R, t in loop_trajectory(12, radius=3.0, n_loops=1.0,
                                facing="tangent"):
        kp = extract(jnp.asarray(ren.render(pts, patches, R, t)), mask)
        descs.append(np.asarray(kp.desc)[np.asarray(kp.valid)])
    vocab = PL.train_vocabulary(np.concatenate(descs), k=8, depth=3, seed=1)
    path = str(tmp_path / "voc.npz")
    PL.save_vocabulary(vocab, path)
    return path


@pytest.mark.slow
class TestLoopClosureEndToEnd:
    def test_closes_loop_and_reduces_ate(self, rng, tmp_path):
        n_frames, n_loops = 170, 1.25
        poses = loop_trajectory(n_frames, radius=3.0, n_loops=n_loops,
                                facing="tangent")
        centers_gt = np.stack([-R.T @ t for R, t in poses])
        pts, patches = make_world(rng, n=1500, centers=centers_gt)

        # pretrained vocabulary artifact from a rendered corpus
        probe = CubemapSLAM(loop_cfg())
        mask = fov_mask(probe.cam, probe.cfg.cube_w, probe.cfg.cube_h)
        ren = Renderer(probe.cam, probe.cfg, "cubemap")
        voc = pretrained_vocab(rng, pts, patches, ren, probe.extract,
                               mask, tmp_path)

        slam = CubemapSLAM(loop_cfg(vocab_path=voc))
        assert not slam._vocab_is_bootstrap
        ate_pre = None   # last ATE sampled while no loop was closed yet
        for k, (R, t) in enumerate(poses):
            img = ren.render(pts, patches, R, t)
            slam.track_cubemap(jnp.asarray(img), k * 0.1, mask=mask)
            if (slam.n_loops_closed == 0 and slam.n_kf >= 4
                    and k % 10 == 0 and slam.state == TrackState.OK):
                ate_pre = ate_of(slam, centers_gt)

        assert slam.n_loops_closed >= 1, "no loop closed at th=3"
        assert slam.state == TrackState.OK
        ate_post = ate_of(slam, centers_gt)
        scene = 6.0  # circle diameter
        assert ate_post < 0.05 * scene, ate_post
        # the closure improved on the accumulated pre-closure drift
        assert ate_pre is not None and ate_post < ate_pre, (ate_pre,
                                                            ate_post)
        # SearchAndFuse + loop fusion wired CROSS-PASS observations: some
        # temporally distant keyframe pair is now strongly covisible
        covis = np.asarray(SM.covisibility_matrix(slam.arena))
        fids = np.asarray(slam.arena.kf_frame_id)
        valid = np.asarray(slam.arena.kf_valid)
        dt = np.abs(fids[:, None] - fids[None, :])
        cross = (dt > 80) & valid[:, None] & valid[None, :]
        assert covis[cross].max() >= 15, "no cross-pass covisibility"

    def test_no_revisit_control_closes_nothing(self, rng, tmp_path):
        """A non-revisiting trajectory through a textured world must not
        trigger a loop closure (false-positive control)."""
        poses = forward_trajectory(60, step=0.12, yaw_rate=0.004)
        centers_gt = np.stack([-R.T @ t for R, t in poses])
        pts, patches = make_world(rng, n=1000, centers=centers_gt)
        slam = CubemapSLAM(loop_cfg())
        mask = fov_mask(slam.cam, slam.cfg.cube_w, slam.cfg.cube_h)
        ren = Renderer(slam.cam, slam.cfg, "cubemap")
        for k, (R, t) in enumerate(poses):
            img = ren.render(pts, patches, R, t)
            slam.track_cubemap(jnp.asarray(img), k * 0.1, mask=mask)
        assert slam.n_loops_closed == 0
        assert slam.state == TrackState.OK
