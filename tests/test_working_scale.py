"""Working-scale tracking regression (VERDICT r4 #1 "Done" criterion).

Drives the EXACT bench configuration — Lafida cam0 (650^2 faces, 2000
features, 8 levels, K=512/L=65536 arena), 220-frame forward trajectory,
fisheye input through the device warp — and asserts the tracker stays OK:
tracked_frames_ratio >= 0.95, final state OK, and ATE within 5% of the
scene span.

The suite's conftest pins JAX to an 8-device virtual CPU mesh where one
650^2 ORB extraction takes seconds, so this test only runs when
CUBEMAP_WORKING_SCALE=1 is set (run it on the TPU via
`CUBEMAP_WORKING_SCALE=1 python -m pytest tests/test_working_scale.py`,
where the same 220 frames take ~2 minutes). The driver-run bench
(bench.py) exercises the identical configuration every round and records
the same ratio in BENCH_r*.json.
"""

import os

import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("CUBEMAP_WORKING_SCALE") != "1",
        reason="650^2/2000-feature scale: ~45 min on the CPU-pinned suite; "
               "set CUBEMAP_WORKING_SCALE=1 (ideally on TPU) to run"),
]


def test_tracks_220_frames_at_lafida_scale():
    import jax.numpy as jnp
    from cubemapslam_tpu.config import SlamConfig
    from cubemapslam_tpu.runtime.system import CubemapSLAM, TrackState
    from cubemapslam_tpu.synth import (Renderer, forward_trajectory,
                                       make_world)
    from cubemapslam_tpu.warp import fov_mask
    from cubemapslam_tpu.solvers.horn import horn_alignment

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    voc = os.path.join(repo, "artifacts", "vocab_synth_10k.npz")
    cfg = SlamConfig(vocab_path=voc if os.path.exists(voc) else None)
    slam = CubemapSLAM(cfg)
    mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)

    rng = np.random.default_rng(0)
    n_frames = 220
    poses = forward_trajectory(n_frames, step=0.02, yaw_rate=0.002)
    centers = np.stack([-R.T @ t for R, t in poses])
    pts, patches = make_world(rng, n=2400, centers=centers,
                              fx=float(slam.cam.fxycxy[0]))
    ren = Renderer(slam.cam, cfg, "fisheye")
    for k, (R, t) in enumerate(poses):
        img = ren.render(pts, patches, R, t).astype(np.uint8)
        slam.track_fisheye(img, k / cfg.fps, mask=mask)

    ratio = slam.tracked_frames / max(slam.total_frames, 1)
    assert slam.state == TrackState.OK, slam.state
    assert ratio >= 0.95, f"tracked_frames_ratio {ratio:.3f}"

    valid = np.asarray(slam.arena.kf_valid)
    fids = np.asarray(slam.arena.kf_frame_id)
    Rs = np.asarray(slam.arena.kf_R)
    ts = np.asarray(slam.arena.kf_t)
    ks = np.where(valid)[0]
    est = np.stack([-Rs[k].T @ ts[k] for k in ks])
    gt = np.stack([centers[fids[k]] for k in ks])
    s, Ra, ta = horn_alignment(jnp.asarray(gt, jnp.float32),
                               jnp.asarray(est, jnp.float32))
    aligned = float(s) * (np.asarray(Ra) @ est.T).T + np.asarray(ta)
    ate = float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=1))))
    span = float(np.linalg.norm(centers.max(0) - centers.min(0)))
    assert ate < 0.05 * span, (ate, span)
