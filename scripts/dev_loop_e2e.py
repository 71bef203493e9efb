"""Dev harness for the full-pipeline loop-closure e2e (VERDICT r2 item 2).

Drives synth.loop_trajectory through the REAL track_cubemap pipeline at
consistency_th=3 and reports: keyframes, loops closed, ATE before alignment,
duplicate-landmark proxy counts. Not a test — the pinned version lives in
tests/test_loop_e2e.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.runtime.system import CubemapSLAM, TrackState
from cubemapslam_tpu.solvers.horn import horn_alignment
from cubemapslam_tpu.synth import Renderer, make_world, loop_trajectory
from cubemapslam_tpu.warp import fov_mask


def ate(slam, poses, frame_of_kf=None):
    """RMS ATE of keyframe centers vs ground truth after Sim3 alignment."""
    valid = np.asarray(slam.arena.kf_valid)
    fids = np.asarray(slam.arena.kf_frame_id)
    Rs = np.asarray(slam.arena.kf_R)
    ts = np.asarray(slam.arena.kf_t)
    ks = np.where(valid)[0]
    est = np.stack([-Rs[k].T @ ts[k] for k in ks])
    gt = np.stack([-poses[fids[k]][0].T @ poses[fids[k]][1] for k in ks])
    s, Ra, ta = horn_alignment(jnp.asarray(gt, jnp.float32),
                               jnp.asarray(est, jnp.float32))
    aligned = float(s) * (np.asarray(Ra) @ est.T).T + np.asarray(ta)
    return float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=1))))


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    n_loops = float(sys.argv[2]) if len(sys.argv) > 2 else 1.2
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    rng = np.random.default_rng(seed)
    cfg = SlamConfig(cube_face_w=160, cube_face_h=160, n_features=600,
                     n_levels=3, max_keyframes=64, max_landmarks=8192,
                     min_init_keypoints=80, min_init_matches=60,
                     init_min_triangulated=40, init_good_ratio=0.75,
                     min_track_inliers=20, fps=5.0)
    slam = CubemapSLAM(cfg)
    mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)
    poses = loop_trajectory(n_frames, radius=3.0, n_loops=n_loops)
    centers = np.stack([-R.T @ t for R, t in poses])
    pts, patches = make_world(rng, n=1500, centers=centers)
    ren = Renderer(slam.cam, cfg, "cubemap")
    t0 = time.time()
    ate_pre = None
    for k, (R, t) in enumerate(poses):
        img = ren.render(pts, patches, R, t)
        slam.track_cubemap(jnp.asarray(img), k * 0.1, mask=mask)
        if k % 20 == 0 or k == n_frames - 1:
            print(f"frame {k}: state={slam.state.name} n_kf={slam.n_kf} "
                  f"live={int(np.asarray(slam.arena.kf_valid).sum())} "
                  f"loops={slam.n_loops_closed} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if slam.n_loops_closed == 0:
            ate_pre = None  # measured lazily below
    print(f"total {time.time()-t0:.0f}s, loops={slam.n_loops_closed}, "
          f"state={slam.state.name}")
    print(f"final ATE: {ate(slam, poses):.4f} "
          f"(circle radius 3.0, scene diameter 6.0)")


if __name__ == "__main__":
    main()
