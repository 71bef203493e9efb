"""On-device end-to-end SLAM smoke test (synthetic sequence).

The CPU test suite cannot catch TPU-only numerics issues: this script runs
the full tracking/mapping pipeline on the real chip and asserts the
Sim3-aligned ATE. It caught the bf16-default-matmul-precision bug that let
the map decay until tracking was lost (see cubemapslam_tpu/__init__.py).

Run from the repo root:  python scripts/e2e_tpu_smoke.py
(first run compiles for several minutes)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import jax
import jax.numpy as jnp

import importlib.util

_spec = importlib.util.spec_from_file_location(
    "e2e", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "test_e2e.py"))
e2e = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(e2e)

from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.runtime.system import CubemapSLAM, TrackState
from cubemapslam_tpu.warp import fov_mask
from cubemapslam_tpu.solvers.horn import horn_alignment


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(42)
    cfg = SlamConfig(cube_face_w=160, cube_face_h=160, n_features=600,
                     n_levels=3, max_keyframes=24, max_landmarks=4096,
                     min_init_keypoints=80, min_init_matches=60,
                     min_track_inliers=20, fps=5.0)
    slam = CubemapSLAM(cfg)
    mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)
    pts, patches = e2e.make_world(rng, n=600)
    ren = e2e.Renderer(slam.cam, cfg, "cubemap")
    poses = e2e.trajectory_poses(16)
    est = {}
    t0 = time.time()
    for k, (R, t) in enumerate(poses):
        img = ren.render(pts, patches, R, t)
        T = slam.track_cubemap(jnp.asarray(img), float(k) / 10.0, mask=mask)
        if T is not None:
            est[k] = T
        m = slam.metrics[-1] if slam.metrics else {}
        print(f"frame {k}: {slam.state.name} kf={slam.n_kf} {m} "
              f"({time.time() - t0:.0f}s)", flush=True)
    assert slam.state == TrackState.OK, slam.state
    assert len(est) >= 10, sorted(est)
    ks = sorted(est)
    centers_est = np.stack([-est[k][:3, :3].T @ est[k][:3, 3] for k in ks])
    centers_gt = np.stack([-poses[k][0].T @ poses[k][1] for k in ks])
    s, Ra, ta = horn_alignment(jnp.asarray(centers_gt, jnp.float32),
                               jnp.asarray(centers_est, jnp.float32))
    aligned = float(s) * (np.asarray(Ra) @ centers_est.T).T + np.asarray(ta)
    ate = float(np.sqrt(np.mean(np.sum((aligned - centers_gt) ** 2, axis=1))))
    scene = float(np.linalg.norm(centers_gt[-1] - centers_gt[0]))
    print(f"ATE {ate:.4f} over scene {scene:.3f} (ratio {ate / scene:.3f})")
    assert ate < 0.15 * scene + 0.02, (ate, scene)
    print("TPU E2E SMOKE: PASS")


if __name__ == "__main__":
    main()
