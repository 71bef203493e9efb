"""Debug harness for the fast-motion regression (round 4)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax
import jax.numpy as jnp

from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.runtime.system import CubemapSLAM, TrackState
from cubemapslam_tpu.synth import Renderer, make_world
from cubemapslam_tpu.warp import fov_mask


def _yaw(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def _pose(R, t_wc):
    return R, (-R @ t_wc).astype(np.float32)


def main(damping=0.0):
    rng = np.random.default_rng(42)
    poses, x, yaw = [], np.zeros(3, np.float32), 0.0
    for k in range(16):
        step = 0.10 if k < 8 else (0.15 if k == 8 else 0.20)
        yr = 0.004 if k < 8 else 0.008
        x = x + np.array([step, 0, step * 0.5], np.float32)
        yaw += yr
        poses.append(_pose(_yaw(yaw), x.copy()))

    cfg = SlamConfig(cube_face_w=160, cube_face_h=160, n_features=600,
                     n_levels=3, max_keyframes=48, max_landmarks=8192,
                     min_init_keypoints=80, min_init_matches=60,
                     min_track_inliers=20, fps=5.0,
                     motion_model_damping=damping)
    slam = CubemapSLAM(cfg)
    mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)
    centers = np.stack([-R.T @ t for R, t in poses])
    pts, patches = make_world(rng, n=1600, centers=centers)
    ren = Renderer(slam.cam, cfg, "cubemap")
    for k, (R, t) in enumerate(poses):
        img = ren.render(pts, patches, R, t)
        T = slam.track_cubemap(jnp.asarray(img), k * 0.1, mask=mask)
        m = slam.metrics[-1] if slam.metrics else {}
        live = int(np.asarray(slam.arena.kf_valid).sum())
        print(f"frame {k:2d} state={slam.state.name:15s} n_kf={slam.n_kf:2d} "
              f"live={live:2d} ref={slam.ref_kf:2d} m={m}", flush=True)
    print("final state:", slam.state.name)


if __name__ == "__main__":
    import sys
    main(damping=float(sys.argv[1]) if len(sys.argv) > 1 else 0.0)
