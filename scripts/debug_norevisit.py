"""Debug the no-revisit control scenario (round 4)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax
jax.config.update("jax_threefry_partitionable", True)
import numpy as np
import jax.numpy as jnp
import sys
sys.path.insert(0, 'tests')

from cubemapslam_tpu.runtime.system import CubemapSLAM
from cubemapslam_tpu.synth import Renderer, forward_trajectory, make_world
from cubemapslam_tpu.warp import fov_mask
from test_loop_e2e import loop_cfg

rng = np.random.default_rng(42)
poses = forward_trajectory(60, step=0.12, yaw_rate=0.004)
centers_gt = np.stack([-R.T @ t for R, t in poses])
pts, patches = make_world(rng, n=1000, centers=centers_gt)
slam = CubemapSLAM(loop_cfg())
mask = fov_mask(slam.cam, slam.cfg.cube_w, slam.cfg.cube_h)
ren = Renderer(slam.cam, slam.cfg, "cubemap")
for k, (R, t) in enumerate(poses):
    img = ren.render(pts, patches, R, t)
    slam.track_cubemap(jnp.asarray(img), k * 0.1, mask=mask)
    live = int(np.asarray(slam.arena.kf_valid).sum())
    lm_live = int(np.asarray(slam.arena.lm_valid).sum())
    m = slam.metrics[-1] if slam.metrics else {}
    rk = slam.ref_kf
    rk_valid = bool(np.asarray(slam.arena.kf_valid)[rk])
    row = np.asarray(slam.arena.kf_obs_lm[rk])
    row_live = int(((row >= 0) & np.asarray(slam.arena.kf_kp_valid[rk])
                    & np.asarray(slam.arena.lm_valid)[
                        np.maximum(row, 0)]).sum())
    la = np.asarray(slam.last.assoc) if slam.last.assoc is not None else None
    n_assoc = int((la >= 0).sum()) if la is not None else -1
    vel = "-"
    if slam.velocity is not None:
        import cubemapslam_tpu.geometry as G
        tw = np.asarray(G.se3_log(*slam.velocity))
        vel = f"{np.linalg.norm(tw[:3]):.3f}/{np.linalg.norm(tw[3:]):.3f}"
    print(f"frame {k:2d} {slam.state.name:15s} n_kf={slam.n_kf:3d} "
          f"live={live:3d} lm={lm_live:5d} ref={rk}({rk_valid},{row_live}) "
          f"assoc={n_assoc} vel={vel} m={m}", flush=True)
    if slam.state.name == "LOST" and k > 45:
        break
print("final", slam.state.name, "loops", slam.n_loops_closed)
