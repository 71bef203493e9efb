"""Root-cause harness for the damping-1.0 instability (round 4, VERDICT #6).

Runs the nominal 16-frame forward e2e at full constant-velocity
extrapolation and prints, per frame: ground-truth errors of the PREDICTED
pose and of the POST-OPTIMIZATION pose (rotation deg / translation), the
motion-model matches, and the live-observation mass of the map.
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import sys
import numpy as np
import jax
jax.config.update("jax_threefry_partitionable", True)
import jax.numpy as jnp

from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.runtime.system import CubemapSLAM, TrackState
from cubemapslam_tpu.synth import Renderer, make_world, forward_trajectory
from cubemapslam_tpu.warp import fov_mask
from cubemapslam_tpu import geometry as G


def rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def main(damping=1.0):
    rng = np.random.default_rng(42)
    cfg = SlamConfig(cube_face_w=160, cube_face_h=160, n_features=600,
                     n_levels=3, max_keyframes=24, max_landmarks=4096,
                     min_init_keypoints=80, min_init_matches=60,
                     min_track_inliers=20, fps=5.0,
                     motion_model_damping=damping)
    slam = CubemapSLAM(cfg)
    mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)
    pts, patches = make_world(rng, n=600)
    ren = Renderer(slam.cam, cfg, "cubemap")
    poses = forward_trajectory(16)

    # monocular scale: estimate from the first two KFs after init
    scale = None
    for k, (Rgt, tgt) in enumerate(poses):
        img = ren.render(pts, patches, Rgt, tgt)
        # capture the prediction the tracker will use
        pred = None
        if slam.state == TrackState.OK:
            _, _, R_pred, t_pred = slam._predicted_pose()
            pred = (np.asarray(R_pred), np.asarray(t_pred))
        slam.track_cubemap(jnp.asarray(img), k * 0.1, mask=mask)
        m = slam.metrics[-1] if slam.metrics else {}
        line = f"f{k:2d} {slam.state.name:4s} kf={slam.n_kf:2d}"
        if slam.state == TrackState.OK and slam.last.R is not None:
            Re = np.asarray(slam.last.R)
            te = np.asarray(slam.last.t)
            if scale is None and slam.n_kf >= 2:
                # scale = |est translation| / |gt translation| of frame
                gt_norm = np.linalg.norm(tgt)
                if gt_norm > 1e-6:
                    scale = np.linalg.norm(te) / gt_norm
            s = scale or 1.0
            line += (f" opt:dR={rot_err_deg(Re, Rgt):5.2f}deg"
                     f" dt={np.linalg.norm(te - s * tgt):6.3f}")
            if pred is not None:
                line += (f" pred:dR={rot_err_deg(pred[0], Rgt):5.2f}"
                         f" dt={np.linalg.norm(pred[1] - s * tgt):6.3f}")
            la = np.asarray(slam.last.assoc)
            line += f" assoc={int((la >= 0).sum()):3d}"
        rk = slam.ref_kf
        row = np.asarray(slam.arena.kf_obs_lm[rk])
        row_live = int(((row >= 0)
                        & np.asarray(slam.arena.kf_kp_valid[rk])
                        & np.asarray(slam.arena.lm_valid)[
                            np.maximum(row, 0)]).sum())
        line += f" refrow={row_live:3d} m={m}"
        print(line, flush=True)


if __name__ == "__main__":
    main(damping=float(sys.argv[1]) if len(sys.argv) > 1 else 1.0)
