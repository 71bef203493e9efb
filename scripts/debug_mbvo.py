"""Debug the mbVO engagement failure (test_localization_mode.py:138).

Replicates TestMbVOStateMachine with stage-level prints: after the
geometry perturbation, what do matches / inliers look like on each branch
of the localization tracking path?
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.runtime.system import CubemapSLAM, TrackState
from cubemapslam_tpu.synth import Renderer, make_world
from cubemapslam_tpu.warp import fov_mask

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_localization_mode import poses_out_and_back  # noqa: E402


def main():
    rng = np.random.default_rng(42)
    cfg = SlamConfig(cube_face_w=160, cube_face_h=160, n_features=600,
                     n_levels=3, max_keyframes=32, max_landmarks=8192,
                     min_init_keypoints=80, min_init_matches=60,
                     init_min_triangulated=40, init_good_ratio=0.75,
                     min_track_inliers=20,
                     min_track_inliers_after_reloc=30, fps=5.0)
    slam = CubemapSLAM(cfg)
    slam.loop_closing_enabled = False
    mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)
    poses, n_map = poses_out_and_back(n_map=10, n_away=0)
    centers = np.stack([np.array([0.36 * k, 0, 0], np.float32)
                        for k in range(5)])
    pts, patches = make_world(rng, n=700, r_lo=2.5, r_hi=5.5,
                              centers=centers)
    ren = Renderer(slam.cam, cfg, "cubemap")
    for k in range(n_map):
        img = ren.render(pts, patches, *poses[k])
        slam.track_cubemap(jnp.asarray(img), k * 0.1, mask=mask)
        print(f"map frame {k}: {slam.state.name} kf={slam.n_kf} "
              f"{slam.metrics[-1] if slam.metrics else {}}")
    assert slam.state == TrackState.OK
    slam.activate_localization_mode()

    clean_pos = slam.arena.lm_pos
    noise = jnp.asarray(
        rng.normal(0, 0.12, np.asarray(clean_pos).shape), jnp.float32)
    slam.arena = slam.arena._replace(lm_pos=clean_pos + noise)

    # manual trace of _track_frame_localization branches
    img = ren.render(pts, patches, *poses[n_map - 1])
    kp = slam.extract(jnp.asarray(img), jnp.asarray(mask))
    k_ = slam.kernels
    R_last, t_last, R_pred, t_pred = slam._predicted_pose()
    for radius in (15.0, 30.0):
        assoc, n, R, t, outlier, n_inl = k_.track_motion_fused(
            slam.arena, kp, slam.last.assoc, slam.last.outlier,
            slam.last.kp.level, slam.last.kp.angle, R_pred, t_pred,
            radius=radius)
        print(f"motion radius={radius}: n={int(n)} n_inl={int(n_inl)}")
    (arena2, assoc2, outlier2, R2, t2, n_final,
     pkf_max, pkf_votes) = k_.track_local_fused(
        slam.arena, kp, assoc, outlier, R, t)
    print(f"track_local_fused: n_final={int(n_final)}")

    slam.track_cubemap(jnp.asarray(img), n_map * 0.1, mask=mask)
    print(f"after track: state={slam.state.name} mb_vo={slam.mb_vo} "
          f"metrics={slam.metrics[-1]}")


if __name__ == "__main__":
    main()
