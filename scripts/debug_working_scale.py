"""Working-scale tracking-decay debug driver (VERDICT r4 #1).

Drives the exact bench configuration (Lafida cam0: 650^2 faces, 2000
features, forward trajectory) with per-frame diagnostics: tracked inliers,
keyframe cadence, per-mapping-step triangulation yield and live landmark
count, and — the key question — whether fresh triangulations are trackable
on subsequent frames.

Run on the TPU (the failure is scale-dependent): python scripts/debug_working_scale.py
Knobs via env: N_FRAMES, DECAY (keyframe_inlier_decay), STEP.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from cubemapslam_tpu.config import SlamConfig
    from cubemapslam_tpu.runtime.system import CubemapSLAM, TrackState
    from cubemapslam_tpu.synth import (Renderer, forward_trajectory,
                                       make_world)
    from cubemapslam_tpu.warp import fov_mask

    n_frames = int(os.environ.get("N_FRAMES", 140))
    decay = float(os.environ.get("DECAY", 0.9))  # config default
    step = float(os.environ.get("STEP", 0.02))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    voc = os.path.join(repo, "artifacts", "vocab_synth_10k.npz")
    cfg = SlamConfig(vocab_path=voc if os.path.exists(voc) else None,
                     keyframe_inlier_decay=decay)
    slam = CubemapSLAM(cfg)
    slam.loop_closing_enabled = False
    mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)

    rng = np.random.default_rng(0)
    poses = forward_trajectory(n_frames, step=step, yaw_rate=0.002)
    centers = np.stack([-R.T @ t for R, t in poses])
    pts, patches = make_world(rng, n=1200, centers=centers,
                              fx=float(slam.cam.fxycxy[0]))
    ren = Renderer(slam.cam, cfg, "fisheye")
    import time
    t0 = time.time()
    frames = [ren.render(pts, patches, R, t).astype(np.uint8)
              for R, t in poses]
    print(f"# rendered {n_frames} ({time.time()-t0:.0f}s)", flush=True)

    last_kf = 0
    for k, img in enumerate(frames):
        n_kf_before = slam.n_kf
        slam.track_fisheye(img, k / cfg.fps, mask=mask)
        m = dict(slam.metrics[-1]) if slam.metrics else {}
        line = (f"f{k:3d} {slam.state.name:4.4s} kf={slam.n_kf:3d} "
                f"inl={m.get('inliers', 0):4d} mm={m.get('inliers_mm', 0):4d} "
                f"match={m.get('matches', 0):4d} nref={m.get('n_ref', 0):4d} "
                f"lf={m.get('local_frustum', 0):5d} "
                f"lq={m.get('local_queried', 0):5d} "
                f"lm={m.get('local_matched', 0):4d} "
                f"peak={slam._kf_inlier_peak:4d}")
        if slam.n_kf > n_kf_before and slam._last_mapping_info is not None:
            info = np.asarray(slam._last_mapping_info)
            # breakdown of the NEW keyframe's obs row + age of landmarks
            # the frame is tracking
            a = slam.arena
            row = np.asarray(a.kf_obs_lm[slam.ref_kf])
            rv = row[row >= 0]
            births = np.asarray(a.lm_birth)[rv]
            line += (f" | KF@slot{slam.ref_kf}: culled={info[0]} "
                     f"tri_new={info[2]} live_lm={info[3]} "
                     f"row_obs={info[4]} "
                     f"cull_ratio={info[5]} cull_obs={info[6]} "
                     f"epi_raw={info[7]} tri_gated={info[8]} "
                     f"gates[par={info[9]} depth={info[10]} "
                     f"chi2={info[11]}] "
                     f"row_birth_med={np.median(births) if len(births) else -1:.0f}")
            last_kf = k
        # every 10 frames: age distribution of the TRACKED landmarks
        if k % 10 == 0 and slam.last.assoc is not None \
                and slam.state == TrackState.OK:
            assoc = np.asarray(slam.last.assoc)
            out = np.asarray(slam.last.outlier)
            ids = assoc[(assoc >= 0) & ~out]
            if len(ids):
                births = np.asarray(slam.arena.lm_birth)[ids]
                vis = np.asarray(slam.arena.lm_visible)[ids]
                fnd = np.asarray(slam.arena.lm_found)[ids]
                line += (f" | tracked: n={len(ids)} "
                         f"birth p10/50/90={np.percentile(births,10):.0f}/"
                         f"{np.percentile(births,50):.0f}/"
                         f"{np.percentile(births,90):.0f} "
                         f"found_ratio_med="
                         f"{np.median(fnd/np.maximum(vis,1)):.2f}")
        print(line, flush=True)


if __name__ == "__main__":
    main()
