"""Working-scale loop-closure timing (VERDICT r4 missing #3 / next #6).

Drives synth.loop_trajectory at the Lafida working configuration (650^2
faces, 2000 features, K=512/L=65536 arena) through at least one genuine
revisit and reports the wall cost of each loop-closing phase (detect /
sim3 / correct incl. essential graph / post-loop GBA) from
LoopCloser.timings, plus tracking health.

Run on the TPU: python scripts/bench_loop_scale.py
Knobs: N_FRAMES (default 260), N_LOOPS (default 1.25).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from cubemapslam_tpu.config import SlamConfig
    from cubemapslam_tpu.runtime.system import CubemapSLAM, TrackState
    from cubemapslam_tpu.synth import Renderer, loop_trajectory, make_world
    from cubemapslam_tpu.warp import fov_mask

    n_frames = int(os.environ.get("N_FRAMES", 260))
    n_loops = float(os.environ.get("N_LOOPS", 1.25))
    voc = os.path.join(repo, "artifacts", "vocab_synth_10k.npz")
    cfg = SlamConfig(vocab_path=voc if os.path.exists(voc) else None)
    slam = CubemapSLAM(cfg)
    mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)

    rng = np.random.default_rng(3)
    poses = loop_trajectory(n_frames, radius=3.0, n_loops=n_loops,
                            facing="tangent")
    centers = np.stack([-R.T @ t for R, t in poses])
    pts, patches = make_world(rng, n=1600, centers=centers,
                              fx=float(slam.cam.fxycxy[0]))
    ren = Renderer(slam.cam, cfg, "fisheye")
    t0 = time.time()
    frames = [ren.render(pts, patches, R, t).astype(np.uint8)
              for R, t in poses]
    print(f"# rendered {n_frames} loop frames ({time.time()-t0:.0f}s)",
          flush=True)

    for k, img in enumerate(frames):
        t1 = time.perf_counter()
        slam.track_fisheye(img, k / cfg.fps, mask=mask)
        dt = time.perf_counter() - t1
        if k % 20 == 0 or slam.n_loops_closed:
            print(f"f{k:3d} {slam.state.name:4.4s} kf={slam.n_kf:3d} "
                  f"loops={slam.n_loops_closed} {dt*1e3:.0f}ms",
                  flush=True)
        if slam.n_loops_closed:
            break

    print(f"# loops closed: {slam.n_loops_closed}, "
          f"tracked {slam.tracked_frames}/{slam.total_frames}")
    print("# loop-closing phase wall times (s):")
    for name, vals in slam.loop_closer.timings.items():
        print(f"#   {name:10s}: n={len(vals)} "
              f"median={np.median(vals):.3f} max={max(vals):.3f}")

    # ATE with the closure in place (continue a few frames to settle)
    if slam.n_loops_closed:
        k0 = slam.total_frames
        for k in range(k0, min(k0 + 20, n_frames)):
            slam.track_fisheye(frames[k], k / cfg.fps, mask=mask)
        from bench import ate_rmse  # noqa: E402
        sys.path.insert(0, repo)
        ate = ate_rmse(slam, centers)
        span = float(np.linalg.norm(centers.max(0) - centers.min(0)))
        print(f"# post-loop ATE RMSE: {ate} (span {span:.2f})")


if __name__ == "__main__":
    main()
