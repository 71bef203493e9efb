"""Distributed global-BA scaling measurement (BASELINE.md >=70% target).

Builds an arena-scale BA problem (the same construction LoopCloser's
post-loop global BA uses) and times one full bundle_adjust at mesh sizes
1/2/4/8. On real multi-chip TPU hardware this measures ICI scaling; on the
CI's virtual CPU mesh (the only thing available in this environment —
XLA_FLAGS=--xla_force_host_platform_device_count=8) the devices SHARE host
cores, so the wall-clock numbers validate the SPMD path and communication
overhead, not speedup. Run on a real slice to get the BASELINE.md metric.

Usage: python scripts/measure_dist_ba.py [n_kf] [n_pts] [repeats]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# default to the virtual CPU mesh (the axon plugin registers a 1-chip TPU
# backend regardless of env); set MEASURE_ON_TPU=1 on a real slice
if not os.environ.get("MEASURE_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax

if not os.environ.get("MEASURE_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp


def main():
    from cubemapslam_tpu.config import SlamConfig
    from cubemapslam_tpu.camera import CubemapCamera
    from cubemapslam_tpu import dist as D

    n_kf = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    n_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cfg = SlamConfig(cube_face_w=256, cube_face_h=256,
                     n_features=1024, n_levels=4,
                     max_keyframes=n_kf, max_landmarks=n_pts)
    cam = CubemapCamera.from_config(cfg)
    arena = D.make_synthetic_arena(cfg, cam, n_kf=n_kf, n_pts=n_pts,
                                   pos_noise=0.02)
    inv_s2 = 1.0 / jnp.asarray(cfg.level_sigma2, jnp.float32)
    prob = D.global_ba_problem_from_arena(cam, arena, inv_s2)
    E = int(np.asarray(prob.obs_valid).sum())
    print(f"problem: {n_kf} KFs, {n_pts} landmarks, {E} live edges")

    devs = jax.devices()
    results = {}
    for n in (1, 2, 4, 8):
        if n > len(devs):
            break
        mesh = D.make_mesh(devs[:n])
        ps = D.shard_ba_problem(prob, n)
        # compile + warm
        out, inl = D.distributed_bundle_adjust(cam, ps, mesh,
                                               phase_iters=(5, 10),
                                               cg_iters=30)
        jax.block_until_ready(out.R)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out, inl = D.distributed_bundle_adjust(cam, ps, mesh,
                                                   phase_iters=(5, 10),
                                                   cg_iters=30)
            jax.block_until_ready(out.R)
            ts.append(time.perf_counter() - t0)
        results[n] = min(ts)
        eff = results[1] / (n * results[n]) if 1 in results else float("nan")
        print(f"mesh={n}: step={min(ts)*1000:.1f} ms "
              f"scaling_eff={eff:.2f}", flush=True)


if __name__ == "__main__":
    main()
