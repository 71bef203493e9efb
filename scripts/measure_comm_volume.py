"""Per-step communication volume of the distributed global BA
(SURVEY §7 step 10 / VERDICT r4 missing #4): measure the boundary set and
account the exchanged bytes per LM iteration at 1/2/4/8 keyframe-block
shards, on the arena-scale problem the product ships to
distributed_bundle_adjust.

The psum payloads per LM iteration with landmark ownership:
  camera side (always full):   Hcc (M*36) + bc (M*6) + rhs-part (M*6)
                               + coup (M*6) per CG iter
  point side (boundary only):  Hpp_b (B*9) + bp_b (B*3)
                               + s_b (B*3) per CG iter + back-sub (B*3)
  scalars: 1 cost psum per iteration
  final owner recombine: P*3 once per solve
Without ownership the point-side payloads are P*9 / P*3 — the table below
prints both so the saving is explicit. All floats are 4 bytes.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/measure_comm_volume.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from cubemapslam_tpu import dist as D
    from cubemapslam_tpu.config import SlamConfig
    from cubemapslam_tpu.camera import CubemapCamera

    # arena-scale problem: same construction LoopCloser._global_ba ships
    cfg = SlamConfig(cube_face_w=160, cube_face_h=160, n_features=600,
                     n_levels=3)
    cam = CubemapCamera.from_config(cfg)
    n_kf, n_pts = 96, 8192
    arena = D.make_synthetic_arena(cfg, cam, n_kf=n_kf, n_pts=n_pts)
    inv_s2 = 1.0 / jnp.asarray(cfg.level_sigma2, jnp.float32)
    prob = D.global_ba_problem_from_arena(cam, arena, inv_s2)
    M = int(prob.R.shape[0])
    P = int(prob.X.shape[0])
    E_live = int(np.asarray(prob.obs_valid).sum())
    print(f"# problem: M={M} cams ({n_kf} live), P={P} points "
          f"({n_pts} live), {E_live} live edges")
    cg = 30
    f4 = 4  # bytes/float

    print(f"{'shards':>6} {'boundary':>9} {'bnd%':>6} "
          f"{'MB/LM-iter (owned)':>19} {'MB/LM-iter (replicated)':>24}")
    for n in (1, 2, 4, 8):
        if n == 1:
            B = 0
        else:
            sharded = D.shard_ba_problem(prob, n, shard_points=True)
            B = sharded.n_boundary
        cam_bytes = (M * 36 + M * 6 + M * 6 + cg * M * 6) * f4
        pt_owned = (B * 9 + B * 3 + cg * B * 3 + B * 3) * f4
        pt_full = (P * 9 + P * 3 + cg * P * 3 + P * 3) * f4
        owned = 0 if n == 1 else (cam_bytes + pt_owned) / 1e6
        repl = 0 if n == 1 else (cam_bytes + pt_full) / 1e6
        live_frac = 100.0 * B / max(n_pts, 1)
        print(f"{n:>6} {B:>9} {live_frac:>5.1f}% "
              f"{owned:>19.3f} {repl:>24.3f}")
    print("# + one P*3 owner-recombine psum per solve "
          f"({P * 3 * f4 / 1e6:.2f} MB), camera-side payloads are "
          "O(M) and independent of the landmark partition")


if __name__ == "__main__":
    main()
