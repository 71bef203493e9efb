"""Multi-PROCESS distributed global-BA worker (SURVEY.md §2.3/§7 step 10).

Each process owns ONE CPU device and joins a jax.distributed coordinator —
the single-host stand-in for the multi-host DCN deployment (SURVEY §4(e):
multi-process on one host). Every process builds the same arena-derived
global-BA problem deterministically, the edge list is sharded one keyframe
block per process, and distributed_bundle_adjust runs as one SPMD program
over the global mesh: segment-sums into the camera/point tables are
psum-reduced across processes, so each process touches only its own edges
while the solved state is replicated everywhere.

Usage (spawned by tests/test_dist_multiprocess.py):
    python scripts/multihost_ba_worker.py COORD_ADDR NUM_PROCS PROC_ID OUT
"""
import os
import sys


def main():
    coord, nprocs, pid, out_path = (sys.argv[1], int(sys.argv[2]),
                                    int(sys.argv[3]), sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    # one CPU device per process: the process boundary IS the "host"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=1")

    import jax
    # the axon sitecustomize (TPU tunnel) may have pre-set the platform
    # list at interpreter start — force CPU the way tests/conftest.py does
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cubemapslam_tpu.config import SlamConfig
    from cubemapslam_tpu.camera import CubemapCamera
    from cubemapslam_tpu import dist as D
    from cubemapslam_tpu.optim.ba import BAProblem, bundle_adjust

    assert len(jax.devices()) == nprocs, (len(jax.devices()), nprocs)
    assert len(jax.local_devices()) == 1

    cfg = SlamConfig(cube_face_w=64, cube_face_h=64, n_features=64,
                     n_levels=2)
    cam = CubemapCamera.from_config(cfg)
    arena = D.make_synthetic_arena(cfg, cam, n_kf=8, n_pts=96)
    inv_s2 = 1.0 / jnp.asarray(cfg.level_sigma2, jnp.float32)
    prob = D.global_ba_problem_from_arena(cam, arena, inv_s2)
    prob_sharded = D.shard_ba_problem(prob, nprocs)

    # lift the (identical-everywhere) host arrays into GLOBAL arrays on
    # the multi-process mesh: edge arrays sharded by keyframe block,
    # camera/point tables replicated
    mesh = D.make_mesh()
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(D.AXIS))
    specs = BAProblem(
        R=rep, t=rep, cam_fixed=rep, cam_valid=rep, X=rep, pt_valid=rep,
        obs_cam=shd, obs_pt=shd, obs_face=shd, obs_uv=shd,
        obs_inv_sigma2=shd, obs_valid=shd)
    prob_g = jax.tree.map(jax.device_put, prob_sharded, specs)

    out, inl = D.distributed_bundle_adjust(cam, prob_g, mesh,
                                           phase_iters=(2, 2), cg_iters=8)
    jax.block_until_ready(out.R)

    # replicated outputs: every process holds the full state
    R_d = np.asarray(jax.device_get(out.R))
    X_d = np.asarray(jax.device_get(out.X))

    # single-process reference on the SAME sharded-order problem
    ref, _ = jax.jit(lambda p: bundle_adjust(
        cam, p, phase_iters=(2, 2), cg_iters=8))(prob_sharded)
    R_s = np.asarray(ref.R)
    X_s = np.asarray(ref.X)

    dR = float(np.abs(R_d - R_s).max())
    dX = float(np.abs(X_d - X_s).max())
    ok = (np.isfinite(R_d).all() and np.isfinite(X_d).all()
          and dR < 1e-3 and dX < 1e-2)
    with open(f"{out_path}.{pid}", "w") as f:
        f.write(f"ok={int(ok)} dR={dR:.3e} dX={dX:.3e} "
                f"nglobal={len(jax.devices())}\n")
    jax.distributed.shutdown()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
