"""Per-stage timing of the REAL fused per-frame tracking program at the
Lafida working scale (650^2 faces, 2000 features, K=512/L=65536 arena).

The older profile_stages.py times a simplified pipeline (no TrackLocalMap,
no arena) — this one times track_frame_full and each of its sub-programs
against a populated arena, which is what the bench actually pays per frame.
Run on the TPU: python scripts/profile_track.py
"""

import os
import sys
import time

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
    from cubemapslam_tpu.camera import CubemapCamera
    from cubemapslam_tpu.runtime.kernels import TrackingKernels
    from cubemapslam_tpu import slam_map as SM
    from cubemapslam_tpu.dist import make_synthetic_arena
    from cubemapslam_tpu.features.extractor import Keypoints

    cfg = SlamConfig()
    cam = CubemapCamera.from_config(cfg)
    k = TrackingKernels(cfg, cam)

    # populated arena at full capacity shapes: 48 live KFs, ~12k landmarks
    small = make_synthetic_arena(cfg, cam, n_kf=48, n_pts=12288, seed=0)
    arena = SM.make_arena(cfg.max_keyframes, cfg.n_features,
                          cfg.max_landmarks)
    arena = arena._replace(
        **{f: arena._asdict()[f].at[:small._asdict()[f].shape[0]].set(
            small._asdict()[f]) for f in arena._fields})
    arena = SM.update_landmark_stats(
        arena, jnp.asarray(cfg.scale_factors, jnp.float32))

    rng = np.random.default_rng(1)
    N = cfg.n_features
    kp = Keypoints(
        uv=jnp.asarray(arena.kf_uv[0]),
        response=jnp.ones(N), angle=jnp.asarray(arena.kf_angle[0]),
        level=jnp.asarray(arena.kf_level[0]),
        face=jnp.asarray(arena.kf_face[0]),
        desc=jnp.asarray(arena.kf_desc[0]),
        rays=jnp.asarray(arena.kf_rays[0]),
        valid=jnp.asarray(arena.kf_kp_valid[0]))
    last_assoc = jnp.asarray(arena.kf_obs_lm[0])
    last_out = jnp.zeros(N, bool)

    def timeit(name, fn, *args, reps=10, **kw):
        out = fn(*args, **kw)
        # value-sync (block_until_ready acks early over the axon tunnel)
        leaf = [x for x in jax.tree.leaves(out) if hasattr(x, "ravel")][0]
        np.asarray(leaf.ravel()[:4])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args, **kw)
        leaf = [x for x in jax.tree.leaves(out) if hasattr(x, "ravel")][0]
        np.asarray(leaf.ravel()[:4])
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:32s}: {dt:8.2f} ms", flush=True)
        return dt

    eye, zero = jnp.eye(3), jnp.zeros(3)

    timeit("covisibility_matrix",
           jax.jit(SM.covisibility_matrix), arena)
    timeit("observation_counts",
           jax.jit(SM.observation_counts), arena)
    timeit("select_local_landmarks",
           k.select_local_landmarks, arena, last_assoc)
    sel, sel_ok, _, _, _ = k.select_local_landmarks(arena, last_assoc)
    timeit("search_local_points",
           k.search_local_points, arena, kp, last_assoc, sel, sel_ok,
           eye, zero)
    timeit("optimize_pose",
           k.optimize_pose, arena, kp, last_assoc, eye, zero)
    timeit("track_motion_fused",
           k.track_motion_fused, arena, kp, last_assoc, last_out,
           kp.level, kp.angle, eye, zero)
    # track_local_fused donates the arena — chain the output arena
    out = k.track_local_fused(arena, kp, last_assoc, last_out, eye, zero)
    np.asarray(out[5].ravel()[:1])
    a = out[0]
    t0 = time.perf_counter()
    for _ in range(10):
        out = k.track_local_fused(a, kp, last_assoc, last_out, eye, zero)
        a = out[0]
    np.asarray(out[5].ravel()[:1])
    print(f"{'track_local_fused':32s}: "
          f"{(time.perf_counter() - t0) / 10 * 1e3:8.2f} ms", flush=True)
    arena = a

    timeit("graph_cache", k.graph_cache, arena)
    covis_c, cnt_c = k.graph_cache(arena)

    # track_frame_full donates the arena — chain the output arena through
    # the reps (exactly what the real frame loop does)
    def full_once(a):
        return k.track_frame_full(
            a, kp, last_assoc, last_out, kp.level, kp.angle,
            eye, zero, jnp.int32(0), eye, zero, jnp.float32(1.0),
            jnp.int32(0), covis_c, cnt_c)

    out = full_once(arena)
    np.asarray(out[5].ravel()[:4])
    a = out[0]
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = full_once(a)
        a = out[0]
    np.asarray(out[5].ravel()[:4])
    print(f"{'track_frame_full':32s}: "
          f"{(time.perf_counter() - t0) / reps * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
