"""Time the per-keyframe mapping-stage device programs at Lafida scale.

Builds a synthetic arena at the working configuration (650^2 faces, 2000
features, K=512/L=65536) with a plausible live set and times each jitted
stage on the actual backend. Round-3 baseline (NOTES_TPU.md): local_ba
4177 ms, update_landmark_stats 161 ms, cull_keyframes 184 ms,
covisibility_matrix 46 ms, triangulate_with_neighbor 41 ms x 6.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu import slam_map as SM
from cubemapslam_tpu.runtime.mapping import MappingKernels


def build_arena(cfg, n_live=64, obs_per_lm=5, seed=0):
    rng = np.random.default_rng(seed)
    K, N, L = cfg.max_keyframes, cfg.n_features, cfg.max_landmarks
    arena = SM.make_arena(K, N, L)
    n_lm = min(L - 1, 20000)
    # poses along a line, keypoints random on the front face
    kf_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    kf_t = np.zeros((K, 3), np.float32)
    kf_t[:n_live, 0] = -0.1 * np.arange(n_live)
    kf_valid = np.zeros(K, bool)
    kf_valid[:n_live] = True
    uv = rng.uniform(cfg.cube_face_w, 2 * cfg.cube_face_w,
                     (K, N, 2)).astype(np.float32)
    face = np.zeros((K, N), np.int32)
    level = rng.integers(0, cfg.n_levels, (K, N)).astype(np.int32)
    desc = rng.integers(0, 2**32, (K, N, 8), dtype=np.uint64).astype(
        np.uint32)
    kp_valid = np.ones((K, N), bool)
    # landmarks ~5m in front, each observed by obs_per_lm consecutive KFs
    lm_pos = rng.normal(0, 2.0, (n_lm, 3)).astype(np.float32)
    lm_pos[:, 2] += 6.0
    lm_valid = np.zeros(L, bool)
    lm_valid[:n_lm] = True
    obs = np.full((K, N), -1, np.int32)
    # each live KF observes a random subset of landmarks
    per_kf = min(N, (n_lm * obs_per_lm) // max(n_live, 1))
    for k in range(n_live):
        ids = rng.choice(n_lm, size=per_kf, replace=False)
        obs[k, :per_kf] = ids
    arena = arena._replace(
        kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
        kf_valid=jnp.asarray(kf_valid),
        kf_frame_id=jnp.asarray(np.arange(K, dtype=np.int32) * 2),
        kf_uv=jnp.asarray(uv), kf_face=jnp.asarray(face),
        kf_level=jnp.asarray(level), kf_desc=jnp.asarray(desc),
        kf_kp_valid=jnp.asarray(kp_valid), kf_obs_lm=jnp.asarray(obs),
        lm_pos=jnp.asarray(
            np.concatenate([lm_pos,
                            np.zeros((L - n_lm, 3), np.float32)])),
        lm_valid=jnp.asarray(lm_valid),
        kf_rays=jnp.asarray(rng.normal(size=(K, N, 3)).astype(np.float32)),
    )
    return arena


def timeit(name, fn, *args, n=3, donates_first=False, **kw):
    """donates_first: first positional arg is donated (copy it per call)."""
    def call():
        a = args
        if donates_first:
            a = (jax.tree.map(lambda x: x.copy(), args[0]),) + args[1:]
        return fn(*a, **kw)
    out = call()
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = call()
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:35s} {min(ts):9.1f} ms  (n={n})", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    cfg = SlamConfig()  # Lafida cam0 defaults
    cam = CubemapCamera.from_config(cfg)
    mk = MappingKernels(cfg, cam)
    arena = build_arena(cfg)
    sf = jnp.asarray(cfg.scale_factors, jnp.float32)

    covis = timeit("covisibility_matrix", jax.jit(SM.covisibility_matrix),
                   arena)
    timeit("update_landmark_stats (full)",
           jax.jit(SM.update_landmark_stats), arena, sf)
    touched = arena.lm_valid & (jnp.arange(cfg.max_landmarks) < 16384)
    timeit("update_landmark_stats_touched",
           jax.jit(SM.update_landmark_stats_touched,
                   static_argnames=("max_touched", "max_obs")),
           arena, sf, touched, max_touched=16384, max_obs=96000)
    timeit("local_ba (direct, compact)", mk.local_ba, arena,
           jnp.int32(10), 48, covis, donates_first=True)
    timeit("cull_keyframes", mk.cull_keyframes, arena, jnp.int32(10),
           covis=covis, donates_first=True)
    timeit("triangulate_with_neighbor x6",
           lambda a: jax.vmap(lambda nb: mk.triangulate_with_neighbor(
               a, jnp.int32(10), nb))(jnp.arange(6, dtype=jnp.int32)),
           arena)
    timeit("mapping_step (fused)", mk.mapping_step, arena, jnp.int32(10),
           jnp.int32(40), jnp.int32(80), n=3, donates_first=True)


if __name__ == "__main__":
    main()


def extra():
    print("backend:", jax.default_backend())
    cfg = SlamConfig()
    cam = CubemapCamera.from_config(cfg)
    mk = MappingKernels(cfg, cam)
    arena = build_arena(cfg)
    timeit("fuse_pair", mk.fuse_pair, arena, jnp.int32(10), jnp.int32(11),
           donates_first=True)
    Xw = jnp.zeros((cfg.n_features, 3))
    ok = jnp.zeros(cfg.n_features, bool)
    idx2 = jnp.zeros(cfg.n_features, jnp.int32)
    timeit("commit_new_landmarks", mk.commit_new_landmarks, arena,
           jnp.int32(10), jnp.int32(11), Xw, ok, idx2, jnp.int32(30),
           jnp.int32(60), donates_first=True)
    timeit("cull_map_points", mk.cull_map_points, arena, jnp.int32(40),
           donates_first=True)
    timeit("triangulate x1",
           lambda a: mk.triangulate_with_neighbor(a, jnp.int32(10),
                                                  jnp.int32(11)), arena)


if __name__ == "__main__" and __import__("sys").argv[-1] == "extra":
    extra()
