"""Per-stage device timing for the tracking hot path (diagnostic, not a test).

Times each jitted stage of the bench pipeline in isolation on the real chip:
face reassembly, ORB extraction, projection matching, pose optimization,
and the fused frame step. Run: python scripts/profile_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.camera import CubemapCamera, cubemap_uv_to_in_face
from cubemapslam_tpu import geometry as G
from cubemapslam_tpu import matching as M
from cubemapslam_tpu.features.extractor import extract_orb, plan_levels
from cubemapslam_tpu.optim.pose_opt import pose_optimization


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    cfg = SlamConfig()
    cam = CubemapCamera.from_config(cfg)
    params = plan_levels(cfg.n_features, cfg.n_levels, cfg.scale_factor,
                         (cfg.cube_h, cfg.cube_w))
    scale_factors = jnp.asarray(cfg.scale_factors, jnp.float32)
    inv_sigma2 = 1.0 / jnp.asarray(cfg.level_sigma2, jnp.float32)

    FW, FH = cfg.cube_face_w, cfg.cube_face_h
    OFF = [(1, 1), (0, 1), (2, 1), (1, 0), (1, 2)]

    rng = np.random.default_rng(0)
    faces_u8 = jnp.asarray(
        rng.integers(0, 255, (5, FH, FW), dtype=np.uint8))
    n_lm = 4096
    d = rng.normal(size=(n_lm, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    lm_pos = jnp.asarray(d * rng.uniform(3, 8, (n_lm, 1)), jnp.float32)
    lm_desc = jnp.asarray(rng.integers(0, 2 ** 32, (n_lm, 8),
                                       dtype=np.uint32))
    lm_level = jnp.zeros(n_lm, jnp.int32)
    lm_valid = jnp.ones(n_lm, bool)
    R0 = jnp.eye(3)
    t0v = jnp.zeros(3)

    @jax.jit
    def assemble(faces_u8):
        cube = jnp.zeros((cfg.cube_h, cfg.cube_w), jnp.float32)
        f = faces_u8.astype(jnp.float32)
        for i, (ox, oy) in enumerate(OFF):
            cube = jax.lax.dynamic_update_slice(cube, f[i], (oy * FH, ox * FW))
        return cube

    @jax.jit
    def extract(cube):
        return extract_orb(params, cam, cube, ini_th=cfg.ini_th_fast,
                           min_th=cfg.min_th_fast)

    cube = assemble(faces_u8)
    kp = extract(cube)

    @jax.jit
    def match(kp_in, lm_pos, lm_desc, lm_level, lm_valid, R0, t0):
        Xc = G.se3_apply(R0, t0, lm_pos)
        return M.search_by_projection(
            Xc, lm_desc, lm_level, lm_valid, kp_in, cam, scale_factors,
            15.0, level_lo_off=-1, level_hi_off=1)

    res = match(kp, lm_pos, lm_desc, lm_level, lm_valid, R0, t0v)

    @jax.jit
    def pose(kp_in, res_ok, res_idx, lm_pos, R0, t0):
        assoc = jnp.full((kp_in.n,), -1, jnp.int32).at[res_idx].max(
            jnp.where(res_ok, jnp.arange(lm_pos.shape[0], dtype=jnp.int32),
                      -1))
        has = assoc >= 0
        Xw = lm_pos[jnp.maximum(assoc, 0)]
        uv_face = cubemap_uv_to_in_face(cam, kp_in.uv)
        inv_s2 = inv_sigma2[jnp.clip(kp_in.level, 0, cfg.n_levels - 1)]
        return pose_optimization(cam, R0, t0, Xw, kp_in.face, uv_face,
                                 inv_s2, has)

    print(f"assemble : {timeit(assemble, faces_u8):7.2f} ms")
    print(f"extract  : {timeit(extract, cube):7.2f} ms")
    print(f"match    : {timeit(match, kp, lm_pos, lm_desc, lm_level, lm_valid, R0, t0v):7.2f} ms")
    print(f"pose_opt : {timeit(pose, kp, res.ok, res.idx, lm_pos, R0, t0v):7.2f} ms")

    @jax.jit
    def full(faces_u8, lm_pos, lm_desc, lm_level, lm_valid, R0, t0):
        cube = jnp.zeros((cfg.cube_h, cfg.cube_w), jnp.float32)
        f = faces_u8.astype(jnp.float32)
        for i, (ox, oy) in enumerate(OFF):
            cube = jax.lax.dynamic_update_slice(cube, f[i], (oy * FH, ox * FW))
        kp_in = extract_orb(params, cam, cube, ini_th=cfg.ini_th_fast,
                            min_th=cfg.min_th_fast)
        Xc = G.se3_apply(R0, t0, lm_pos)
        r = M.search_by_projection(
            Xc, lm_desc, lm_level, lm_valid, kp_in, cam, scale_factors,
            15.0, level_lo_off=-1, level_hi_off=1)
        assoc = jnp.full((kp_in.n,), -1, jnp.int32).at[r.idx].max(
            jnp.where(r.ok, jnp.arange(lm_pos.shape[0], dtype=jnp.int32),
                      -1))
        has = assoc >= 0
        Xw = lm_pos[jnp.maximum(assoc, 0)]
        uv_face = cubemap_uv_to_in_face(cam, kp_in.uv)
        inv_s2 = inv_sigma2[jnp.clip(kp_in.level, 0, cfg.n_levels - 1)]
        R, t, inl, n = pose_optimization(cam, R0, t0, Xw, kp_in.face,
                                         uv_face, inv_s2, has)
        return R, t, n

    print(f"full step: {timeit(full, faces_u8, lm_pos, lm_desc, lm_level, lm_valid, R0, t0v):7.2f} ms")


if __name__ == "__main__":
    main()
