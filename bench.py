"""Benchmark: tracked frames/s per chip for the per-frame tracking pipeline.

Measures the hot path of the reference protocol (median tracking time per
frame, Examples/cubemap_lafida.cpp:145-168): fisheye->cubemap warp + ORB
extraction + landmark projection matching + pose optimization, at the Lafida
cam0 working configuration (650^2 faces, 2000 features, 8 levels).

The warp runs on host threads via the native C++ plan (the reference's
cv::remap architecture) overlapped with device compute; the device step is
one jitted program (extract -> match -> pose optimization).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the 30 frames/s camera rate the reference targets
("real-time", README.md:53) — the repo records no concrete C++ number
(BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from cubemapslam_tpu.config import SlamConfig
    from cubemapslam_tpu.camera import CubemapCamera, cubemap_uv_to_in_face
    from cubemapslam_tpu import geometry as G
    from cubemapslam_tpu import matching as M
    from cubemapslam_tpu import warp as W
    from cubemapslam_tpu.features.extractor import extract_orb, plan_levels
    from cubemapslam_tpu.optim.pose_opt import pose_optimization

    cfg = SlamConfig()  # Lafida cam0 defaults: 650^2 faces, 2000 features
    cam = CubemapCamera.from_config(cfg)
    params = plan_levels(cfg.n_features, cfg.n_levels, cfg.scale_factor,
                         (cfg.cube_h, cfg.cube_w))
    scale_factors = jnp.asarray(cfg.scale_factors, jnp.float32)
    inv_sigma2 = 1.0 / jnp.asarray(cfg.level_sigma2, jnp.float32)
    wm = W.build_warp_map(cam, cfg.cube_w, cfg.cube_h)

    @jax.jit
    def frame_step(cube, lm_pos, lm_desc, lm_level, lm_valid, R0, t0):
        kp = extract_orb(params, cam, cube,
                         ini_th=cfg.ini_th_fast, min_th=cfg.min_th_fast)
        Xc = G.se3_apply(R0, t0, lm_pos)
        res = M.search_by_projection(
            Xc, lm_desc, lm_level, lm_valid, kp, cam, scale_factors,
            15.0, level_lo_off=-1, level_hi_off=1)
        assoc = jnp.full((kp.n,), -1, jnp.int32).at[res.idx].max(
            jnp.where(res.ok,
                      jnp.arange(lm_pos.shape[0], dtype=jnp.int32), -1))
        has = assoc >= 0
        Xw = lm_pos[jnp.maximum(assoc, 0)]
        uv_face = cubemap_uv_to_in_face(cam, kp.uv)
        inv_s2 = inv_sigma2[jnp.clip(kp.level, 0, cfg.n_levels - 1)]
        R, t, inl, n = pose_optimization(cam, R0, t0, Xw, kp.face,
                                         uv_face, inv_s2, has)
        return R, t, n

    from cubemapslam_tpu.native import NativeWarp
    rng = np.random.default_rng(0)
    fisheye = rng.uniform(
        0, 255, (cfg.fisheye_height, cfg.fisheye_width)).astype(np.float32)
    native_warp = NativeWarp(wm, n_threads=6)
    n_lm = 8192
    d = rng.normal(size=(n_lm, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    lm_pos = jnp.asarray(d * rng.uniform(3, 8, (n_lm, 1)), jnp.float32)
    lm_desc = jnp.asarray(
        rng.integers(0, 2 ** 32, (n_lm, 8), dtype=np.uint32))
    lm_level = jnp.zeros(n_lm, jnp.int32)
    lm_valid = jnp.ones(n_lm, bool)
    R0 = jnp.eye(3)
    t0 = jnp.zeros(3)

    # warmup / compile
    cube = jnp.asarray(native_warp(fisheye))
    out = frame_step(cube, lm_pos, lm_desc, lm_level, lm_valid, R0, t0)
    jax.block_until_ready(out)

    # steady state: host warps frame k+1 while the device runs frame k
    from concurrent.futures import ThreadPoolExecutor
    n_iters = 20
    pool = ThreadPoolExecutor(1)
    t_start = time.perf_counter()
    fut = pool.submit(native_warp, fisheye)
    for _ in range(n_iters):
        cube_np = fut.result()
        fut = pool.submit(native_warp, fisheye)
        out = frame_step(jnp.asarray(cube_np), lm_pos, lm_desc, lm_level,
                         lm_valid, R0, t0)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t_start) / n_iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "tracking_frames_per_second_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
