"""Benchmark: tracked frames/s per chip for the per-frame tracking pipeline.

Measures the hot path of the reference protocol (median tracking time per
frame, Examples/cubemap_lafida.cpp:145-168): fisheye->cubemap warp + ORB
extraction + landmark projection matching + pose optimization, at the Lafida
cam0 working configuration (650^2 faces, 2000 features, 8 levels).

Pipeline shape (tuned for the TPU tunnel this runs over, where host->device
transfers serialize with executes, i.e. upload cost ~ bytes):
  * the RAW fisheye uploads as uint8 (0.36MB vs 2.1MB warped faces);
  * the warp runs ON DEVICE via the pallas two-pass/exact tile kernels
    (cubemapslam_tpu/warp_tpu.py, ~1.3ms), fused into the same jitted
    program as face assembly + extract + match + pose optimization;
  * frames run depth-4 pipelined, syncing only on the scalar inlier count
    4 frames back.

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
    from cubemapslam_tpu import warp_tpu as WT
    from cubemapslam_tpu.features.extractor import extract_orb, plan_levels
    from cubemapslam_tpu.optim.pose_opt import pose_optimization

    cfg = SlamConfig()  # Lafida cam0 defaults: 650^2 faces, 2000 features
    cam = CubemapCamera.from_config(cfg)
    params = plan_levels(cfg.n_features, cfg.n_levels, cfg.scale_factor,
                         (cfg.cube_h, cfg.cube_w))
    scale_factors = jnp.asarray(cfg.scale_factors, jnp.float32)
    inv_sigma2 = 1.0 / jnp.asarray(cfg.level_sigma2, jnp.float32)
    dw = WT.DeviceWarp(cam, cfg.cube_w, cfg.cube_h)

    FW, FH = cfg.cube_face_w, cfg.cube_face_h
    OFF = [(1, 1), (0, 1), (2, 1), (1, 0), (1, 2)]  # cross layout offsets

    @jax.jit
    def frame_step(fisheye_u8, wargs, lm_pos, lm_desc, lm_level, lm_valid,
                   R0, t0):
        faces = WT.warp_faces_device(dw.plan, wargs, fisheye_u8)
        cube = jnp.zeros((cfg.cube_h, cfg.cube_w), jnp.float32)
        for i, (ox, oy) in enumerate(OFF):
            cube = jax.lax.dynamic_update_slice(cube, faces[i],
                                                (oy * FH, ox * FW))
        kp = extract_orb(params, cam, cube,
                         ini_th=cfg.ini_th_fast, min_th=cfg.min_th_fast)
        Xc = G.se3_apply(R0, t0, lm_pos)
        res = M.search_by_projection(
            Xc, lm_desc, lm_level, lm_valid, kp, cam, scale_factors,
            15.0, level_lo_off=-1, level_hi_off=1)
        assoc = jnp.full((kp.n,), -1, jnp.int32).at[res.idx].max(
            jnp.where(res.ok,
                      jnp.arange(lm_pos.shape[0], dtype=jnp.int32), -1))
        Xw = lm_pos[jnp.maximum(assoc, 0)]
        uv_face = cubemap_uv_to_in_face(cam, kp.uv)
        inv_s2 = inv_sigma2[jnp.clip(kp.level, 0, cfg.n_levels - 1)]
        R, t, inl, n = pose_optimization(cam, R0, t0, Xw, kp.face,
                                         uv_face, inv_s2, assoc >= 0)
        return R, t, n

    rng = np.random.default_rng(0)
    # 4 distinct frames cycled (identical inputs could hide work behind
    # any transport-level memoization; real sequences vary every frame)
    fisheyes = [rng.uniform(0, 255, (cfg.fisheye_height, cfg.fisheye_width)
                            ).astype(np.uint8) for _ in range(4)]

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
    out = frame_step(fisheyes[0], dw.args, lm_pos, lm_desc, lm_level,
                     lm_valid, R0, t0)
    _ = int(out[2])

    # Pipelined steady state: dispatch is async; the only sync is pulling
    # the scalar inlier count of the frame DEPTH back. fps is reported from
    # the MEDIAN frame-to-frame time (the reference's headline metric is
    # median tracking time, cubemap_lafida.cpp:167, and the tunnel adds
    # heavy-tailed jitter).
    import collections

    DEPTH = 4
    n_iters = 80
    inflight = collections.deque()
    times = []
    t_prev = time.perf_counter()
    for i in range(n_iters):
        cur = frame_step(fisheyes[i % 4], dw.args, lm_pos, lm_desc,
                         lm_level, lm_valid, R0, t0)
        cur[2].copy_to_host_async()
        inflight.append(cur)
        if len(inflight) >= DEPTH:
            _ = int(inflight.popleft()[2])
        t_now = time.perf_counter()
        times.append(t_now - t_prev)
        t_prev = t_now
    while inflight:
        _ = int(inflight.popleft()[2])
    dt = float(np.median(times[DEPTH:]))
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "tracking_frames_per_second_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
