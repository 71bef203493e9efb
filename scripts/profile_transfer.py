"""Measure host->device transfer and device-warp costs over the tunnel.

Compares the two frame-ingest strategies:
  A) host warp (native C++) + upload 5 cube faces u8 (2.1 MB)
  B) upload raw fisheye u8 (0.36 MB) + device warp_bilinear
Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_transfer.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu import warp as W


def timeit(fn, reps=20):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    cfg = SlamConfig()
    cam = CubemapCamera.from_config(cfg)
    wm = W.build_warp_map(cam, cfg.cube_w, cfg.cube_h)
    rng = np.random.default_rng(0)

    fisheye_u8 = rng.integers(0, 255, (cfg.fisheye_height, cfg.fisheye_width), dtype=np.uint8)
    faces_u8 = rng.integers(0, 255, (5, cfg.cube_face_h, cfg.cube_face_w),
                            dtype=np.uint8)
    print(f"fisheye bytes: {fisheye_u8.nbytes/1e6:.2f} MB, "
          f"faces bytes: {faces_u8.nbytes/1e6:.2f} MB")

    dev = jax.devices()[0]
    print(f"upload fisheye u8 : {timeit(lambda: jax.device_put(fisheye_u8, dev)):7.2f} ms")
    print(f"upload faces u8   : {timeit(lambda: jax.device_put(faces_u8, dev)):7.2f} ms")

    fe_dev = jax.device_put(fisheye_u8, dev)

    @jax.jit
    def dev_warp(fe_u8):
        return W.warp_bilinear(fe_u8.astype(jnp.float32), wm)

    out = dev_warp(fe_dev)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = dev_warp(fe_dev)
    jax.block_until_ready(out)
    print(f"device warp       : {(time.perf_counter()-t0)/20*1e3:7.2f} ms")

    # dispatch overhead: trivial jitted fn round-trip
    @jax.jit
    def tiny(x):
        return x + 1

    x = jax.device_put(np.zeros((8,), np.float32), dev)
    jax.block_until_ready(tiny(x))
    t0 = time.perf_counter()
    for _ in range(50):
        y = tiny(x)
        jax.block_until_ready(y)
    print(f"rpc round-trip    : {(time.perf_counter()-t0)/50*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
