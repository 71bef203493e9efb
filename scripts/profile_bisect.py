"""Bisect where the per-level desc loop loses time: fusion pathologies."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu.features import extractor as E

cfg = SlamConfig()
cam = CubemapCamera.from_config(cfg)
params = E.plan_levels(cfg.n_features, cfg.n_levels, cfg.scale_factor,
                       (cfg.cube_h, cfg.cube_w))
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (cfg.cube_h, cfg.cube_w)).astype(np.float32))
NL = params.n_levels

ys_l, xs_l = [], []
for lv in range(NL):
    h, w = params.level_hw[lv]
    k = params.level_k[lv]
    ys_l.append(jnp.asarray(rng.integers(19, h - 19, k), jnp.int32))
    xs_l.append(jnp.asarray(rng.integers(19, w - 19, k), jnp.int32))


def bench(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {dt:8.2f} ms")
    return out


def loop(im, do_blur=True, do_gather=True, do_angle=True, do_desc=True,
         barrier=False):
    img_l = im
    outs = []
    for lv in range(NL):
        h, w = params.level_hw[lv]
        if lv > 0:
            img_l = jax.image.resize(img_l, (h, w), "linear")
        cur = img_l
        if barrier:
            cur = jax.lax.optimization_barrier(cur)
        ys, xs = ys_l[lv], xs_l[lv]
        ang = None
        if do_gather:
            raw = E._gather_patches(cur, ys, xs, E.ORI_R)
            if do_angle:
                ang = E._ic_angle(raw)
            else:
                outs.append(raw.sum())
        if do_blur:
            blurred = E._blur(cur)
            if barrier:
                blurred = jax.lax.optimization_barrier(blurred)
            if do_gather:
                bp = E._gather_patches(blurred, ys, xs, E.PATCH_R)
                if do_desc and ang is not None:
                    outs.append(E._descriptors(bp, ang).sum())
                else:
                    outs.append(bp.sum())
            else:
                outs.append(blurred.sum())
        elif ang is not None:
            outs.append(ang.sum())
    return jnp.stack([o.astype(jnp.float32) for o in outs])


import functools
bench("resize+blur only", jax.jit(functools.partial(loop, do_gather=False)), img)
bench("resize+gather31+angle only (no blur)",
      jax.jit(functools.partial(loop, do_blur=False)), img)
bench("resize+gather31 only (no angle/blur)",
      jax.jit(functools.partial(loop, do_blur=False, do_angle=False)), img)
bench("resize+blur+gather37 (no desc)",
      jax.jit(functools.partial(loop, do_desc=False, do_angle=False)), img)
bench("full loop", jax.jit(loop), img)
bench("full loop + barriers", jax.jit(functools.partial(loop, barrier=True)), img)
