"""Per-stage TPU timing breakdown of the frame step (dev tool)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.camera import CubemapCamera, cubemap_uv_to_in_face
from cubemapslam_tpu import geometry as G
from cubemapslam_tpu import matching as M
from cubemapslam_tpu.features import extractor as E
from cubemapslam_tpu.optim.pose_opt import pose_optimization

cfg = SlamConfig()
cam = CubemapCamera.from_config(cfg)
params = E.plan_levels(cfg.n_features, cfg.n_levels, cfg.scale_factor,
                       (cfg.cube_h, cfg.cube_w))
print("level budgets:", params.level_k)
print("level shapes:", params.level_hw)

rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (cfg.cube_h, cfg.cube_w)).astype(np.float32))


def bench(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:8.2f} ms")
    return out


# full extract
full = jax.jit(lambda im: E.extract_orb(params, cam, im, ini_th=cfg.ini_th_fast,
                                        min_th=cfg.min_th_fast))
bench("extract_orb (full)", full, img)

# stage: pyramid resizes only
def pyramid(im):
    outs = []
    img_l = im
    for lv in range(params.n_levels):
        h, w = params.level_hw[lv]
        if lv > 0:
            img_l = jax.image.resize(img_l, (h, w), "linear")
        outs.append(img_l.sum())
    return jnp.stack(outs)
bench("pyramid resizes", jax.jit(pyramid), img)

# stage: FAST + NMS + topk on level 0 only
def fast_l0(im):
    score = E._fast_adaptive(im, cfg.ini_th_fast, cfg.min_th_fast, params.cell)
    score = E._nms3(score)
    return E._topk_grid(score, params.cell, params.level_k[0])
bench("FAST+NMS+topk level0", jax.jit(fast_l0), img)

def fast_only(im):
    return E._fast_adaptive(im, cfg.ini_th_fast, cfg.min_th_fast, params.cell)
bench("FAST adaptive level0", jax.jit(fast_only), img)

def nms_topk(im):
    score = E._nms3(im)
    return E._topk_grid(score, params.cell, params.level_k[0])
score0 = jax.jit(fast_only)(img)
bench("NMS+topk level0 (given score)", jax.jit(nms_topk), score0)

# all-level FAST+NMS+topk
def fast_all(im):
    img_l = im
    outs = []
    for lv in range(params.n_levels):
        h, w = params.level_hw[lv]
        if lv > 0:
            img_l = jax.image.resize(img_l, (h, w), "linear")
        score = E._fast_adaptive(img_l, cfg.ini_th_fast, cfg.min_th_fast, params.cell)
        score = E._nms3(score)
        outs.append(E._topk_grid(score, params.cell, params.level_k[lv]))
    return outs
bench("FAST+NMS+topk ALL levels (incl resize)", jax.jit(fast_all), img)

# blur all levels
def blur_all(im):
    img_l = im
    outs = []
    for lv in range(params.n_levels):
        h, w = params.level_hw[lv]
        if lv > 0:
            img_l = jax.image.resize(img_l, (h, w), "linear")
        outs.append(E._blur(img_l).sum())
    return jnp.stack(outs)
bench("blur ALL levels (incl resize)", jax.jit(blur_all), img)

# patches + angle + desc, level 0
k0 = params.level_k[0]
ys = jnp.asarray(rng.integers(19, params.level_hw[0][0] - 19, k0), jnp.int32)
xs = jnp.asarray(rng.integers(19, params.level_hw[0][1] - 19, k0), jnp.int32)

def patches_l0(im, ys, xs):
    raw = E._gather_patches(im, ys, xs, E.ORI_R)
    ang = E._ic_angle(raw)
    blurred = E._blur(im)
    bp = E._gather_patches(blurred, ys, xs, E.PATCH_R)
    return E._descriptors(bp, ang)
bench("patches+angle+blur+desc level0", jax.jit(patches_l0), img, ys, xs)

def patches_only(im, ys, xs):
    return E._gather_patches(im, ys, xs, E.PATCH_R).sum()
bench("gather 37x37 patches level0", jax.jit(patches_only), img, ys, xs)

# matching + pose opt with realistic sizes
kp = full(img)
NL = 2000
lm_pos = jnp.asarray(rng.normal(0, 5, (NL, 3)), jnp.float32)
lm_desc = jnp.asarray(rng.integers(0, 2**32, (NL, 8), dtype=np.uint64).astype(np.uint32))
lm_level = jnp.zeros((NL,), jnp.int32)
lm_valid = jnp.ones((NL,), bool)
R0 = jnp.eye(3, dtype=jnp.float32)
t0_ = jnp.zeros(3, jnp.float32)
scale_factors = jnp.asarray(cfg.scale_factors, jnp.float32)
inv_sigma2 = 1.0 / jnp.asarray(cfg.level_sigma2, jnp.float32)

def match_fn(kp, lm_pos):
    Xc = G.se3_apply(R0, t0_, lm_pos)
    return M.search_by_projection(Xc, lm_desc, lm_level, lm_valid, kp, cam,
                                  scale_factors, 15.0, level_lo_off=-1, level_hi_off=1)
res = bench("search_by_projection", jax.jit(match_fn), kp, lm_pos)

def pose_fn(kp, lm_pos):
    res = match_fn(kp, lm_pos)
    assoc = jnp.full((kp.n,), -1, jnp.int32).at[res.idx].max(
        jnp.where(res.ok, jnp.arange(NL, dtype=jnp.int32), -1))
    Xw = lm_pos[jnp.maximum(assoc, 0)]
    uv_face = cubemap_uv_to_in_face(cam, kp.uv)
    inv_s2 = inv_sigma2[jnp.clip(kp.level, 0, cfg.n_levels - 1)]
    return pose_optimization(cam, R0, t0_, Xw, kp.face, uv_face, inv_s2, assoc >= 0)
bench("match + pose_optimization", jax.jit(pose_fn), kp, lm_pos)
