"""Prototype: batched cross-level patch/descriptor work via stacked pyramid."""
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
H0, W0 = params.level_hw[0]
NL = params.n_levels
K = sum(params.level_k)
print("total K:", K)


def bench(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms")
    return out


# ---- sub-part timing of current desc path (level 0) ----
k0 = params.level_k[0]
ys0 = jnp.asarray(rng.integers(19, H0 - 19, k0), jnp.int32)
xs0 = jnp.asarray(rng.integers(19, W0 - 19, k0), jnp.int32)
blurred0 = jax.jit(E._blur)(img)
patches37 = jax.jit(lambda im, y, x: E._gather_patches(im, y, x, E.PATCH_R))(blurred0, ys0, xs0)
patches31 = jax.jit(lambda im, y, x: E._gather_patches(im, y, x, E.ORI_R))(img, ys0, xs0)
ang0 = jax.jit(E._ic_angle)(patches31)
bench("gather31 l0", jax.jit(lambda im, y, x: E._gather_patches(im, y, x, E.ORI_R)), img, ys0, xs0)
bench("ic_angle l0 (given patches)", jax.jit(E._ic_angle), patches31)
bench("descriptors l0 (given patches+angles)", jax.jit(E._descriptors), patches37, ang0)

# ---- stacked pyramid approach ----
# keypoints for all levels (random, representative counts)
ys_all, xs_all, lv_all = [], [], []
for lv in range(NL):
    h, w = params.level_hw[lv]
    k = params.level_k[lv]
    ys_all.append(rng.integers(19, h - 19, k))
    xs_all.append(rng.integers(19, w - 19, k))
    lv_all.append(np.full(k, lv))
ys_all = jnp.asarray(np.concatenate(ys_all), jnp.int32)
xs_all = jnp.asarray(np.concatenate(xs_all), jnp.int32)
lv_all = jnp.asarray(np.concatenate(lv_all), jnp.int32)


def build_stack(im):
    """(NL, H0, W0) stacked padded pyramid (raw and blurred)."""
    raw = jnp.zeros((NL, H0, W0), jnp.float32)
    blur = jnp.zeros((NL, H0, W0), jnp.float32)
    img_l = im
    for lv in range(NL):
        h, w = params.level_hw[lv]
        if lv > 0:
            img_l = jax.image.resize(img_l, (h, w), "linear")
        raw = jax.lax.dynamic_update_slice(raw, img_l[None], (lv, 0, 0))
        blur = jax.lax.dynamic_update_slice(blur, E._blur(img_l)[None], (lv, 0, 0))
    return raw, blur

raw_s, blur_s = bench("build stacked pyramid (raw+blur)", jax.jit(build_stack), img)


def gather_stack(stk, lv, ys, xs, radius):
    p = 2 * radius + 1
    def one(l, y, x):
        return jax.lax.dynamic_slice(stk, (l, y, x), (1, p, p))[0]
    return jax.vmap(one)(lv, jnp.maximum(ys - radius, 0), jnp.maximum(xs - radius, 0))

bench("gather31 ALL levels (stacked, one call)",
      jax.jit(lambda s: gather_stack(s, lv_all, ys_all, xs_all, E.ORI_R)), raw_s)
p37 = bench("gather37 ALL levels (stacked, one call)",
            jax.jit(lambda s: gather_stack(s, lv_all, ys_all, xs_all, E.PATCH_R)), blur_s)


def full_desc_path(raw_stk, blur_stk):
    p31 = gather_stack(raw_stk, lv_all, ys_all, xs_all, E.ORI_R)
    ang = E._ic_angle(p31)
    p37 = gather_stack(blur_stk, lv_all, ys_all, xs_all, E.PATCH_R)
    return E._descriptors(p37, ang), ang

bench("angle+desc ALL levels (stacked path)", jax.jit(full_desc_path), raw_s, blur_s)


def end_to_end_stacked(im):
    raw_stk, blur_stk = build_stack(im)
    d, a = full_desc_path(raw_stk, blur_stk)
    return d, a

bench("stack build + angle + desc (end to end)", jax.jit(end_to_end_stacked), img)

# compare: current per-level loop for the same work
def per_level_loop(im):
    img_l = im
    descs, angs = [], []
    o = 0
    for lv in range(NL):
        h, w = params.level_hw[lv]
        k = params.level_k[lv]
        if lv > 0:
            img_l = jax.image.resize(img_l, (h, w), "linear")
        ys = ys_all[o:o + k]
        xs = xs_all[o:o + k]
        o += k
        raw = E._gather_patches(img_l, ys, xs, E.ORI_R)
        ang = E._ic_angle(raw)
        blurred = E._blur(img_l)
        bp = E._gather_patches(blurred, ys, xs, E.PATCH_R)
        descs.append(E._descriptors(bp, ang))
        angs.append(ang)
    return jnp.concatenate(descs), jnp.concatenate(angs)

bench("per-level loop (current path, same work)", jax.jit(per_level_loop), img)

# verify equivalence
d1, a1 = jax.jit(end_to_end_stacked)(img)
d2, a2 = jax.jit(per_level_loop)(img)
print("desc equal:", bool(jnp.all(d1 == d2)), "angle close:",
      bool(jnp.allclose(a1, a2, atol=1e-5)))
