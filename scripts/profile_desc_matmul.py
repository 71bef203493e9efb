"""Prototype: descriptor bits via one MXU matmul over rotation-binned patterns."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu.features import extractor as E
from cubemapslam_tpu.features.pattern import orb_pattern

cfg = SlamConfig()
cam = CubemapCamera.from_config(cfg)
params = E.plan_levels(cfg.n_features, cfg.n_levels, cfg.scale_factor,
                       (cfg.cube_h, cfg.cube_w))
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (cfg.cube_h, cfg.cube_w)).astype(np.float32))
NL = params.n_levels
P = E._PATCH  # 37

N_ROT = 32


def build_D(n_rot=N_ROT, dtype=np.float32):
    pat = orb_pattern().astype(np.float64)  # (256,4) x1,y1,x2,y2
    D = np.zeros((n_rot, P * P, 256), np.float32)
    for b in range(n_rot):
        th = 2 * np.pi * b / n_rot
        ca, sa = np.cos(th), np.sin(th)
        for s in range(256):
            x1, y1, x2, y2 = pat[s]
            rx1 = int(np.round(x1 * ca - y1 * sa)); ry1 = int(np.round(x1 * sa + y1 * ca))
            rx2 = int(np.round(x2 * ca - y2 * sa)); ry2 = int(np.round(x2 * sa + y2 * ca))
            i1 = (np.clip(ry1 + E.PATCH_R, 0, P - 1)) * P + np.clip(rx1 + E.PATCH_R, 0, P - 1)
            i2 = (np.clip(ry2 + E.PATCH_R, 0, P - 1)) * P + np.clip(rx2 + E.PATCH_R, 0, P - 1)
            D[b, i2, s] += 1.0
            D[b, i1, s] -= 1.0
    return D.transpose(1, 0, 2).reshape(P * P, n_rot * 256).astype(dtype)


D_np = build_D()
D = jnp.asarray(D_np)
print("D shape:", D.shape, "MB:", D_np.nbytes / 1e6)


def desc_matmul(patches_flat, angles, Dmat):
    K = patches_flat.shape[0]
    scores = patches_flat @ Dmat                       # (K, NB*256)
    nb = Dmat.shape[1] // 256
    bins = jnp.mod(jnp.round(angles * (nb / (2 * np.pi))).astype(jnp.int32), nb)
    sc = scores.reshape(K, nb, 256)
    t = jnp.take_along_axis(sc, bins[:, None, None], axis=1)[:, 0, :]
    return E._pack_bits((t > 0).astype(jnp.uint32))


# per-level keypoints (same as earlier profile)
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


def loop(im, use_matmul, dmat=None):
    img_l = im
    descs = []
    for lv in range(NL):
        h, w = params.level_hw[lv]
        if lv > 0:
            img_l = jax.image.resize(img_l, (h, w), "linear")
        ys, xs = ys_l[lv], xs_l[lv]
        raw = E._gather_patches(img_l, ys, xs, E.ORI_R)
        ang = E._ic_angle(raw)
        blurred = E._blur(img_l)
        bp = E._gather_patches(blurred, ys, xs, E.PATCH_R)
        if use_matmul:
            descs.append(desc_matmul(bp.reshape(bp.shape[0], -1), ang, dmat))
        else:
            descs.append(E._descriptors(bp, ang))
    return jnp.concatenate(descs)


import functools
d_old = bench("full loop, take_along_axis desc (current)",
              jax.jit(functools.partial(loop, use_matmul=False)), img)
d_new = bench("full loop, matmul desc f32",
              jax.jit(lambda im: loop(im, True, D)), img)
Dbf = jnp.asarray(D_np, jnp.bfloat16)
def loop_bf(im, dmat):
    return loop(im, True, dmat.astype(jnp.bfloat16))
d_bf = bench("full loop, matmul desc bf16",
             jax.jit(lambda im: loop(im, True, Dbf)), img)

# fidelity: Hamming distance new-vs-old
def ham(a, b):
    x = np.ascontiguousarray(np.asarray(a) ^ np.asarray(b))
    return np.unpackbits(x.view(np.uint8), axis=1).sum(1)

h = ham(d_old, d_new)
print("Hamming old-vs-new (256 bits): median", np.median(h), "p90",
      np.percentile(h, 90), "max", h.max())
h2 = ham(d_new, d_bf)
print("Hamming f32-vs-bf16: median", np.median(h2), "max", h2.max())
