"""Prototype: fold blur into descriptor matmul; single 43x43 gather; bf16 resize."""
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
P = E._PATCH          # 37
RB = E.PATCH_R + 3    # 21 -> 43x43 raw patch
PB = 2 * RB + 1       # 43
N_ROT = 32


def build_D_blur(n_rot=N_ROT):
    """(PB*PB, n_rot*256) operator: raw 43x43 patch -> 256 comparison scores
    per rotation bin, with the 7x7 sigma-2 Gaussian blur folded in."""
    pat = orb_pattern().astype(np.float64)
    g = E._gaussian_kernel1d()
    G2 = np.outer(g, g)  # (7,7)
    D = np.zeros((n_rot, PB * PB, 256), np.float32)
    for b in range(n_rot):
        th = 2 * np.pi * b / n_rot
        ca, sa = np.cos(th), np.sin(th)
        for s in range(256):
            x1, y1, x2, y2 = pat[s]
            for (px, py), sign in (((x2, y2), 1.0), ((x1, y1), -1.0)):
                rx = int(np.round(px * ca - py * sa))
                ry = int(np.round(px * sa + py * ca))
                rx = int(np.clip(rx, -E.PATCH_R, E.PATCH_R))
                ry = int(np.clip(ry, -E.PATCH_R, E.PATCH_R))
                # blurred sample at (ry, rx) = sum over 7x7 raw neighborhood
                for dy in range(-3, 4):
                    for dx in range(-3, 4):
                        iy = ry + dy + RB
                        ix = rx + dx + RB
                        D[b, iy * PB + ix, s] += sign * G2[dy + 3, dx + 3]
    return D.transpose(1, 0, 2).reshape(PB * PB, n_rot * 256)


D_np = build_D_blur()
D = jnp.asarray(D_np)
print("D shape:", D.shape, "MB:", D_np.nbytes / 1e6)

# moment weights over central 31x31 of the 43x43 patch
wx31, wy31, _ = E._circular_moment_weights()
WX = np.zeros((PB, PB), np.float32); WY = np.zeros((PB, PB), np.float32)
o = RB - E.ORI_R
WX[o:o + 31, o:o + 31] = wx31; WY[o:o + 31, o:o + 31] = wy31
WXY = jnp.asarray(np.stack([WX.ravel(), WY.ravel()], axis=1))  # (PB*PB, 2)

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


def resize_mats(h0, w0, h1, w1, dtype):
    """Linear-interp resize as two constant matrices (h1,h0),(w0,w1)."""
    def mat(n0, n1):
        A = np.zeros((n1, n0), np.float32)
        # jax.image.resize 'linear' uses half-pixel centers
        for i in range(n1):
            x = (i + 0.5) * n0 / n1 - 0.5
            x0 = int(np.floor(x))
            f = x - x0
            a = np.clip(x0, 0, n0 - 1)
            b = np.clip(x0 + 1, 0, n0 - 1)
            A[i, a] += 1 - f
            A[i, b] += f
        return A
    return (jnp.asarray(mat(h0, h1), dtype), jnp.asarray(mat(w0, w1).T, dtype))

RS = []
for lv in range(1, NL):
    h0, w0 = params.level_hw[lv - 1]
    h1, w1 = params.level_hw[lv]
    RS.append(resize_mats(h0, w0, h1, w1, jnp.bfloat16))


def loop_folded(im, bf16_resize):
    img_l = im
    descs, angs = [], []
    for lv in range(NL):
        h, w = params.level_hw[lv]
        if lv > 0:
            if bf16_resize:
                A, B = RS[lv - 1]
                img_l = (A @ img_l.astype(jnp.bfloat16) @ B).astype(jnp.float32)
            else:
                img_l = jax.image.resize(img_l, (h, w), "linear")
        ys, xs = ys_l[lv], xs_l[lv]
        raw = E._gather_patches(img_l, ys, xs, RB)          # (K,43,43)
        flat = raw.reshape(raw.shape[0], -1)
        m = flat @ WXY                                       # (K,2) moments
        ang = jnp.arctan2(m[:, 1], m[:, 0])
        scores = flat @ D                                    # (K, NB*256)
        nb = N_ROT
        bins = jnp.mod(jnp.round(ang * (nb / (2 * np.pi))).astype(jnp.int32), nb)
        sc = scores.reshape(scores.shape[0], nb, 256)
        t = jnp.take_along_axis(sc, bins[:, None, None], axis=1)[:, 0, :]
        descs.append(E._pack_bits((t > 0).astype(jnp.uint32)))
        angs.append(ang)
    return jnp.concatenate(descs), jnp.concatenate(angs)


def loop_ref(im):
    img_l = im
    descs, angs = [], []
    for lv in range(NL):
        h, w = params.level_hw[lv]
        if lv > 0:
            img_l = jax.image.resize(img_l, (h, w), "linear")
        ys, xs = ys_l[lv], xs_l[lv]
        raw = E._gather_patches(img_l, ys, xs, E.ORI_R)
        ang = E._ic_angle(raw)
        blurred = E._blur(img_l)
        bp = E._gather_patches(blurred, ys, xs, E.PATCH_R)
        descs.append(E._descriptors(bp, ang))
        angs.append(ang)
    return jnp.concatenate(descs), jnp.concatenate(angs)


d_ref, a_ref = bench("current path", jax.jit(loop_ref), img)
d_f, a_f = bench("folded matmul desc, f32 resize",
                 jax.jit(lambda im: loop_folded(im, False)), img)
d_fb, a_fb = bench("folded matmul desc, bf16 resize",
                   jax.jit(lambda im: loop_folded(im, True)), img)

def ham(a, b):
    x = np.ascontiguousarray(np.asarray(a) ^ np.asarray(b))
    return np.unpackbits(x.view(np.uint8), axis=1).sum(1)

print("angle max diff (f32 resize):", float(jnp.abs(a_ref - a_f).max()))
h = ham(d_ref, d_f)
print("Hamming ref-vs-folded: median", np.median(h), "p90", np.percentile(h, 90))
h2 = ham(d_f, d_fb)
print("Hamming f32resize-vs-bf16resize: median", np.median(h2), "p90",
      np.percentile(h2, 90), "max", h2.max())
