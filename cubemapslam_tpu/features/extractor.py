"""Batched fixed-shape ORB extractor.

Mirrors the observable behavior of the reference ORBextractor
(src/ORBExtractor.cpp): an 8-level x1.2 pyramid (ComputePyramid cpp:928-953),
FAST-9/16 with per-cell adaptive ini/min thresholds 20/7 (cpp:739-803),
spatial best-response NMS (quad-tree DistributeOctTree cpp:511-737 — here
grid-bucketed top-1 per cell + per-level top-K, the fixed-shape equivalent),
intensity-centroid orientation on a radius-15 circular patch (IC_Angle
cpp:48-75), 7x7 sigma-2 Gaussian blur, 256-bit rBRIEF with rotated pattern
gathers (computeOrbDescriptor cpp:79-118), coordinates scaled to level 0, and
cubemap-face + mask culling (cpp:888-904).

TPU design: every data-dependent count becomes a fixed-K masked selection.
On TPU, detection is one pallas pass per 32-row slab (FAST strength via
min/max doubling chains, per-cell threshold fallback, 3x3 NMS, per-cell
top-4 through masked lane-group scans); patches are fetched by a
many-outstanding-DMA gather kernel; orientation moments and the
blur-folded, rotation-binned rBRIEF are MXU matmuls over the flat patches.
The pyramid is one composed-operator matmul pair per level. A pure-XLA
path with identical outputs (up to documented approximations) serves CPU.

Documented approximations (TPU detect kernel vs the CPU/reference path):

* Slab-boundary NMS: the kernel processes 32-row slabs with one halo row on
  each side; the per-cell ini->min threshold fallback decision for the halo
  rows (rows 0 and 33) is taken from THIS slab's cells even though those
  rows belong to the neighboring slabs' cells. Cross-slab 3x3 NMS can thus
  see a merged response the neighbor slab computes differently, so keypoints
  within 1 px of a 32-row boundary may differ from the CPU path.
* The kernel's detection cell size is fixed at 32 px (the CPU path honors
  OrbParams.cell; _extract_level raises if they diverge on TPU).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cubemapslam_tpu import camera as C
from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu.features.pattern import orb_pattern

# FAST radius-3 Bresenham circle, circular order (dx, dy)
_CIRCLE = np.array(
    [(0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
     (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2),
     (-1, -3)], dtype=np.int32)

EDGE_BORDER = 19          # keep-out border in level coords (ORBExtractor.h)
PATCH_R = 18              # descriptor patch radius (rotated pattern reach)
ORI_R = 15                # orientation circular-patch radius (HALF_PATCH_SIZE)
_PATCH = 2 * PATCH_R + 1  # 37
BLUR_R = 3                # 7x7 sigma-2 Gaussian (GaussianBlur, cpp:832)
RAW_R = PATCH_R + BLUR_R  # 21: raw-patch radius covering blurred desc reach
_RAW = 2 * RAW_R + 1      # 43
_RAWP = 48                # patch padded to 48x48 (tiling-friendly; rows/cols
                          # >= 43 are junk and zeroed in the flat operators)
N_ROT = 32                # steered-BRIEF rotation bins (11.25deg; the ORB
                          # paper's formulation — learned pattern used 12deg)
_DMA_BATCH = 16           # per-program outstanding patch DMAs (gather kernel)
_WIN_H, _WIN_W = 56, 256  # aligned DMA window containing any 48x48 patch


class OrbParams(NamedTuple):
    """Static extractor plan (python values; not traced)."""

    n_features: int
    n_levels: int
    scale_factor: float
    ini_th: int
    min_th: int
    cell: int                       # detection/NMS cell size in px
    level_hw: Tuple[Tuple[int, int], ...]   # per-level (H, W)
    level_k: Tuple[int, ...]        # per-level keypoint budget


class Keypoints(NamedTuple):
    """Fixed-size keypoint set for one image; invalid rows are masked."""

    uv: jnp.ndarray        # (N, 2) float32 level-0 cubemap (u, v)
    response: jnp.ndarray  # (N,) float32
    angle: jnp.ndarray     # (N,) float32 radians
    level: jnp.ndarray     # (N,) int32 pyramid octave
    face: jnp.ndarray      # (N,) int32 cubemap face (UNKNOWN=-1 if culled)
    desc: jnp.ndarray      # (N, 8) uint32 — 256-bit rBRIEF
    rays: jnp.ndarray      # (N, 3) float32 unit bearing rays (rig frame)
    valid: jnp.ndarray     # (N,) bool

    @property
    def n(self) -> int:
        return self.uv.shape[0]


def plan_levels(n_features: int, n_levels: int, scale_factor: float,
                image_hw: Tuple[int, int], cell: int = 32) -> OrbParams:
    """Compute per-level shapes and keypoint budgets (geometric distribution,
    as ORBExtractor ctor cpp:381-435)."""
    H, W = image_hw
    level_hw = []
    for lv in range(n_levels):
        s = 1.0 / (scale_factor ** lv)
        level_hw.append((int(round(H * s)), int(round(W * s))))
    f = 1.0 / scale_factor
    k0 = n_features * (1 - f) / (1 - f ** n_levels)
    ks = [int(round(k0 * (f ** lv))) for lv in range(n_levels)]
    ks[-1] = max(n_features - sum(ks[:-1]), 0)
    return OrbParams(n_features=sum(ks), n_levels=n_levels,
                     scale_factor=scale_factor, ini_th=0, min_th=0,
                     cell=cell, level_hw=tuple(level_hw), level_k=tuple(ks))


# ---------------------------------------------------------------------------
# FAST corner response
# ---------------------------------------------------------------------------


def _run9_strength(ds) -> jnp.ndarray:
    """max over the 16 9-long circular runs of the run's min difference.

    The doubling chain over the UNROLLED neighbor list costs 4x16 min/max
    ops instead of packing comparison bits into a uint32 (the circular
    rotation is list reindexing at trace time, i.e. free)."""
    m2 = [jnp.minimum(ds[i], ds[(i + 1) % 16]) for i in range(16)]
    m4 = [jnp.minimum(m2[i], m2[(i + 2) % 16]) for i in range(16)]
    m8 = [jnp.minimum(m4[i], m4[(i + 4) % 16]) for i in range(16)]
    v = None
    for i in range(16):
        m9 = jnp.minimum(m8[i], ds[(i + 8) % 16])
        v = m9 if v is None else jnp.maximum(v, m9)
    return v


def _fast_strength(ds) -> jnp.ndarray:
    """FAST-9/16 corner strength from the 16 neighbor differences: the
    maximal threshold at which the segment test still fires (OpenCV's FAST
    score; cv::FAST is what the reference extractor calls, cpp:764)."""
    return jnp.maximum(_run9_strength(ds),
                       _run9_strength([-d for d in ds]))


def _fast_maps_dual(img: jnp.ndarray, th_hi: int, th_lo: int):
    """FAST-9/16 corner masks at TWO thresholds + the corner strength as
    the NMS/ranking response, one pass over the 16-neighbor stencil (the
    per-cell ini/min fallback needs both thresholds; both are comparisons
    against the same strength map)."""
    ds = []
    for i, (dx, dy) in enumerate(_CIRCLE):
        neigh = jnp.roll(img, shift=(-int(dy), -int(dx)), axis=(0, 1))
        ds.append(neigh - img)
    strength = _fast_strength(ds)
    corner_hi = strength > jnp.float32(th_hi)
    corner_lo = strength > jnp.float32(th_lo)
    return corner_hi, corner_lo, strength


def _fast_maps(img: jnp.ndarray, th: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-threshold FAST (kept for unit tests)."""
    hi, lo, score = _fast_maps_dual(img, th, th)
    return hi, score


def _fast_adaptive(img: jnp.ndarray, ini_th: int, min_th: int,
                   cell: int) -> jnp.ndarray:
    """Response map with the reference's per-cell threshold fallback
    (ORBExtractor.cpp:739-803): use iniTh; where a cell has no iniTh corner,
    fall back to minTh. Non-corners get response 0."""
    strong_c, weak_c, score = _fast_maps_dual(img, ini_th, min_th)
    H, W = img.shape
    Hc = -(-H // cell)
    Wc = -(-W // cell)
    pad_h, pad_w = Hc * cell - H, Wc * cell - W
    sc = jnp.pad(strong_c, ((0, pad_h), (0, pad_w)))
    cell_any = sc.reshape(Hc, cell, Wc, cell).any(axis=(1, 3))
    cell_any_full = jnp.repeat(jnp.repeat(cell_any, cell, 0), cell, 1)[:H, :W]
    corner = jnp.where(cell_any_full, strong_c, weak_c)
    return jnp.where(corner, score, 0.0)


def _nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 local-maximum suppression."""
    neigh_max = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return jnp.where(score >= neigh_max, score, 0.0)


def _topk_grid(score: jnp.ndarray, cell: int, k: int, per_cell: int = 4
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-`per_cell` responses per cell, then global top-k: the fixed-shape
    equivalent of DistributeOctTree (ORBExtractor.cpp:511-737). Keeping
    several survivors per cell (not just the max) is what makes detection
    repeatable — the per-cell winner flips between frames, runners-up do
    not. Returns (y, x, response) each (k,); response 0 marks an unfilled
    slot."""
    H, W = score.shape
    Hc = -(-H // cell)
    Wc = -(-W // cell)
    pad = jnp.pad(score, ((0, Hc * cell - H), (0, Wc * cell - W)))
    cells = pad.reshape(Hc, cell, Wc, cell).transpose(0, 2, 1, 3)
    cells = cells.reshape(Hc * Wc, cell * cell)
    c_val, c_arg = jax.lax.top_k(cells, per_cell)       # (ncells, C)
    cy = jax.lax.broadcasted_iota(jnp.int32, (Hc, Wc), 0).reshape(-1)
    cx = jax.lax.broadcasted_iota(jnp.int32, (Hc, Wc), 1).reshape(-1)
    ys = (cy[:, None] * cell + c_arg // cell).reshape(-1)
    xs = (cx[:, None] * cell + c_arg % cell).reshape(-1)
    vals = c_val.reshape(-1)
    k_eff = min(k, vals.shape[0])
    top_val, top_idx = jax.lax.top_k(vals, k_eff)
    y = ys[top_idx]
    x = xs[top_idx]
    if k_eff < k:
        y = jnp.pad(y, (0, k - k_eff))
        x = jnp.pad(x, (0, k - k_eff))
        top_val = jnp.pad(top_val, (0, k - k_eff))
    return y, x, top_val


# ---------------------------------------------------------------------------
# Blur / orientation / descriptor
# ---------------------------------------------------------------------------

def _gaussian_kernel1d(ksize: int = 7, sigma: float = 2.0) -> np.ndarray:
    x = np.arange(ksize) - ksize // 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)



def _circular_moment_weights() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """x/y weight grids over the radius-15 circular patch (IC_Angle)."""
    r = ORI_R
    ys, xs = np.mgrid[-r:r + 1, -r:r + 1]
    mask = (xs * xs + ys * ys) <= r * r
    return (xs * mask).astype(np.float32), (ys * mask).astype(np.float32), \
        mask.astype(np.float32)



def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(N,256) {0,1} -> (N,8) uint32."""
    bits = bits.reshape(-1, 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(bits * weights[None, None, :], axis=-1, dtype=jnp.uint32)




# ---------------------------------------------------------------------------
# Patch gather: per-keypoint DMA kernel (TPU) / vmapped dynamic_slice (CPU)
# ---------------------------------------------------------------------------

def _gather_kernel(yal_ref, dy_ref, xal_ref, dx_ref, img_ref, out_ref,
                   scratch, sems):
    """Copy _DMA_BATCH aligned (56,256) windows HBM->VMEM with all DMAs in
    flight at once (the XLA lowering of a vmapped dynamic_slice issues them
    serially, ~0.8us each), then crop each 48x48 patch with positive-modulo
    rolls (Mosaic requires DMA starts aligned to the (8,128) tile, so the
    sub-tile offset is applied on-chip)."""
    p = pl.program_id(0)
    base = p * _DMA_BATCH

    def start(i, _):
        y = pl.multiple_of(yal_ref[base + i], 8)
        x = pl.multiple_of(xal_ref[base + i], 128)
        pltpu.make_async_copy(img_ref.at[pl.ds(y, _WIN_H), pl.ds(x, _WIN_W)],
                              scratch.at[i], sems.at[i]).start()
        return 0

    jax.lax.fori_loop(0, _DMA_BATCH, start, 0, unroll=True)

    def crop(i, _):
        y = pl.multiple_of(yal_ref[base + i], 8)
        x = pl.multiple_of(xal_ref[base + i], 128)
        pltpu.make_async_copy(img_ref.at[pl.ds(y, _WIN_H), pl.ds(x, _WIN_W)],
                              scratch.at[i], sems.at[i]).wait()
        w = scratch[i]
        # NOTE: negative sublane shifts miscompile on v5e Mosaic; use the
        # positive modular complement for both axes.
        w = pltpu.roll(w, shift=(_WIN_H - dy_ref[base + i]) % _WIN_H, axis=0)
        w = pltpu.roll(w, shift=(_WIN_W - dx_ref[base + i]) % _WIN_W, axis=1)
        out_ref[i] = w[:_RAWP, :_RAWP]
        return 0

    jax.lax.fori_loop(0, _DMA_BATCH, crop, 0, unroll=True)


def _gather_patches_padded(img: jnp.ndarray, ys: jnp.ndarray,
                           xs: jnp.ndarray) -> jnp.ndarray:
    """(K, 48, 48) raw patches whose [:43,:43] block is the 43x43 patch
    centered at integer (ys, xs); image is edge-replicated at borders.
    Remaining rows/cols hold junk pixels that the flat operators zero out."""
    H, W = img.shape
    K = ys.shape[0]
    # edge-pad by RAW_R, then pad up to aligned shapes with slack for the
    # (56, 256) windows at the largest aligned start
    Hp = ((H + 2 * RAW_R - 1) // 8) * 8 + _WIN_H
    Wp = ((W + 2 * RAW_R - 1) // 128) * 128 + _WIN_W
    padded = jnp.pad(img, ((RAW_R, Hp - H - RAW_R), (RAW_R, Wp - W - RAW_R)),
                     mode="edge")
    # top-left of each patch in padded coords
    yt = jnp.clip(ys, 0, H - 1)
    xt = jnp.clip(xs, 0, W - 1)
    if jax.default_backend() == "cpu":
        def one(y, x):
            return jax.lax.dynamic_slice(padded, (y, x), (_RAWP, _RAWP))
        return jax.vmap(one)(yt, xt)
    K16 = -(-K // _DMA_BATCH) * _DMA_BATCH
    yt = jnp.pad(yt, (0, K16 - K))
    xt = jnp.pad(xt, (0, K16 - K))
    yal = yt & ~jnp.int32(7)
    xal = xt & ~jnp.int32(127)
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(K16 // _DMA_BATCH,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((_DMA_BATCH, _RAWP, _RAWP),
                                   lambda i, *_: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((_DMA_BATCH, _WIN_H, _WIN_W), jnp.float32),
                pltpu.SemaphoreType.DMA((_DMA_BATCH,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((K16, _RAWP, _RAWP), jnp.float32),
    )(yal, yt - yal, xal, xt - xal, padded)
    return out[:K]


# ---------------------------------------------------------------------------
# Fused detection kernel: FAST dual-threshold + cell fallback + 3x3 NMS +
# per-cell top-4 + subpixel, one VMEM pass per 32-row slab (TPU)
# ---------------------------------------------------------------------------

_CELL = 32      # detection/NMS cell (reference uses 30-px FAST cells,
                # ORBExtractor.cpp:739-803; 32 aligns with the (8,128) tile)
_PCELL = 4      # survivors per cell (matches _topk_grid per_cell)


def _group_bcast(x_row: jnp.ndarray, lane_mod: jnp.ndarray, op,
                 Wp: int) -> jnp.ndarray:
    """Broadcast an idempotent reduction (max/min) over consecutive 32-lane
    groups: masked Hillis-Steele prefix + suffix scans, combined. Mosaic has
    no lane-splitting reshape, so segment reductions are 10 masked rolls."""
    r = x_row
    p = x_row
    for s in (1, 2, 4, 8, 16):
        sh = pltpu.roll(r, shift=(Wp - s) % Wp, axis=1)      # j+s -> j
        r = jnp.where(lane_mod + s < _CELL, op(r, sh), r)
        sh2 = pltpu.roll(p, shift=s, axis=1)                 # j-s -> j
        p = jnp.where(lane_mod >= s, op(p, sh2), p)
    return op(p, r)


def _cell_bcast(x: jnp.ndarray, lane_mod: jnp.ndarray, op,
                Wp: int) -> jnp.ndarray:
    """(32, Wp) -> (1, Wp): per-32x32-cell reduction broadcast to all lanes
    of the group (sublane reduce, then lane-group scan)."""
    red = (jnp.max if op is jnp.maximum else jnp.min)(x, axis=0,
                                                      keepdims=True)
    return _group_bcast(red, lane_mod, op, Wp)


def _detect_kernel(img_ref, out_ref, win, sem, *, Wp, H, W, ini_th, min_th):
    """One 32-row slab: DMA a (48, Wp) window, evaluate FAST-9/16 at both
    thresholds on rows [-1, 33) of the slab, apply the per-cell ini->min
    fallback, 3x3 NMS, border mask, then keep the top-4 responses per 32x32
    cell with quadratic subpixel offsets. Emits a (16, nc) block per slab:
    rows 0-3 responses, 4-7 packed positions (y*4096+x, exact in f32),
    8-11 subpixel dx, 12-15 subpixel dy."""
    k = pl.program_id(0)
    pltpu.make_async_copy(img_ref.at[pl.ds(k * _CELL, 48)], win, sem).start()
    pltpu.make_async_copy(img_ref.at[pl.ds(k * _CELL, 48)], win, sem).wait()
    w = win[:]                                   # (48, Wp) f32
    nc = Wp // _CELL

    # FAST maps for I rows [32k-1, 32k+33) = window rows [7, 41)
    # (bf16 strength chains were measured at parity with f32 here — kept
    # f32 for bit-consistency with the CPU path)
    center = w[7:41]
    ds = []
    for i, (dx, dy) in enumerate(_CIRCLE):
        nb = w[7 + int(dy):41 + int(dy)]
        if dx:
            nb = pltpu.roll(nb, shift=(-int(dx)) % Wp, axis=1)
        ds.append(nb - center)
    score = _fast_strength(ds)
    corner_hi = score > jnp.float32(ini_th)
    corner_lo = score > jnp.float32(min_th)

    # keep-out border in ORIGINAL image coords (EDGE_BORDER)
    gy = jax.lax.broadcasted_iota(jnp.int32, (34, Wp), 0) + (k * _CELL - 1)
    gx = jax.lax.broadcasted_iota(jnp.int32, (34, Wp), 1)
    inb = ((gy >= EDGE_BORDER) & (gy < H - EDGE_BORDER)
           & (gx >= EDGE_BORDER) & (gx < W - EDGE_BORDER))
    strong_s = jnp.where(corner_hi & inb, score, 0.0)
    weak_s = jnp.where(corner_lo & inb, score, 0.0)

    lane_mod = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1) % _CELL

    # per-cell ini->min fallback: cells belong to this slab's rows [1, 33)
    cell_has = _cell_bcast(strong_s[1:33], lane_mod, jnp.maximum, Wp) > 0.0             # (1, Wp), group-broadcast
    merged = jnp.where(cell_has, strong_s, weak_s)

    # 3x3 NMS on merged (rows [1,33) are the slab's own)
    m9 = None
    for dy in (-1, 0, 1):
        row = merged[1 + dy:33 + dy]
        for dx in (-1, 0, 1):
            sh9 = pltpu.roll(row, shift=(-dx) % Wp, axis=1) if dx else row
            m9 = sh9 if m9 is None else jnp.maximum(m9, sh9)
    sl = merged[1:33]
    cur = jnp.where((sl >= m9) & (sl > 0.0), sl, 0.0)   # (32, Wp)

    # quadratic subpixel offsets from the merged map
    xm = pltpu.roll(sl, shift=1, axis=1)
    xp = pltpu.roll(sl, shift=Wp - 1, axis=1)
    ym = merged[0:32]
    yp = merged[2:34]
    denx = 2.0 * sl - xm - xp
    deny = 2.0 * sl - ym - yp
    dxm = jnp.where(jnp.abs(denx) > 1e-6,
                    0.5 * (xp - xm) / jnp.maximum(denx, 1e-6), 0.0)
    dym = jnp.where(jnp.abs(deny) > 1e-6,
                    0.5 * (yp - ym) / jnp.maximum(deny, 1e-6), 0.0)
    dxm = jnp.clip(dxm, -0.5, 0.5)
    dym = jnp.clip(dym, -0.5, 0.5)

    # packed positions, exact in f32 (y, x < 2048 -> pack < 2^23)
    ly = jax.lax.broadcasted_iota(jnp.int32, (_CELL, Wp), 0) + k * _CELL
    lx = jax.lax.broadcasted_iota(jnp.int32, (_CELL, Wp), 1)
    pack = (ly * 4096 + lx).astype(jnp.float32)
    big = jnp.float32(2.0 ** 24)

    rows = []
    for r in range(_PCELL):
        m = _cell_bcast(cur, lane_mod, jnp.maximum, Wp)   # (1, Wp)
        hit = (cur >= m) & (m > 0.0)
        p = _cell_bcast(jnp.where(hit, pack, big), lane_mod, jnp.minimum, Wp)                                # (1, Wp)
        sel = (pack == p) & hit
        # extract selected subpixel offsets (one element per cell): offset
        # by +4 so max-select works on possibly-negative values
        sx = _cell_bcast(jnp.where(sel, dxm + 4.0, 0.0), lane_mod,
                         jnp.maximum, Wp) - 4.0
        sy = _cell_bcast(jnp.where(sel, dym + 4.0, 0.0), lane_mod,
                         jnp.maximum, Wp) - 4.0
        rows.append((m, jnp.where(m > 0.0, p, 0.0), sx, sy))
        cur = jnp.where(sel, 0.0, cur)

    stack = jnp.concatenate([r[0] for r in rows] + [r[1] for r in rows]
                            + [r[2] for r in rows] + [r[3] for r in rows],
                            axis=0)                             # (16, Wp)
    # downsample group-broadcast rows to one value per cell via one-hot dot
    pick = (jax.lax.broadcasted_iota(jnp.int32, (Wp, nc), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (Wp, nc), 1) * _CELL
            ).astype(jnp.float32)
    # HIGHEST precision: default TPU f32 dots round operands to bf16, which
    # would truncate the packed positions (up to 2^23)
    out_ref[0] = jax.lax.dot(stack, pick,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)


def _detect_level_tpu(img: jnp.ndarray, k: int, ini_th: int, min_th: int
                      ) -> Tuple[jnp.ndarray, ...]:
    """Fused FAST+NMS+cell-top4 detection -> global top-k (ys, xs, resp,
    with subpixel refinement applied)."""
    H, W = img.shape
    n_slab = -(-H // _CELL)
    Wp = -(-W // 128) * 128
    Hp = 8 + n_slab * _CELL + 16
    padded = jnp.pad(img, ((8, Hp - H - 8), (0, Wp - W)))
    nc = Wp // _CELL
    kern = functools.partial(_detect_kernel, Wp=Wp, H=H, W=W,
                             ini_th=ini_th, min_th=min_th)
    out = pl.pallas_call(
        kern,
        grid=(n_slab,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 16, nc), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((48, Wp), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        out_shape=jax.ShapeDtypeStruct((n_slab, 16, nc), jnp.float32),
    )(padded)
    resp = out[:, 0:4].reshape(-1)
    pos = out[:, 4:8].reshape(-1)
    subx = out[:, 8:12].reshape(-1)
    suby = out[:, 12:16].reshape(-1)
    k_eff = min(k, resp.shape[0])
    top_val, top_idx = jax.lax.top_k(resp, k_eff)
    p = pos[top_idx].astype(jnp.int32)
    ys = p // 4096
    xs = p % 4096
    ys_f = ys.astype(jnp.float32) + suby[top_idx]
    xs_f = xs.astype(jnp.float32) + subx[top_idx]
    if k_eff < k:
        ys = jnp.pad(ys, (0, k - k_eff))
        xs = jnp.pad(xs, (0, k - k_eff))
        ys_f = jnp.pad(ys_f, (0, k - k_eff))
        xs_f = jnp.pad(xs_f, (0, k - k_eff))
        top_val = jnp.pad(top_val, (0, k - k_eff))
    return ys, xs, ys_f, xs_f, top_val


# ---------------------------------------------------------------------------
# MXU operators: composed pyramid resize + blur-folded binned rBRIEF
# ---------------------------------------------------------------------------

def _linear_resize_mat(n0: int, n1: int) -> np.ndarray:
    """(n1, n0) half-pixel-center linear interpolation matrix (the operator
    jax.image.resize 'linear' applies along one axis)."""
    A = np.zeros((n1, n0), np.float32)
    for i in range(n1):
        x = (i + 0.5) * n0 / n1 - 0.5
        x0 = int(np.floor(x))
        f = x - x0
        A[i, np.clip(x0, 0, n0 - 1)] += 1.0 - f
        A[i, np.clip(x0 + 1, 0, n0 - 1)] += f
    return A


@functools.lru_cache(maxsize=8)
def _pyramid_operators(level_hw: Tuple[Tuple[int, int], ...]
                       ) -> Tuple[Tuple[np.ndarray, np.ndarray], ...]:
    """Per-level (A, B^T) so that level_l = A @ level_0 @ B^T.

    The reference chains 1.2x resizes (ComputePyramid cpp:928-953); chained
    linear resize is a linear operator, so we compose the per-step matrices
    once on the host and each level becomes ONE matmul pair from level 0 —
    identical pixels, no serial level-to-level dependency on device, and the
    sparse 2-tap interpolation rides the MXU instead of XLA's slow per-level
    dot lowering."""
    ops = []
    Ah = np.eye(level_hw[0][0], dtype=np.float32)
    Aw = np.eye(level_hw[0][1], dtype=np.float32)
    for lv in range(1, len(level_hw)):
        h0, w0 = level_hw[lv - 1]
        h1, w1 = level_hw[lv]
        Ah = _linear_resize_mat(h0, h1) @ Ah
        Aw = _linear_resize_mat(w0, w1) @ Aw
        ops.append((Ah.copy(), Aw.T.copy()))
    return tuple(ops)


@functools.lru_cache(maxsize=1)
def _descriptor_operator() -> np.ndarray:
    """(43*43, N_ROT*256) operator taking a flat RAW 43x43 patch to the 256
    comparison scores (t2 - t1) for every rotation bin, with the 7x7 sigma-2
    Gaussian blur folded in (blur is linear, so blur+rBRIEF compose into one
    matrix). Descriptor bit s = score > 0. Replaces per-keypoint in-patch
    gathers (TPU-hostile) with one MXU matmul (computeOrbDescriptor,
    ORBExtractor.cpp:79-118 + GaussianBlur cpp:829-836)."""
    pat = orb_pattern().astype(np.float64)              # (256, 4)
    g = _gaussian_kernel1d()
    G2 = np.outer(g, g)                                 # (7, 7)
    D = np.zeros((N_ROT, _RAWP * _RAWP, 256), np.float32)
    for b in range(N_ROT):
        th = 2.0 * np.pi * b / N_ROT
        ca, sa = np.cos(th), np.sin(th)
        for (cx, cy), sign in (((pat[:, 2], pat[:, 3]), 1.0),
                               ((pat[:, 0], pat[:, 1]), -1.0)):
            rx = np.clip(np.round(cx * ca - cy * sa), -PATCH_R, PATCH_R)
            ry = np.clip(np.round(cx * sa + cy * ca), -PATCH_R, PATCH_R)
            rx = rx.astype(np.int64)
            ry = ry.astype(np.int64)
            for dy in range(-BLUR_R, BLUR_R + 1):
                for dx in range(-BLUR_R, BLUR_R + 1):
                    idx = (ry + dy + RAW_R) * _RAWP + (rx + dx + RAW_R)
                    np.add.at(D[b], (idx, np.arange(256)),
                              sign * G2[dy + BLUR_R, dx + BLUR_R])
    return D.transpose(1, 0, 2).reshape(_RAWP * _RAWP, N_ROT * 256)


@functools.lru_cache(maxsize=1)
def _moment_operator() -> np.ndarray:
    """(43*43, 2) operator: flat raw patch -> (m10, m01) intensity-centroid
    moments over the central radius-15 circular patch (IC_Angle cpp:48-75)."""
    wx31, wy31, _ = _circular_moment_weights()
    o = RAW_R - ORI_R
    WX = np.zeros((_RAWP, _RAWP), np.float32)
    WY = np.zeros((_RAWP, _RAWP), np.float32)
    WX[o:o + 2 * ORI_R + 1, o:o + 2 * ORI_R + 1] = wx31
    WY[o:o + 2 * ORI_R + 1, o:o + 2 * ORI_R + 1] = wy31
    return np.stack([WX.ravel(), WY.ravel()], axis=1)


@functools.lru_cache(maxsize=1)
def _desc_and_moment_operator() -> np.ndarray:
    """Descriptor operator with the two moment columns appended: one bf16
    MXU dot yields comparison scores AND (m10, m01). A separate f32 moment
    dot is pathological under Precision.HIGHEST (2-lane output), and bf16
    moments bound the angle error by ~0.23 deg << the 11.25 deg bin."""
    return np.concatenate([_descriptor_operator(), _moment_operator()],
                          axis=1)


def _angle_and_desc(raw_patches: jnp.ndarray, desc_op=None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """IC angle + blur-folded rBRIEF from raw 43x43 patches, all MXU work.

    The fused dot runs with bf16 inputs + f32 accumulation: pixel values
    are 0..255 (8 significand bits suffice) and the comparison operator
    entries are Gaussian-weight sums; measured bit-identical descriptors
    vs the f32 dot at ~4x the MXU rate.

    desc_op: the fused operator as a DEVICE ARRAY argument (preferred —
    a ~38MB bf16 tracing constant bloats every compile request over the
    transport, the same failure class warp_tpu.py avoids by passing its
    operators as DeviceWarp.args). Falls back to embedding the host
    constant when None."""
    flat = raw_patches.reshape(raw_patches.shape[0], -1)
    if desc_op is None:
        desc_op = jnp.asarray(_desc_and_moment_operator(), jnp.bfloat16)
    fused = jax.lax.dot(flat.astype(jnp.bfloat16), desc_op,
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
    scores = fused[:, :N_ROT * 256]
    mom = fused[:, N_ROT * 256:]
    ang = jnp.arctan2(mom[:, 1], mom[:, 0])
    bins = jnp.mod(jnp.round(ang * (N_ROT / (2.0 * np.pi))).astype(jnp.int32),
                   N_ROT)
    sc = scores.reshape(scores.shape[0], N_ROT, 256)
    t = jnp.take_along_axis(sc, bins[:, None, None], axis=1)[:, 0, :]
    desc = _pack_bits((t > 0).astype(jnp.uint32))
    return ang, desc


# ---------------------------------------------------------------------------
# Full extractor
# ---------------------------------------------------------------------------

def _subpixel_offsets(score: jnp.ndarray, ys: jnp.ndarray,
                      xs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quadratic (parabola) refinement of integer NMS winners on the FAST
    response map. Halves the effective observation noise vs integer-grid
    keypoints — the reference inherits OpenCV FAST's integer positions, but
    at TPU the refinement is three gathers and a fused divide."""
    pad = jnp.pad(score, 1)
    yp = ys + 1
    xp = xs + 1
    c = pad[yp, xp]
    xm = pad[yp, xp - 1]
    xpl = pad[yp, xp + 1]
    ym = pad[yp - 1, xp]
    ypl = pad[yp + 1, xp]
    denx = 2.0 * c - xm - xpl
    deny = 2.0 * c - ym - ypl
    dx = jnp.where(jnp.abs(denx) > 1e-6,
                   0.5 * (xpl - xm) / jnp.maximum(denx, 1e-6), 0.0)
    dy = jnp.where(jnp.abs(deny) > 1e-6,
                   0.5 * (ypl - ym) / jnp.maximum(deny, 1e-6), 0.0)
    return jnp.clip(dy, -0.5, 0.5), jnp.clip(dx, -0.5, 0.5)


def _extract_level(img: jnp.ndarray, k: int, cell: int, ini_th: int,
                   min_th: int, desc_op=None) -> Tuple[jnp.ndarray, ...]:
    """One pyramid level -> fixed-k (y, x, response, angle, desc)."""
    if jax.default_backend() == "cpu":
        raw_score = _fast_adaptive(img, ini_th, min_th, cell)
        score = _nms3(raw_score)
        # keep-out border (EDGE_BORDER) — also guards patch gathers
        H, W = img.shape
        yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        inb = ((yy >= EDGE_BORDER) & (yy < H - EDGE_BORDER)
               & (xx >= EDGE_BORDER) & (xx < W - EDGE_BORDER))
        score = jnp.where(inb, score, 0.0)
        ys, xs, resp = _topk_grid(score, cell, k)
        # parabola over the pre-NMS response (NMS zeroes the neighbors)
        dy, dx = _subpixel_offsets(raw_score, ys, xs)
        ys_f = ys.astype(jnp.float32) + dy
        xs_f = xs.astype(jnp.float32) + dx
    else:
        if cell != _CELL:
            raise ValueError(
                f"TPU detect kernel uses a fixed cell={_CELL}; "
                f"plan_levels(..., cell={cell}) would silently diverge "
                f"from the CPU path")
        ys, xs, ys_f, xs_f, resp = _detect_level_tpu(img, k, ini_th, min_th)

    # ONE 48x48 raw-patch gather per keypoint (per-keypoint DMA kernel on
    # TPU); orientation + blurred rBRIEF are then pure MXU matmuls over the
    # flat patches (_angle_and_desc).
    raw_patches = _gather_patches_padded(img, ys, xs)
    angles, desc = _angle_and_desc(raw_patches, desc_op)
    return ys_f, xs_f, resp, angles, desc


def extract_orb(params: OrbParams, cam: CubemapCamera, image: jnp.ndarray,
                mask: Optional[jnp.ndarray] = None,
                ini_th: int = 20, min_th: int = 7,
                desc_op=None) -> Keypoints:
    """Extract ORB keypoints+descriptors from a cubemap-cross image.

    image: (H, W) float32. mask: optional (H, W) {0,1}; keypoints on zero
    pixels are culled (ORBExtractor.cpp:888-904). Returns fixed-size
    Keypoints with validity mask. Jit with params/static shapes closed over
    (see build_extractor). desc_op: optional device-array descriptor
    operator (see _angle_and_desc) — pass it as a jit ARGUMENT to keep the
    ~38MB constant out of the compile request.
    """
    uv_all, resp_all, ang_all, lvl_all, desc_all = [], [], [], [], []
    pyr_ops = _pyramid_operators(params.level_hw)
    img_bf = image.astype(jnp.bfloat16)
    for lv in range(params.n_levels):
        if lv == 0:
            img_l = image
        else:
            # explicit bf16 operands keep the native MXU rate under the
            # package-wide 'highest' default; the resulting +-0.5-intensity
            # rounding matches the u8 pyramid quantization the reference
            # inherits from OpenCV
            A, Bt = pyr_ops[lv - 1]
            img_l = jax.lax.dot(
                jax.lax.dot(jnp.asarray(A, jnp.bfloat16), img_bf,
                            precision=jax.lax.Precision.DEFAULT,
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16),
                jnp.asarray(Bt, jnp.bfloat16),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
        ys, xs, resp, ang, desc = _extract_level(
            img_l, params.level_k[lv], params.cell, ini_th, min_th,
            desc_op)
        s = params.scale_factor ** lv
        uv0 = jnp.stack([xs.astype(jnp.float32) * s,
                         ys.astype(jnp.float32) * s], axis=-1)
        uv_all.append(uv0)
        resp_all.append(resp)
        ang_all.append(ang)
        lvl_all.append(jnp.full((params.level_k[lv],), lv, jnp.int32))
        desc_all.append(desc)

    uv = jnp.concatenate(uv_all)
    resp = jnp.concatenate(resp_all)
    ang = jnp.concatenate(ang_all)
    lvl = jnp.concatenate(lvl_all)
    desc = jnp.concatenate(desc_all)

    valid = resp > 0
    face = C.face_from_cubemap_uv(cam, uv)
    valid = valid & (face != C.UNKNOWN_FACE)
    if mask is not None:
        mu = jnp.clip(uv[:, 0].astype(jnp.int32), 0, image.shape[1] - 1)
        mv = jnp.clip(uv[:, 1].astype(jnp.int32), 0, image.shape[0] - 1)
        valid = valid & (mask[mv, mu] > 0)
    face = jnp.where(valid, face, C.UNKNOWN_FACE)
    rays, _ = C.cubemap_to_ray(cam, uv)
    rays = jnp.where(valid[:, None], rays, 0.0)
    return Keypoints(uv=uv, response=resp, angle=ang, level=lvl, face=face,
                     desc=desc, rays=rays, valid=valid)


def build_extractor(cfg, cam: CubemapCamera, n_features: int,
                    image_hw: Tuple[int, int]):
    """Return a jitted extractor specialized to one image geometry.

    The fused descriptor+moment operator is uploaded once and threaded
    through as a jit argument (not a tracing constant), keeping the compile
    request small over the TPU transport."""
    params = plan_levels(n_features, cfg.n_levels, cfg.scale_factor, image_hw)
    desc_op = jnp.asarray(_desc_and_moment_operator(), jnp.bfloat16)

    @jax.jit
    def run_impl(desc_op, image, mask=None):
        return extract_orb(params, cam, image, mask,
                           ini_th=cfg.ini_th_fast, min_th=cfg.min_th_fast,
                           desc_op=desc_op)

    def run(image, mask=None):
        return run_impl(desc_op, image, mask)

    return run, params
