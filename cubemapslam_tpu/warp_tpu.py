"""On-device fisheye->cubemap warp (Pallas TPU kernels).

Motivation: the host->device tunnel serializes transfers with executes, so
per-frame upload cost is proportional to bytes. Uploading the raw fisheye
(u8, ~0.36MB for Lafida) instead of warped cube faces (~2.1MB) removes most
of that cost — but XLA's per-element gather lowering makes a naive device
warp ~112ms. These kernels restructure the reference warp (cv::remap,
System.cpp:327-355) into TPU-shaped work over 8x128 face tiles:

* Kernel H (two-pass, ~92% of tiles for Lafida — rows monotone in source x
  with bounded row-to-row drift):
  1. vertical: g[r,c] = lerp of fisheye column c at the height Y(r,c) where
     output row r's source curve crosses column c (Catmull-Smith 2-pass;
     differs from exact bilinear only in sampling the column at the tap's
     height instead of the pixel's — a sub-pixel filter-kernel difference,
     not a geometric shift: the curve positions themselves are exact).
     Implemented as masked selects over the window rows.
  2. horizontal: resample g at x(r,u). A per-tile constant 0/1 matrix P0
     (WIN_W->128 at base columns b[u]) rides the MXU on N_TAP lane-rolled
     copies of g; precomputed per-pixel 2-tap weights over the taps finish
     the lerp. No in-kernel index builds.
* Kernel X (foldover tiles — pole regions of the up/down faces, plus tiles
  whose spans exceed the H window): per output row, a weighted vertical
  one-hot contracts a TRANSPOSED fisheye window on the MXU into per-column
  profiles V[c,u]; the horizontal 2-tap is a masked sublane reduction.
  Exact bilinear up to bf16 rounding of the MXU operands.

Window shapes are derived from the calibration's measured tile spans at
plan-build time, so any face size / fisheye geometry gets working kernels.

All geometry (window offsets, Y-interp tables, P0, tap weights, one-hot
indices) is baked on the host into dense per-tile tensors passed as device
arrays. Tiles are emitted as a stacked (T,8,128) tensor (kernel X aliases
its tiles into kernel H's output) and reassembled by one reshape/transpose.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cubemapslam_tpu import camera as C
from cubemapslam_tpu.camera import CubemapCamera

TILE_H, TILE_W = 8, 128
N_TAP = 16                   # horizontal taps around the base column
FACE_CELLS = ((1, 1), (0, 1), (2, 1), (1, 0), (1, 2))


class DeviceWarpPlan(NamedTuple):
    """Host-built per-tile warp operators."""

    # kernel H (over ALL T tiles; non-H tiles have zero weights)
    wy: np.ndarray      # (T,) int32 window row start (8-aligned)
    wx: np.ndarray      # (T,) int32 window col start (128-aligned)
    yl: np.ndarray      # (T, 8, 256) int32 vertical tap row (window-rel)
    fy: np.ndarray      # (T, 8, 256) float32 vertical fraction
    p0: np.ndarray      # (T, 256, 128) bfloat16 base-column selector
    w8: np.ndarray      # (T, 8, 8, 128) float32 per-tap horizontal weights
    # kernel X (Tc tiles)
    c_tile: np.ndarray  # (Tc,) int32 raster tile id
    c_wx: np.ndarray    # (Tc,) int32 transposed-window x start (8-aligned)
    c_wy: np.ndarray    # (Tc,) int32 transposed-window y start (128-aligned)
    c_yl: np.ndarray    # (Tc, 8, 128) int32 vertical tap (window-rel y)
    c_fy: np.ndarray    # (Tc, 8, 128) float32
    c_xl: np.ndarray    # (Tc, 8, 128) int32 horizontal tap (window-rel x)
    c_fx: np.ndarray    # (Tc, 8, 128) float32
    c_valid: np.ndarray  # (Tc, 8, 128) float32
    # geometry (window sizes derived from the calibration's tile spans)
    n_ty: int
    n_tx: int
    face_hw: Tuple[int, int]
    win_hw: Tuple[int, int]      # kernel H window (rows, cols)
    xwin_xy: Tuple[int, int]     # kernel X transposed window (x rows, y lanes)
    pad_hw: Tuple[int, int]      # padded fisheye (rows, cols) for kernel H
    padT_wh: Tuple[int, int]     # padded transposed fisheye (x rows, y lanes)
    src_hw: Tuple[int, int]


def build_device_warp_plan(cam: CubemapCamera, cube_w: int,
                           cube_h: int) -> DeviceWarpPlan:
    fw, fh = cube_w // 3, cube_h // 3
    Wsrc = int(np.asarray(cam.fisheye_wh)[0])
    Hsrc = int(np.asarray(cam.fisheye_wh)[1])
    n_ty = -(-fh // TILE_H)
    n_tx = -(-fw // TILE_W)

    uu, vv = np.meshgrid(np.arange(fw, dtype=np.float32),
                         np.arange(fh, dtype=np.float32))
    T = 5 * n_ty * n_tx

    # pass 1: per-face continuous source coords + global tile span maxima
    coords = []
    max_ys = max_xs = 8
    for f, (cx, cy) in enumerate(FACE_CELLS):
        uv = jnp.stack([jnp.asarray(uu + cx * fw),
                        jnp.asarray(vv + cy * fh)], axis=-1)
        uvf, val = C.cubemap_to_fisheye(cam, uv.reshape(-1, 2))
        x = np.clip(np.asarray(uvf[:, 0], np.float64).reshape(fh, fw),
                    0, Wsrc - 1.001)
        y = np.clip(np.asarray(uvf[:, 1], np.float64).reshape(fh, fw),
                    0, Hsrc - 1.001)
        vmask = np.asarray(val).reshape(fh, fw)
        coords.append((x, y, vmask))
        for ty in range(n_ty):
            for tx in range(n_tx):
                r1 = min((ty + 1) * TILE_H, fh)
                c1 = min((tx + 1) * TILE_W, fw)
                sl = np.s_[ty * TILE_H:r1, tx * TILE_W:c1]
                vt = vmask[sl]
                if not vt.any():
                    continue
                max_ys = max(max_ys, int(y[sl][vt].max())
                             - int(y[sl][vt].min()) + 3)
                max_xs = max(max_xs, int(x[sl][vt].max())
                             - int(x[sl][vt].min()) + 3)
    # H window: sublane start 8-aligned (+7 slack), lane start 128-aligned
    WIN_H = -(-(max_ys + 7) // 8) * 8
    WIN_W = -(-(max_xs + 127) // 128) * 128
    # X (transposed) window: x rows 8-aligned, y lanes 128-aligned
    XWIN_X = -(-(max_xs + 7) // 8) * 8
    XWIN_Y = -(-(max_ys + 127) // 128) * 128
    Hp = -(-Hsrc // 8) * 8 + WIN_H
    Wp = -(-Wsrc // 128) * 128 + WIN_W
    HpT = -(-Wsrc // 8) * 8 + XWIN_X          # transposed rows = x
    WpT = -(-Hsrc // 128) * 128 + XWIN_Y      # transposed lanes = y

    wy = np.zeros(T, np.int32)
    wx = np.zeros(T, np.int32)
    yl = np.zeros((T, TILE_H, WIN_W), np.int32)
    fyw = np.zeros((T, TILE_H, WIN_W), np.float32)
    p0 = np.zeros((T, WIN_W, TILE_W), np.float32)
    w8 = np.zeros((T, N_TAP, TILE_H, TILE_W), np.float32)
    c_rows = []

    for f, (cx, cy) in enumerate(FACE_CELLS):
        x, y, vmask = coords[f]
        for ty in range(n_ty):
            for tx in range(n_tx):
                t = (f * n_ty + ty) * n_tx + tx
                r1 = min((ty + 1) * TILE_H, fh) - ty * TILE_H
                c1 = min((tx + 1) * TILE_W, fw) - tx * TILE_W
                sl = np.s_[ty * TILE_H:ty * TILE_H + r1,
                           tx * TILE_W:tx * TILE_W + c1]
                xt, yt, vt = x[sl], y[sl], vmask[sl]
                if not vt.any():
                    continue          # all-zero weights -> zero tile
                # extents over VALID pixels only (invalid coords are
                # image-clamped and can span the whole fisheye)
                yv_lo = int(np.floor(yt[vt].min()))
                yv_hi = int(np.floor(yt[vt].max()))
                xv_lo = int(np.floor(xt[vt].min()))
                xv_hi = int(np.floor(xt[vt].max()))
                dx = np.diff(xt, axis=1)
                hmono = all((r >= -1e-9).all() or (r <= 1e-9).all()
                            for r in dx) and c1 > 1
                # row-drift of source x across the 8 rows (valid px only)
                drift = np.abs(xt - xt[0:1])[vt].max() if hmono else np.inf
                drift_ok = drift <= (N_TAP - 2) / 2
                ywin = max(0, min((yv_lo // 8) * 8, Hp - WIN_H))
                xwin = max(0, min((xv_lo // 128) * 128, Wp - WIN_W))
                yspan_ok = yv_hi + 1 - ywin <= WIN_H - 2
                xspan_ok = xv_hi + 1 - xwin <= WIN_W - 2
                if hmono and drift_ok and yspan_ok and xspan_ok:
                    wy[t] = ywin
                    wx[t] = xwin
                    cols = np.arange(WIN_W, dtype=np.float64) + xwin
                    for r in range(r1):
                        xr, yr = xt[r], yt[r]
                        if c1 > 1 and xr[-1] < xr[0]:
                            xr, yr = xr[::-1], yr[::-1]
                        Yc = np.interp(cols, xr, yr)
                        ylr = np.clip(np.floor(Yc).astype(np.int64) - ywin,
                                      0, WIN_H - 2)
                        yl[t, r] = ylr
                        fyw[t, r] = np.clip(Yc - (ylr + ywin), 0.0, 1.0)
                    # base columns from row 0, taps j in [0, N_TAP)
                    xl0 = np.clip(np.floor(xt[0]).astype(np.int64) - xwin,
                                  0, WIN_W - 2)
                    base = np.clip(xl0 - N_TAP // 2 + 1, 0, WIN_W - N_TAP)
                    p0[t, base, np.arange(c1)] = 1.0
                    xl = np.clip(np.floor(xt).astype(np.int64) - xwin,
                                 0, WIN_W - 2)
                    fx = np.clip((xt - xwin) - xl, 0.0, 1.0)
                    d = np.clip(xl - base[None, :c1], 0, N_TAP - 2)
                    assert ((xl - base[None, :c1])[vt] >= 0).all() and (
                        (xl - base[None, :c1])[vt] <= N_TAP - 2).all(), (
                        f"tile {t}: tap range exceeded")
                    rr, cc = np.mgrid[0:r1, 0:c1]
                    w8[t, d, rr, cc] += (1.0 - fx) * vt
                    w8[t, d + 1, rr, cc] += fx * vt
                else:
                    # exact path over the transposed window
                    xwinT = max(0, min((xv_lo // 8) * 8, HpT - XWIN_X))
                    ywinT = max(0, min((yv_lo // 128) * 128, WpT - XWIN_Y))
                    assert xv_hi + 1 - xwinT <= XWIN_X - 2, (t, xv_lo, xv_hi)
                    assert yv_hi + 1 - ywinT <= XWIN_Y - 2, (t, yv_lo, yv_hi)
                    ylc = np.zeros((TILE_H, TILE_W), np.int64)
                    fyc = np.zeros((TILE_H, TILE_W), np.float32)
                    xlc = np.zeros((TILE_H, TILE_W), np.int64)
                    fxc = np.zeros((TILE_H, TILE_W), np.float32)
                    vc = np.zeros((TILE_H, TILE_W), np.float32)
                    ylc[:r1, :c1] = np.clip(
                        np.floor(yt).astype(np.int64) - ywinT, 0, XWIN_Y - 2)
                    fyc[:r1, :c1] = np.clip(yt - ywinT - ylc[:r1, :c1], 0, 1)
                    xlc[:r1, :c1] = np.clip(
                        np.floor(xt).astype(np.int64) - xwinT, 0, XWIN_X - 2)
                    fxc[:r1, :c1] = np.clip(xt - xwinT - xlc[:r1, :c1], 0, 1)
                    vc[:r1, :c1] = vt.astype(np.float32)
                    c_rows.append((t, xwinT, ywinT, ylc, fyc, xlc, fxc, vc))

    if c_rows:
        c_tile = np.array([r[0] for r in c_rows], np.int32)
        c_wx = np.array([r[1] for r in c_rows], np.int32)
        c_wy = np.array([r[2] for r in c_rows], np.int32)
        c_yl = np.stack([r[3] for r in c_rows]).astype(np.int32)
        c_fy = np.stack([r[4] for r in c_rows]).astype(np.float32)
        c_xl = np.stack([r[5] for r in c_rows]).astype(np.int32)
        c_fx = np.stack([r[6] for r in c_rows]).astype(np.float32)
        c_valid = np.stack([r[7] for r in c_rows]).astype(np.float32)
    else:
        c_tile = np.zeros(0, np.int32)
        c_wx = c_wy = np.zeros(0, np.int32)
        c_yl = c_xl = np.zeros((0, TILE_H, TILE_W), np.int32)
        c_fy = c_fx = c_valid = np.zeros((0, TILE_H, TILE_W), np.float32)

    return DeviceWarpPlan(
        wy=wy, wx=wx, yl=yl, fy=fyw, p0=p0, w8=w8,
        c_tile=c_tile, c_wx=c_wx, c_wy=c_wy, c_yl=c_yl, c_fy=c_fy,
        c_xl=c_xl, c_fx=c_fx, c_valid=c_valid,
        n_ty=n_ty, n_tx=n_tx, face_hw=(fh, fw), win_hw=(WIN_H, WIN_W),
        xwin_xy=(XWIN_X, XWIN_Y), pad_hw=(Hp, Wp),
        padT_wh=(HpT, WpT), src_hw=(Hsrc, Wsrc))


def _h_kernel(wy_ref, wx_ref, fish_ref, yl_ref, fy_ref, p0_ref, w8_ref,
              out_ref, *, WIN_H, WIN_W):
    i = pl.program_id(0)
    y0 = pl.multiple_of(wy_ref[i], 8)
    x0 = pl.multiple_of(wx_ref[i], 128)
    B = fish_ref[pl.ds(y0, WIN_H), pl.ds(x0, WIN_W)]
    yl = yl_ref[0]                                        # (8, 256)
    fy = fy_ref[0]
    g = jnp.zeros((TILE_H, WIN_W), jnp.float32)
    for s in range(WIN_H - 1):
        lerp = (1.0 - fy) * B[s][None, :] + fy * B[s + 1][None, :]
        g = jnp.where(yl == s, lerp, g)
    p0 = p0_ref[0]                                        # (256, 128) bf16
    acc = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for j in range(N_TAP):
        gj = pltpu.roll(g, shift=(WIN_W - j) % WIN_W, axis=1) if j else g
        Gj = jax.lax.dot(gj.astype(jnp.bfloat16), p0,
                         precision=jax.lax.Precision.DEFAULT,
                         preferred_element_type=jnp.float32)
        acc = acc + w8_ref[0, j] * Gj
    out_ref[0] = acc


def _x_kernel(ct_ref, wx_ref, wy_ref, fishT_ref, yl_ref, fy_ref, xl_ref,
              fx_ref, v_ref, tiles_ref, out_ref, *, XWIN_X, XWIN_Y):
    del tiles_ref  # aliased to out_ref; blocks not written keep its data
    i = pl.program_id(0)
    x0 = pl.multiple_of(wx_ref[i], 8)
    y0 = pl.multiple_of(wy_ref[i], 128)
    BT = fishT_ref[pl.ds(x0, XWIN_X), pl.ds(y0, XWIN_Y)]
    BTb = BT.astype(jnp.bfloat16)
    ycol = jax.lax.broadcasted_iota(jnp.int32, (XWIN_Y, TILE_W), 0)
    xrow = jax.lax.broadcasted_iota(jnp.int32, (XWIN_X, TILE_W), 0)
    for r in range(TILE_H):
        ylr = yl_ref[0, r][None, :]                       # (1, 128)
        fyr = fy_ref[0, r][None, :]
        ohy = (jnp.where(ycol == ylr, 1.0 - fyr, 0.0)
               + jnp.where(ycol == ylr + 1, fyr, 0.0))    # (256y, 128)
        V = jax.lax.dot(BTb, ohy.astype(jnp.bfloat16),
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)  # (256x, 128)
        xlr = xl_ref[0, r][None, :]
        fxr = fx_ref[0, r][None, :]
        ohx = (jnp.where(xrow == xlr, 1.0 - fxr, 0.0)
               + jnp.where(xrow == xlr + 1, fxr, 0.0))    # (256x, 128)
        out_ref[0, r, :] = jnp.sum(V * ohx, axis=0) * v_ref[0, r]


class DeviceWarp:
    """Callable device warp: fisheye (u8/f32) -> (5, FH, FW) float32."""

    def __init__(self, cam: CubemapCamera, cube_w: int, cube_h: int):
        plan = build_device_warp_plan(cam, cube_w, cube_h)
        self.plan = plan
        # device arrays passed as jit ARGUMENTS (embedding ~300MB of
        # operators as jit constants blows up the compile request)
        self.args = {
            k: jnp.asarray(getattr(plan, k),
                           jnp.bfloat16 if k in ("p0", "w8") else None)
            for k in ("wy", "wx", "yl", "fy", "p0", "w8", "c_tile", "c_wx",
                      "c_wy", "c_yl", "c_fy", "c_xl", "c_fx", "c_valid")}
        self._jit = jax.jit(
            lambda a, fish: warp_faces_device(plan, a, fish))

    def __call__(self, fisheye: jnp.ndarray) -> jnp.ndarray:
        return self._jit(self.args, fisheye)


def warp_faces_device(plan: DeviceWarpPlan, a: dict,
                      fisheye: jnp.ndarray) -> jnp.ndarray:
    """fisheye (Hsrc, Wsrc) u8/f32 -> (5, FH, FW) f32 cube faces."""
    Hsrc, Wsrc = plan.src_hw
    Hp, Wp = plan.pad_hw
    HpT, WpT = plan.padT_wh
    fish32 = fisheye.astype(jnp.float32)
    fish = jnp.pad(fish32, ((0, Hp - Hsrc), (0, Wp - Wsrc)), mode="edge")
    T = plan.wy.shape[0]
    n_ty, n_tx = plan.n_ty, plan.n_tx
    fh, fw = plan.face_hw

    WIN_H, WIN_W = plan.win_hw
    XWIN_X, XWIN_Y = plan.xwin_xy
    blk = lambda i, *_: (i, 0, 0)
    tiles = pl.pallas_call(
        functools.partial(_h_kernel, WIN_H=WIN_H, WIN_W=WIN_W),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE_H, WIN_W), blk),
                pl.BlockSpec((1, TILE_H, WIN_W), blk),
                pl.BlockSpec((1, WIN_W, TILE_W), blk),
                pl.BlockSpec((1, N_TAP, TILE_H, TILE_W),
                             lambda i, *_: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TILE_H, TILE_W), blk),
        ),
        out_shape=jax.ShapeDtypeStruct((T, TILE_H, TILE_W), jnp.float32),
    )(a["wy"], a["wx"], fish, a["yl"], a["fy"], a["p0"], a["w8"])

    Tc = plan.c_tile.shape[0]
    if Tc:
        fishT = jnp.pad(fish32.T, ((0, HpT - Wsrc), (0, WpT - Hsrc)),
                        mode="edge")
        tiles = pl.pallas_call(
            functools.partial(_x_kernel, XWIN_X=XWIN_X, XWIN_Y=XWIN_Y),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(Tc,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
                + [pl.BlockSpec((1, TILE_H, TILE_W), blk)] * 5
                + [pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(
                    (1, TILE_H, TILE_W),
                    lambda i, ct, wx, wy: (ct[i], 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((T, TILE_H, TILE_W), jnp.float32),
            input_output_aliases={9: 0},
        )(a["c_tile"], a["c_wx"], a["c_wy"], fishT, a["c_yl"], a["c_fy"],
          a["c_xl"], a["c_fx"], a["c_valid"], tiles)

    faces = tiles.reshape(5, n_ty, n_tx, TILE_H, TILE_W)
    faces = faces.transpose(0, 1, 3, 2, 4).reshape(
        5, n_ty * TILE_H, n_tx * TILE_W)
    return faces[:, :fh, :fw]
