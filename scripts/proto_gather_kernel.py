"""Prototype: Pallas patch-gather kernel (aligned DMAs + in-kernel unaligned
extract) vs vmapped dynamic_slice."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 1950, 1950
PATCH = 48          # padded output patch (43 data + 5 pad)
PR = 21
K = 2048
BATCH = 16
WIN_H, WIN_W = 56, 256   # aligned DMA window

rng = np.random.default_rng(0)
img = np.zeros((H + 64, W + 384), np.float32)   # generous pad for windows
img[:H + 2 * PR, :W + 2 * PR] = rng.uniform(
    0, 255, (H + 2 * PR, W + 2 * PR)).astype(np.float32)
img = jnp.asarray(img)
ys = jnp.asarray(rng.integers(0, H, K), jnp.int32)   # top-left of patch
xs = jnp.asarray(rng.integers(0, W, K), jnp.int32)


def kernel(yal_ref, dy_ref, xal_ref, dx_ref, img_ref, out_ref, scratch, sems):
    p = pl.program_id(0)
    base = p * BATCH

    def start(i, _):
        y = pl.multiple_of(yal_ref[base + i], 8)
        x = pl.multiple_of(xal_ref[base + i], 128)
        pltpu.make_async_copy(
            img_ref.at[pl.ds(y, WIN_H), pl.ds(x, WIN_W)],
            scratch.at[i], sems.at[i]).start()
        return 0

    jax.lax.fori_loop(0, BATCH, start, 0, unroll=True)

    def extract(i, _):
        y = pl.multiple_of(yal_ref[base + i], 8)
        x = pl.multiple_of(xal_ref[base + i], 128)
        pltpu.make_async_copy(
            img_ref.at[pl.ds(y, WIN_H), pl.ds(x, WIN_W)],
            scratch.at[i], sems.at[i]).wait()
        w = scratch[i]
        w = pltpu.roll(w, shift=-dy_ref[base + i], axis=0)
        w = pltpu.roll(w, shift=-dx_ref[base + i], axis=1)
        out_ref[i] = w[:PATCH, :PATCH]
        return 0

    jax.lax.fori_loop(0, BATCH, extract, 0, unroll=True)


@jax.jit
def pallas_gather(img, ys, xs):
    yal = ys & ~7
    dy = ys - yal
    xal = xs & ~127
    dx = xs - xal
    grid = (K // BATCH,)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((BATCH, PATCH, PATCH),
                                   lambda i, *_: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((BATCH, WIN_H, WIN_W), jnp.float32),
                pltpu.SemaphoreType.DMA((BATCH,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((K, PATCH, PATCH), jnp.float32),
    )(yal, dy, xal, dx, img)


@jax.jit
def xla_gather(img, ys, xs):
    def one(y, x):
        return jax.lax.dynamic_slice(img, (y, x), (PATCH, PATCH))
    return jax.vmap(one)(ys, xs)


def bench(name, fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms")
    return out


a = bench("pallas gather (aligned DMA + extract)", pallas_gather, img, ys, xs)
b = bench("vmapped dynamic_slice", xla_gather, img, ys, xs)
print("equal:", bool(jnp.all(a == b)))
