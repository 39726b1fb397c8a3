"""Ablate the v2 project+sample kernel to attribute its 233 ms/eval cost.

Variants:
  full          — the real kernel (baseline)
  no_construct  — skip hat-weight iota/abs/max (constant weights)
  no_matmul     — skip the MXU contraction (broadcast window mean)
  no_transpose  — skip the (1,P)->(P,1) relayouts (keeps tile-shaped math)
  no_project    — skip the camera-projection math (identity coords)
Window sizes and weight dtype are parameters.
"""

import os
import sys
import time
import functools

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H, TILE_W = 16, 128


def make_kernel(ww, wh, c, mode, wdtype):
    def _kernel(xs_ref, ys_ref, src_ref, out_ref, valid_ref, win_ref, sems):
        n_idx = pl.program_id(0)
        hs, ws = src_ref.shape[2], src_ref.shape[3]
        th, tw = xs_ref.shape[1], xs_ref.shape[2]
        p = th * tw

        xt = xs_ref[0] - 0.5
        yt = ys_ref[0] - 0.5
        finite = jnp.isfinite(xt) & jnp.isfinite(yt)
        xt = jnp.clip(jnp.where(finite, xt, 0.0), 0.0, ws - 1.0)
        yt = jnp.clip(jnp.where(finite, yt, 0.0), 0.0, hs - 1.0)

        ox = jnp.clip(jnp.min(xt).astype(jnp.int32) // 128, 0, max((ws - ww) // 128, 0)) * 128
        oy = jnp.clip(jnp.min(yt).astype(jnp.int32) // 8, 0, max((hs - wh) // 8, 0)) * 8
        ox = pl.multiple_of(ox, 128)
        oy = pl.multiple_of(oy, 8)
        copies = [
            pltpu.make_async_copy(
                src_ref.at[n_idx, ci, pl.ds(oy, wh), pl.ds(ox, ww)],
                win_ref.at[ci], sems.at[ci])
            for ci in range(c)
        ]
        for cp in copies:
            cp.start()

        in_win_t = (xt >= ox) & (xt <= ox + (ww - 1.0)) & (yt >= oy) & (yt <= oy + (wh - 1.0))
        ok_t = (finite & in_win_t).astype(jnp.float32)
        valid_ref[...] = ok_t.reshape(1, th, tw)

        if mode == "no_transpose":
            # keep everything tile-shaped; fake the interpolation with
            # tile-shaped arithmetic of the same op count
            for ci, cp in enumerate(copies):
                cp.wait()
                win = win_ref[ci].astype(jnp.float32)
                acc = xt * 0.0
                acc = acc + jnp.sum(win) * 1e-6
                out_ref[0, ci] = acc * ok_t
            return

        x = xt.reshape(1, p).T
        y = yt.reshape(1, p).T
        lx = jnp.clip(x - ox.astype(jnp.float32), 0.0, ww - 1.0)
        ly = jnp.clip(y - oy.astype(jnp.float32), 0.0, wh - 1.0)

        if mode == "no_construct":
            wx = jnp.full((p, ww), 1.0 / ww, wdtype)
            wy = jnp.full((p, wh), 1.0 / wh, jnp.float32)
        else:
            jx = jax.lax.broadcasted_iota(jnp.int32, (p, ww), 1).astype(jnp.float32)
            wx = jnp.maximum(1.0 - jnp.abs(lx - jx), 0.0).astype(wdtype)
            jy = jax.lax.broadcasted_iota(jnp.int32, (p, wh), 1).astype(jnp.float32)
            wy = jnp.maximum(1.0 - jnp.abs(ly - jy), 0.0)

        ok_col = ok_t.reshape(1, p).T
        for ci, cp in enumerate(copies):
            cp.wait()
            win = win_ref[ci].astype(wdtype)
            if mode == "no_matmul":
                tmp = jnp.broadcast_to(jnp.sum(win.astype(jnp.float32)) * 1e-9, (p, wh))
            else:
                tmp = jax.lax.dot_general(
                    wx, win, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            out = jnp.sum(tmp * wy, axis=1, keepdims=True)
            out_ref[0, ci] = (out * ok_col).T.reshape(th, tw)

    return _kernel


@functools.partial(jax.jit, static_argnames=("mode", "ww", "wh", "wdtype"))
def run(xs, ys, src_planar, mode="full", ww=384, wh=48, wdtype=jnp.float32):
    n, h, w = xs.shape
    _, c, hs, ws = src_planar.shape
    grid = (n, h // TILE_H, w // TILE_W)
    tile_spec = pl.BlockSpec((1, TILE_H, TILE_W), lambda s, i, j: (s, i, j), memory_space=pltpu.VMEM)
    out, valid = pl.pallas_call(
        make_kernel(ww, wh, c, mode, wdtype),
        grid=grid,
        in_specs=[tile_spec, tile_spec, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, c, TILE_H, TILE_W), lambda s, i, j: (s, 0, i, j), memory_space=pltpu.VMEM),
            tile_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((c, wh, ww), src_planar.dtype),
            pltpu.SemaphoreType.DMA((c,)),
        ],
    )(xs, ys, src_planar)
    return out, valid


def main():
    N, H, W = 16, 1536, 2048
    HS, WS = 1536, 2048
    key = jax.random.PRNGKey(0)
    src = jax.random.uniform(key, (N, 3, HS, WS), jnp.float32).astype(jnp.bfloat16)
    # smooth near-identity warp
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    xs0 = jnp.broadcast_to(xx * 0.98 + 5.0, (N, H, W))
    ys0 = jnp.broadcast_to(yy * 0.98 + 3.0, (N, H, W))
    src = jax.block_until_ready(src)

    def timeit(mode, ww, wh, wdtype, n_it=4):
        f = lambda i: run(xs0 + 1e-3 * i, ys0, src, mode=mode, ww=ww, wh=wh, wdtype=wdtype)
        for i in range(2):
            jax.block_until_ready(f(100 + i))
        ts = []
        for i in range(n_it):
            t0 = time.perf_counter()
            out, valid = f(i)
            s = float(out[0, 0, :8, :8].sum())  # small readback forces completion
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for mode in ("full", "no_construct", "no_matmul", "no_project", "no_transpose"):
        if mode == "no_project":
            continue
        t = timeit(mode, 384, 48, jnp.float32)
        print(f"{mode:14s} ww=384 wh=48 f32: {t*1e3:8.1f} ms", flush=True)
    for (ww, wh, wd, tag) in ((384, 48, jnp.bfloat16, "bf16-weights"),
                              (384, 32, jnp.float32, "wh32"),
                              (256, 32, jnp.float32, "ww256-wh32"),
                              (384, 32, jnp.bfloat16, "wh32-bf16")):
        t = timeit("full", ww, wh, wd)
        print(f"full {tag:18s}: {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
