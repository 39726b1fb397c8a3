"""Pallas TPU kernel: dense bilinear warp sampling for the plane-sweep cost.

The hot op of depth estimation is sampling each source image at per-pixel
warped coordinates (Derp.cpp:176-196 via computeWarpDstToSrc). XLA lowers
that to a row-at-a-time HBM gather (~300M rows/s measured on v5e) which
caps a 2K 16-camera cost evaluation at seconds. TPUs have no hardware
gather — but the plane-sweep warp is *smooth*: the source pixels needed by
one destination tile live in a small bounding window.

This kernel exploits that structure:

  1. per (8, 128) destination tile, compute the window origin from the
     min of the tile's coordinates (scalar reduce),
  2. one dynamic-slice DMA pulls a (WH, WW) window of one source channel
     into VMEM (sources channel-planar (N, C, H, W); the window origin is
     aligned down to the (8, 128) HBM tiling, with window margin to spare),
  3. bilinear interpolation becomes hat-weight contractions: the
     x-contraction runs on the MXU — tmp(p, y) = Σ_x hat_x(p, x) win(y, x),
     a dot_general contracting the window's lane axis — and the
     y-contraction is a tiny VPU multiply-reduce,
  4. pixels whose coordinates fall outside the window (extreme warp
     magnification, e.g. at fisheye FOV edges) come back with valid=0 —
     the cost combiner already treats "source doesn't see this pixel"
     exactly that way.

Turning the gather into dense DMA + matmul moves the op from the gather
unit to the MXU. Grid = (source, channel, tile row, tile col): all sources
and channels stream through one compiled kernel body.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 16
TILE_W = 128
# MXU precision for the interpolation contraction. DEFAULT rounds the window
# to bf16 (error ~2e-3 — below the 1/255 quantization of 8-bit sources);
# HIGHEST is f32-exact at ~1.35x the eval cost. Exactness tests force HIGHEST.
MATMUL_PRECISION = jax.lax.Precision.DEFAULT
# Source window per tile. Covers warp magnifications up to ~WW/TILE_W in x
# and ~WH/TILE_H in y; beyond that samples are flagged invalid.
WINDOW_H = 48   # sublane axis: origin aligned to 8, usable span WH-8
WINDOW_W = 384  # lane axis: origin aligned to 128, usable span WW-128


def _default_interpret() -> bool:
    # Pallas TPU kernels only compile on TPU; on the CPU backend (tests,
    # virtual multi-chip meshes) fall back to the interpreter.
    return jax.default_backend() != "tpu"


def _make_kernel(ww: int, wh: int, c: int, precision=None):
    precision = MATMUL_PRECISION if precision is None else precision

    def _kernel(xs_ref, ys_ref, src_ref, out_ref, valid_ref, win_ref, sems):
        # src_ref: (N, C, H_s, W_s) full stack in HBM; slice by grid coords
        n_idx = pl.program_id(0)
        hs, ws = src_ref.shape[2], src_ref.shape[3]
        th, tw = xs_ref.shape[1], xs_ref.shape[2]
        p = th * tw

        # (1, TH, TW) -> (P, 1): the only vector relayouts Mosaic accepts
        # here are a (1, P) reshape followed by a 2D transpose
        x = xs_ref[...].reshape(1, p).T - 0.5
        y = ys_ref[...].reshape(1, p).T - 0.5
        finite = jnp.isfinite(x) & jnp.isfinite(y)
        # clamp-to-edge semantics for in-image coords (CvUtil getPixelBilinear)
        x = jnp.clip(jnp.where(finite, x, 0.0), 0.0, ws - 1.0)
        y = jnp.clip(jnp.where(finite, y, 0.0), 0.0, hs - 1.0)

        # window origin aligned down to the HBM (8, 128) tile grid;
        # pl.multiple_of asserts the alignment Mosaic can't infer through
        # the clip
        ox = jnp.clip(jnp.min(x).astype(jnp.int32) // 128, 0, max((ws - ww) // 128, 0)) * 128
        oy = jnp.clip(jnp.min(y).astype(jnp.int32) // 8, 0, max((hs - wh) // 8, 0)) * 8
        ox = pl.multiple_of(ox, 128)
        oy = pl.multiple_of(oy, 8)

        # one DMA per channel, all in flight together (one grid step per
        # tile amortizes the per-step overhead across channels)
        copies = [
            pltpu.make_async_copy(
                src_ref.at[n_idx, ci, pl.ds(oy, wh), pl.ds(ox, ww)],
                win_ref.at[ci],
                sems.at[ci],
            )
            for ci in range(c)
        ]
        for cp in copies:
            cp.start()

        lx = x - ox.astype(jnp.float32)  # (P, 1)
        ly = y - oy.astype(jnp.float32)
        in_win = (lx >= 0.0) & (lx <= ww - 1.0) & (ly >= 0.0) & (ly <= wh - 1.0)
        lx = jnp.clip(lx, 0.0, ww - 1.0)
        ly = jnp.clip(ly, 0.0, wh - 1.0)

        # hat weights: exactly the two bilinear taps per axis, shared by
        # all channels
        jx = jax.lax.broadcasted_iota(jnp.int32, (p, ww), 1).astype(jnp.float32)
        wx = jnp.maximum(1.0 - jnp.abs(lx - jx), 0.0)  # (P, WW)
        jy = jax.lax.broadcasted_iota(jnp.int32, (p, wh), 1).astype(jnp.float32)
        wy = jnp.maximum(1.0 - jnp.abs(ly - jy), 0.0)  # (P, WH)

        ok = (finite & in_win).astype(jnp.float32)
        valid_ref[...] = ok.T.reshape(1, th, tw)

        for ci, cp in enumerate(copies):
            cp.wait()
            win = win_ref[ci].astype(jnp.float32)  # (WH, WW)
            # x-contraction on the MXU (contract both operands' lane axis),
            # y-contraction on the VPU
            tmp = jax.lax.dot_general(
                wx, win, (((1,), (1,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )  # (P, WH)
            out = jnp.sum(tmp * wy, axis=1, keepdims=True)  # (P, 1)
            out_ref[0, ci] = (out * ok).T.reshape(th, tw)

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def warp_sample_planar(src_planar: jnp.ndarray, coords: jnp.ndarray, interpret: bool | None = None, precision=None):
    """Multi-source bilinear warp sampling, one launch.

    src_planar: (N, C, H_s, W_s) — channel-planar source stack
        (see ``planar_for_sampling``).
    coords: (N, H, W, 2) as (x, y) pixel-center coords, one warp field per
        source.
    Returns (sampled (N, C, H, W) float32 — channel-planar, see NOTE at the
    return — and valid (N, H, W) float32 {0,1}). Out-of-window samples
    (magnification beyond (WINDOW_W-128)/TILE_W in x or (WINDOW_H-8)/TILE_H
    in y) have valid=0 and sampled=0.
    """
    if interpret is None:
        interpret = _default_interpret()
    n, h, w = coords.shape[:3]
    _, c, hs, ws = src_planar.shape
    assert h % TILE_H == 0 and w % TILE_W == 0, (h, w)
    grid = (n, h // TILE_H, w // TILE_W)
    ww = min(WINDOW_W, (ws // 128) * 128) or min(WINDOW_W, ws)
    wh = min(WINDOW_H, (hs // 8) * 8) or min(WINDOW_H, hs)

    xs = coords[..., 0]
    ys = coords[..., 1]
    tile_spec = pl.BlockSpec(
        (1, TILE_H, TILE_W), lambda s, i, j: (s, i, j), memory_space=pltpu.VMEM
    )

    out, valid = pl.pallas_call(
        _make_kernel(ww, wh, c, precision),
        grid=grid,
        in_specs=[
            tile_spec,
            tile_spec,
            pl.BlockSpec(memory_space=pl.ANY),  # whole stack stays in HBM
        ],
        out_specs=(
            pl.BlockSpec(
                (1, c, TILE_H, TILE_W), lambda s, i, j: (s, 0, i, j), memory_space=pltpu.VMEM
            ),
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
        interpret=interpret,
    )(xs, ys, src_planar)
    # NOTE: output stays channel-planar (N, C, H, W) — a trailing C=3 axis
    # would land on the 128-wide lane dimension and waste 97% of every tile
    return out, valid


def planar_for_sampling(imgs: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, C, H, W): channel-planar layout so each tile's
    source window is one (8, 128)-tileable 2D dynamic slice per channel."""
    return jnp.transpose(imgs, (0, 3, 1, 2))


def pad_to_tiles(x: jnp.ndarray):
    """Pad leading (H, W) dims up to the tile grid with edge values (zero
    padding would poison the per-tile window-origin min in the kernel).
    Returns (padded, (H, W))."""
    h, w = x.shape[:2]
    ph = (-h) % TILE_H
    pw = (-w) % TILE_W
    if ph or pw:
        pad = [(0, ph), (0, pw)] + [(0, 0)] * (x.ndim - 2)
        x = jnp.pad(x, pad, mode="edge")
    return x, (h, w)


def pad_to_tiles_nhw(x: jnp.ndarray):
    """Pad the (H, W) dims of an (N, H, W, ...) stack to the tile grid with
    edge values (see pad_to_tiles)."""
    h, w = x.shape[1:3]
    ph = (-h) % TILE_H
    pw = (-w) % TILE_W
    if ph or pw:
        pad = [(0, 0), (0, ph), (0, pw)] + [(0, 0)] * (x.ndim - 3)
        x = jnp.pad(x, pad, mode="edge")
    return x, (h, w)


def warp_sample_multi(src_imgs_t: jnp.ndarray, coords: jnp.ndarray, interpret: bool | None = None):
    """Multi-source sampling from the (N, C, H, W) planar stack."""
    return warp_sample_planar(src_imgs_t, coords, interpret=interpret)


def warp_sample(src_img: jnp.ndarray, coords: jnp.ndarray, interpret: bool | None = None):
    """Single-source convenience wrapper over arbitrary (H, W): accepts an
    (H, W, C) image + (H, W, 2) coords, handles layout and tile padding.
    Returns interleaved (H, W, C) samples (convenience shape; the hot path
    uses warp_sample_planar's channel-planar output directly)."""
    if src_img.ndim == 2:
        src_img = src_img[..., None]
    src_planar = planar_for_sampling(src_img[None])
    coords_p, (h, w) = pad_to_tiles(coords)
    out, valid = warp_sample_planar(src_planar, coords_p[None], interpret=interpret)
    return jnp.moveaxis(out[0], 0, -1)[:h, :w], valid[0, :h, :w]
