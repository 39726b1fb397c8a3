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
unit to the MXU.

Three kernels live here:

- ``warp_sample_planar`` (v1): the general API — caller-supplied warp
  coordinates, any source stack. Useful for arbitrary warps; no longer on
  the depth hot path.
- ``project_sample_planar_v4`` / ``project_sample_packed``: the hot path —
  the plane-sweep projection math runs IN-kernel from (disparity, rays), so
  warp fields never touch HBM. The packed variant writes its output straight
  into ssd_combine's padded window layout with validity embedded in channel
  0 (no separate valid/clip planes, no XLA pad between the kernels — on this
  chip every full-HBM rewrite costs ~25-40 ms).
- ``ssd_combine`` (k2): bias-compensated 3x3 patch SSDs + drop-2-worst
  combine, consuming either layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 16
TILE_W = 128
# MXU precision for the interpolation contractions. Mosaic rounds operands
# to bf16 at DEFAULT regardless of the flag, and HIGHEST multiplies the pass
# count (~2.4x wall-clock at 2K) — so the kernels are built to be EXACT at
# DEFAULT instead: subpixel weights quantize to 1/256 px (hat weights k/256
# are exact in bf16's 8 significand bits) and the image window splits
# hi = bf16(win) / lo = win - hi across two contractions (lo's own bf16
# rounding contributes <= ~1e-5). Exactness tests may still force HIGHEST.
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
        # 1/256-px quantization -> hat weights exactly representable in bf16
        # (see MATMUL_PRECISION comment)
        lx = jnp.round(lx * 256.0) * (1.0 / 256.0)
        ly = jnp.round(ly * 256.0) * (1.0 / 256.0)

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


def pad_to_tiles(x: jnp.ndarray, th: int = TILE_H, tw: int = TILE_W):
    """Pad leading (H, W) dims up to the tile grid with edge values (zero
    padding would poison the per-tile window-origin min in the kernel).
    Returns (padded, (H, W))."""
    h, w = x.shape[:2]
    ph = (-h) % th
    pw = (-w) % tw
    if ph or pw:
        pad = [(0, ph), (0, pw)] + [(0, 0)] * (x.ndim - 2)
        x = jnp.pad(x, pad, mode="edge")
    return x, (h, w)


def pad_to_tiles_nhw(x: jnp.ndarray, th: int = TILE_H, tw: int = TILE_W):
    """Pad the (H, W) dims of an (N, H, W, ...) stack to the tile grid with
    edge values (see pad_to_tiles)."""
    h, w = x.shape[1:3]
    ph = (-h) % th
    pw = (-w) % tw
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


# ---------------------------------------------------------------------------
# Packed camera parameters + in-kernel projection helpers (used by v4).
#
# The projection is computed per tile inside the kernel - world point,
# rotation, the four projection models, polynomial distortion, FOV/sensor
# validity - so warp fields never touch HBM (materializing (N, H, W, 2)
# coords per candidate made ping-pong HBM-bound). atan/atan2 are not
# implemented by the Mosaic lowering; a Cephes-style polynomial provides
# them to ~1e-7.
# ---------------------------------------------------------------------------

# packed per-source camera parameters (see pack_camera_params)
PARAM_POS = 0        # 3: position
PARAM_ROT = 3        # 9: rotation rows (right, up, backward)
PARAM_PRINCIPAL = 12 # 2
PARAM_FOCAL = 14     # 2
PARAM_DIST = 16      # 3: distortion
PARAM_DIST_MAX = 19  # 1
PARAM_COS_FOV = 20   # 1
PARAM_TYPE = 21      # 1: type code (0 FTHETA, 1 RECTILINEAR, 2 EQUISOLID, 3 ORTHOGRAPHIC)
PARAM_RES = 22       # 2: resolution (normalized rigs: 1, 1)
PARAM_SIZE = 24


def pack_camera_params(cams) -> jnp.ndarray:
    """Stacked Camera pytree (N,) -> (N, PARAM_SIZE) f32 for SMEM prefetch."""
    import numpy as _np

    def g(a):
        return _np.asarray(a, _np.float32)

    n = g(cams.position).shape[0]
    out = _np.zeros((n, PARAM_SIZE), _np.float32)
    out[:, PARAM_POS:PARAM_POS + 3] = g(cams.position)
    out[:, PARAM_ROT:PARAM_ROT + 9] = g(cams.rotation).reshape(n, 9)
    out[:, PARAM_PRINCIPAL:PARAM_PRINCIPAL + 2] = g(cams.principal)
    out[:, PARAM_FOCAL:PARAM_FOCAL + 2] = g(cams.focal)
    out[:, PARAM_DIST:PARAM_DIST + 3] = g(cams.distortion)
    out[:, PARAM_DIST_MAX] = g(cams.distortion_max)
    out[:, PARAM_COS_FOV] = g(cams.cos_fov)
    out[:, PARAM_TYPE] = g(cams.type_code)
    out[:, PARAM_RES:PARAM_RES + 2] = g(cams.resolution)
    return jnp.asarray(out)


def _atan_pos(x):
    """atan for x >= 0 (Cephes atanf polynomial; Mosaic lacks atan)."""
    big = x > 2.414213562373095
    mid = x > 0.4142135623730951
    safe = jnp.maximum(x, 1e-30)
    xa = jnp.where(big, -1.0 / safe, jnp.where(mid, (x - 1.0) / (x + 1.0), x))
    y0 = jnp.where(big, jnp.float32(np.pi / 2), jnp.where(mid, jnp.float32(np.pi / 4), 0.0))
    z = xa * xa
    y = (((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
         - 3.33329491539e-1) * z * xa + xa
    return y0 + y


def _atan2_nonneg(a, b):
    """atan2(a, b) for a >= 0."""
    t = _atan_pos(a / jnp.maximum(jnp.abs(b), 1e-30))
    return jnp.where(b > 0, t, jnp.where(b < 0, jnp.float32(np.pi) - t, jnp.float32(np.pi / 2)))


# ---------------------------------------------------------------------------
# Kernel v4: transpose-free, channel-stacked project + sample.
#
# Ablations on v5e attributed v2's 254 ms/eval to (a) ~94 ms of
# (1,P)<->(P,1) vector relayouts, (b) ~100 ms of MXU time dominated by the
# output's 48 rows padding to 128, (c) ~43 ms of hat-weight construction.
# v4 removes (a) and divides (b) by 3:
#
#   - pixels stay in the LANE dimension throughout: hat weights are built
#     as (WW, P) / (WH, P) by broadcasting the (1, P) coordinate row over
#     sublanes (the (TH, TW) -> (1, P) reshape is a no-op relayout, unlike
#     the (P, 1) transpose v2 used);
#   - all C channels' windows stack into ONE (C*WH, WW) LHS so the matmul
#     is (C*WH, WW) x (WW, P) -> (C*WH, P): one 128-row MXU pass for
#     C=3, WH=32 instead of three 48->128-padded passes.
# ---------------------------------------------------------------------------

# Default v4 tile geometry (round-3 sweep on v5e, tools note in NOTES_ROUND4):
# dst tiles are (24, 128) so the stacked window is C*40 = 120 MXU rows — one
# nearly-full 128-row pass (the old 16x128/32-row config wasted 25% of the
# pass on padding; measured 88 vs 96 ms per 2K 16-src sampler launch).
#
# ww=256 (measured 70 vs 86 ms at 2K x 16 src: the x-contraction, the weight
# build, and the window DMA all scale with ww) clips ~0.09% of samples when a
# tile's source x-span exceeds 254 px — scattered random-proposal candidates
# or magnification > ~2. Clipping is algorithmically SAFE: the pixel's cost
# for that candidate becomes FLT_MAX (cost.cost_for_disparity's any_clip
# guard), so the solver merely keeps its carried disparity there — it never
# corrupts the combine (round-2's bug was dropping the source instead of
# poisoning the candidate). The quality contract (bench RMSE/MSSIM, golden
# tests) holds with 256 — see NOTES_ROUND4.
V4_TILE_H = 24     # dst tile rows (tile width stays TILE_W = 128)
V4_WINDOW_H = 40   # sublane axis: origin aligned to 8 -> y-magnification <= (40-8-2)/24
V4_WINDOW_W = 256  # lane axis: origin aligned to 128 -> x-magnification <= (256-128-2)/128


def _make_project_kernel_v4(ww: int, wh: int, c: int, hs: int, ws: int, precision=None,
                            src_exact_bf16: bool = False, g: int = 1,
                            ablate: str = "", packed: tuple | None = None,
                            ay: int = 8):
    """hs/ws are the TRUE source dims; src_ref may carry (ay, 128)-aligned
    edge padding beyond them (small pyramid levels).

    ``ay`` is the window's y-anchor alignment = the source stack's DMA
    sublane tile: 8 for an f32 stack, 16 for bf16 (whose (16, 128) tiling
    makes 8-row offsets unaddressable). wh must be a multiple of ay.

    ``g`` sources are handled per grid step (multi-src batching): the
    per-launch fixed costs — grid sequencing, disp/rays block loads, the
    src-independent world-point math — amortize over g sources, and the
    window DMA of source k overlaps the weight-build/matmul of source k-1.

    ``packed``: None for the plain layout (BlockSpec'd sampled/valid/clip
    outputs), or ``(h0, w0)`` to write straight into ssd_combine's padded
    window layout — sampled and a combined valid/clip plane val3 (1 valid,
    -1 clipped, 0 invisible) land at element offset (8, 128) of pl.ANY
    outputs via manual DMA, with the 1-px reflect-101 ring (rows/cols
    -1 := 1, h0 := h0-2, w0 := w0-2) written as slivers by the border
    tiles. This removes the XLA pad of the (N, C, H, W) stack between the
    kernels, which dominated the combine stage (measured 41 of 43 ms at
    2K x 16 src: a full-HBM rewrite per eval).
    """
    precision = MATMUL_PRECISION if precision is None else precision
    pi = float(np.pi)

    def _kernel(params_ref, dstpos_ref, disp_ref, rays_ref, src_ref, *rest):
        if packed is None:
            out_ref, valid_ref, clip_ref, win_ref, sems = rest
        else:
            samp_any, win_ref, sems, out_s, sliver_s, wsems, ssem = rest
        n0 = pl.program_id(0) * g
        grid_i = pl.program_id(1)
        grid_j = pl.program_id(2)
        hs_pad, ws_pad = src_ref.shape[2], src_ref.shape[3]
        th, tw = disp_ref.shape
        p = th * tw

        # ---- src-independent: dst world points (TH, TW), computed once ----
        disp = disp_ref[...]
        depth = 1.0 / jnp.maximum(disp, 1e-12)
        wx_ = dstpos_ref[0, 0] + rays_ref[0] * depth
        wy_ = dstpos_ref[0, 1] + rays_ref[1] * depth
        wz_ = dstpos_ref[0, 2] + rays_ref[2] * depth

        def project(n_idx):
            """Project the tile's world points into source n_idx."""

            def P(i):
                return params_ref[n_idx, i]

            ox_, oy_, oz_ = wx_ - P(PARAM_POS), wy_ - P(PARAM_POS + 1), wz_ - P(PARAM_POS + 2)
            r = PARAM_ROT
            vx = P(r + 0) * ox_ + P(r + 1) * oy_ + P(r + 2) * oz_
            vy = P(r + 3) * ox_ + P(r + 4) * oy_ + P(r + 5) * oz_
            vz = P(r + 6) * ox_ + P(r + 7) * oy_ + P(r + 8) * oz_

            xy_sq = vx * vx + vy * vy
            xy_norm = jnp.sqrt(xy_sq)
            full_sq = xy_sq + vz * vz
            full_norm = jnp.sqrt(full_sq)
            tiny = jnp.float32(1.1754944e-38)
            xy_safe = jnp.maximum(xy_norm, tiny)
            full_safe = jnp.maximum(full_norm, tiny)

            tc = P(PARAM_TYPE)
            r_ftheta = _atan2_nonneg(xy_norm, -vz)
            tan_half_pi = jnp.tan(jnp.float32(pi / 2))
            r_rect = jnp.where(-vz > 0, xy_norm / jnp.where(-vz > 0, -vz, 1.0), tan_half_pi)
            r_equi = 2.0 * jnp.sqrt(jnp.maximum((1.0 + vz / full_safe) / 2.0, 0.0))
            rr = jnp.where(tc == 0.0, r_ftheta, jnp.where(tc == 1.0, r_rect, r_equi))

            d0, d1, d2 = P(PARAM_DIST), P(PARAM_DIST + 1), P(PARAM_DIST + 2)
            rc = jnp.minimum(rr, P(PARAM_DIST_MAX))
            s2 = rc * rc
            dist_std = (1.0 + s2 * (d0 + s2 * (d1 + s2 * d2))) * rc
            sx_std = dist_std / xy_safe * vx
            sy_std = dist_std / xy_safe * vy
            pre_den = jnp.where(vz < 0, full_safe, xy_safe)
            px_ = vx / pre_den
            py_ = vy / pre_den
            pre_sq = px_ * px_ + py_ * py_
            f_ortho = 1.0 + pre_sq * (d0 + pre_sq * (d1 + pre_sq * d2))
            sx = jnp.where(tc == 3.0, f_ortho * px_, sx_std)
            sy = jnp.where(tc == 3.0, f_ortho * py_, sy_std)

            pix_x = P(PARAM_FOCAL) * sx + P(PARAM_PRINCIPAL)
            pix_y = P(PARAM_FOCAL + 1) * sy + P(PARAM_PRINCIPAL + 1)

            cf = P(PARAM_COS_FOV)
            dot = -vz
            outside_fov = dot * jnp.abs(dot) <= cf * jnp.abs(cf) * full_sq
            outside_fov &= cf != -1.0
            res_x, res_y = P(PARAM_RES), P(PARAM_RES + 1)
            inside_sensor = (pix_x >= 0) & (pix_x < res_x) & (pix_y >= 0) & (pix_y < res_y)
            xt = pix_x / res_x * ws - 0.5
            yt = pix_y / res_y * hs - 0.5
            finite = jnp.isfinite(xt) & jnp.isfinite(yt)
            ok0 = finite & inside_sensor & ~outside_fov & (disp > 0)

            xt = jnp.clip(jnp.where(finite, xt, 0.0), 0.0, ws - 1.0)
            yt = jnp.clip(jnp.where(finite, yt, 0.0), 0.0, hs - 1.0)
            return xt, yt, ok0

        # ---- pass 1: project every source in the batch, start its DMA ----
        state = []
        for gi in range(g):
            n_idx = n0 + gi
            xt, yt, ok0 = project(n_idx)

            # Window anchor from VALID pixels only, CENTERED on their span.
            # Invalid pixels clamp to coord 0 above; letting them into the
            # reduction drags the window away from the tile's real source
            # footprint and silently invalidates visible sources (edge tiles
            # straddling the source boundary) — the round-2 RMSE-tail bug.
            # Span-centering (vs the earlier valid-min anchor) matters on
            # FISHEYE rigs: near the warp's azimuthal singularity (dst rays
            # passing close to a source's optical axis) a handful of tile
            # pixels swing wide; a min anchor let those outliers drag the
            # window off the tile's dense footprint and clip the BULK
            # (measured 3.9% of visible samples on a 4-cam FTHETA ring vs
            # 0.05% true outliers). Centering clips only the outliers.
            # Guaranteed covered span under the 128/ay alignment: |x - xc| <=
            # (ww-128)/2, |y - yc| <= (wh-ay)/2 — the same ww >= 128*m + 130 /
            # wh >= 24*m + 2 + ay sizing rule auto_window already uses.
            big = jnp.float32(1e9)
            xmin = jnp.min(jnp.where(ok0, xt, big))
            ymin = jnp.min(jnp.where(ok0, yt, big))
            xmax = jnp.max(jnp.where(ok0, xt, -big))
            ymax = jnp.max(jnp.where(ok0, yt, -big))
            none_valid = xmin >= big
            xa = jnp.where(none_valid, 0.0, 0.5 * (xmin + xmax) - (ww - 128) * 0.5)
            ya = jnp.where(none_valid, 0.0, 0.5 * (ymin + ymax) - (wh - ay) * 0.5)
            ox = jnp.clip(xa.astype(jnp.int32) // 128, 0, max((ws_pad - ww) // 128, 0)) * 128
            oy = jnp.clip(ya.astype(jnp.int32) // ay, 0, max((hs_pad - wh) // ay, 0)) * ay
            ox = pl.multiple_of(ox, 128)
            oy = pl.multiple_of(oy, ay)
            # One DMA per channel into the stacked (C*WH, WW) window.
            # (measured on v5e: a single 3-D (C, WH, WW) copy into a
            # (g, c, wh, ww) scratch was ~2 ms SLOWER at 2K x 16 src — the
            # DMA cost here is per-(8,128)-tile processing, not descriptor
            # count, and the value-level reshape the 3-D layout forces on
            # the matmul LHS costs a relayout.)
            #
            # A source that sees NO pixel of this tile (outward-facing 360
            # rigs: each dst pixel is typically seen by a handful of the N
            # sources) skips its DMA and its whole pass-2 contraction — the
            # start here and the wait in pass 2 sit under the same
            # predicate, so the semaphore pairing holds. Ablation modes
            # keep the unconditional shape for stable timing splits.
            copies = [
                pltpu.make_async_copy(
                    src_ref.at[n_idx, ci, pl.ds(oy, wh), pl.ds(ox, ww)],
                    win_ref.at[gi, pl.ds(ci * wh, wh), :],
                    sems.at[gi, ci],
                )
                for ci in range(c)
            ] if ablate != "no_dma" else []
            sees_tile = jnp.any(ok0)
            if ablate:
                for cp in copies:
                    cp.start()
            else:
                @pl.when(sees_tile)
                def _():
                    for cp in copies:
                        cp.start()

            in_win_t = (xt >= ox) & (xt <= ox + (ww - 1.0)) & (yt >= oy) & (yt <= oy + (wh - 1.0))
            ok_t = (ok0 & in_win_t).astype(jnp.float32)
            # geometrically visible but outside the DMA window: the sample is
            # MISSING, not invisible. Consumers must treat the whole pixel's
            # cost as unevaluable (FLT_MAX), or the keep^2 renormalization
            # fabricates cheap false minima wherever scattered candidate maps
            # (random proposals) blow up a tile's source footprint — the
            # round-2 catastrophic-pixel bug.
            clip_t = (ok0 & ~in_win_t).astype(jnp.float32)
            if packed is None:
                valid_ref[gi] = ok_t.astype(valid_ref.dtype)
                clip_ref[gi] = clip_t.astype(clip_ref.dtype)
            state.append((xt, yt, ox, oy, ok_t, clip_t, copies, sees_tile))

        # ---- pass 2: weights + contraction per source (DMA k+1 overlaps) --
        # Hat weights with pixels on the LANE axis (no transposes). Mosaic
        # feeds the MXU in bf16 no matter what `precision` asks, so every
        # matmul operand here must be exactly bf16-representable or split.
        # Measured on v5e: unmitigated, the sampled colors carry ~2.5e-3 of
        # bf16 rounding — ~30% of the |dst-src| residual at the cost optimum,
        # which flipped solver decisions at low-texture pixels (the round-2
        # RMSE tail).
        #   (a) subpixel positions quantize to 1/256 px, making the hat
        #       weights k/256 (k<=255): exact in bf16's 8 significand bits
        #       (coordinate cost: <=1/512 px, far below projection noise);
        #   (b) the image window splits hi = bf16(win), lo = win - hi and
        #       contracts twice (lo's rounding error is ~2e-3 * 4e-3 = 8e-6);
        #       with src_exact_bf16 the sources are pre-quantized to k/256 so
        #       a SINGLE contraction is exact (and a bf16 source stack is
        #       then lossless: k/256 fits bf16's 8 significand bits exactly);
        #   (c) the y-contraction stays on the VPU as f32 pairwise adds —
        #       jnp.sum over sublanes also lowers through the MXU.
        jx = jax.lax.broadcasted_iota(jnp.int32, (ww, p), 0).astype(jnp.float32)
        jy = jax.lax.broadcasted_iota(jnp.int32, (wh, p), 0).astype(jnp.float32)
        # pad the row count to a power of two so the tree fold is pure
        # halving — the odd-count `.at[:1].add` fallback lowers to a
        # scatter-add whose empty index constant pallas cannot capture
        # under shard_map (it must be passed as an input)
        pow2 = 1
        while pow2 < wh:
            pow2 *= 2

        def emit_packed(gi, outs, ok_t, clip_t):
            """Write one source's tile into the k2-padded window layout.

            The bulk write is always the FULL (th, tw) tile at element offset
            (8 + i*th, 128 + j*tw) — TPU DMA requires (8, 128)-multiple slice
            shapes and 128-aligned lane offsets, so partial-edge clipping is
            not expressible. Instead the wrapper pads disparity/rays with ONE
            reflect-101 row/col (then edge), which makes the padded-region
            outputs EXACTLY the reflect ring values (same disparity + ray =>
            bit-identical projection and sample), so the bulk itself lays
            down the ring wherever grid padding exists. Slivers remain only
            for rings that fall OUTSIDE every bulk: the top ring row 7
            (always) and the bottom/right rings when the image is an exact
            tile multiple — each as a full (8, 128)-aligned block whose
            first row/last col holds the ring and whose junk lands either in
            never-read pad or in cells the SAME tile's bulk rewrites
            afterwards (DMA order enforced by waiting).

            Validity is EMBEDDED in channel 0 (samples are always >= 0):
            valid -> the sample, invisible -> -1, clipped -> -2. That drops
            the separate validity plane's HBM write and the combine
            kernel's validity fetch entirely (~230 MB per eval at 2K x 16
            src on a chip that copies HBM at ~47 GB/s)."""
            h0, w0 = packed
            n_idx = n0 + gi
            i, j = grid_i, grid_j
            # bulk/sliver destinations are aligned by construction (th % 8 ==
            # tw % 128 == 0) but Mosaic can't prove it through program_id
            dst_r = pl.multiple_of(8 + i * th, 8)
            dst_c = pl.multiple_of(128 + j * tw, 128)
            ilast, jlast = (h0 - 1) // th, (w0 - 1) // tw
            exact_h, exact_w = h0 % th == 0, w0 % tw == 0
            planes = [0, 1]
            # TWO int32 planes, not C f32 planes (round-4 HBM lever — the
            # ~29 ms/eval floor at 2K was the f32 sampled-stack writes at
            # this chip's ~47 GB/s, and the combine re-reads them):
            #   plane 0: validity + the R sample as 2^-24 fixed point —
            #     round(R * 2^24) >= 0 when valid (error <= 2^-25; values
            #     <= 2^24 convert exactly both ways), -1 invisible, -2
            #     clipped.
            #   plane 1: G and B as two u16 fixed-point samples in one
            #     int32 lane (G << 16 | B, scale 2^-16): samples live in
            #     [0, 1] (convex bilinear blend of [0, 1] sources), so the
            #     rounding error is <= 2^-17 per sample (PARITY deviation
            #     row; the top-end clamp adds <= 2^-16 above 1 - 2^-17).
            # Everything is integer ARITHMETIC, never a bitcast — Mosaic
            # aborts compiling f32<->i32 bitcasts here (array.h bounds
            # check), while f32<->i32 converts, shifts, and ors lower fine.
            # The power-of-two scales make every dequantizing multiply
            # EXACT in f32, so the path is deterministic under any XLA FMA
            # fusion (an inexact 1/65535 scale flipped rare argmin ties
            # between sharded and unsharded graphs). 32-bit lanes keep
            # every (8, 128) DMA alignment rule this emitter is built on;
            # a true u16 buffer would flip the layout to (16, 128) tiling.
            ch0 = jnp.where(
                ok_t > 0.0,
                jnp.round(jnp.maximum(outs[0], 0.0) * 16777216.0),
                -1.0 - clip_t,
            ).astype(jnp.int32)
            g_u = jnp.minimum(
                jnp.round(jnp.clip(outs[1], 0.0, 1.0) * 65536.0), 65535.0
            ).astype(jnp.int32)
            b_u = jnp.minimum(
                jnp.round(jnp.clip(outs[2], 0.0, 1.0) * 65536.0), 65535.0
            ).astype(jnp.int32)
            chgb = (g_u << 16) | b_u
            out_s[gi, 0] = ch0
            out_s[gi, 1] = chgb

            def plane_val(ci):
                return ch0 if ci == 0 else chgb

            def plane_dst(ci, rows, cols):
                # single flat .at: a chained TransformedRef at an unaligned
                # row offset fails Mosaic's tile-alignment proof
                return samp_any.at[n_idx, ci, rows, cols]

            def plane_src(ci):
                return out_s.at[gi, ci]

            def sliver_rows(src_row, dst_row, local_row):
                """(8, tw) block whose row ``local_row`` is tile row
                ``src_row``, written at buffer row ``dst_row`` (8-aligned —
                Mosaic requires tile-aligned offsets when slicing a 4-D HBM
                ref; junk rows land in never-read pad or are repaired by
                this tile's own bulk). start+wait: ordered vs later DMAs."""
                sub = jax.lax.broadcasted_iota(jnp.int32, (8, tw), 0)
                for ci in planes:
                    sliver_s[gi, ci, :8, :tw] = jnp.where(
                        sub == local_row, plane_val(ci)[src_row:src_row + 1, :], 0)
                    cp = pltpu.make_async_copy(
                        sliver_s.at[gi, ci, pl.ds(0, 8), pl.ds(0, tw)],
                        plane_dst(ci, pl.ds(dst_row, 8), pl.ds(dst_c, tw)),
                        ssem,
                    )
                    cp.start()
                    cp.wait()

            def sliver_cols(src_col, dst_col, local_col):
                """(th, 128) block whose column ``local_col`` is tile column
                ``src_col``, written with its column 0 at buffer ``dst_col``."""
                lane = jax.lax.broadcasted_iota(jnp.int32, (th, 128), 1)
                for ci in planes:
                    sliver_s[gi, ci, :th, :128] = jnp.where(
                        lane == local_col, plane_val(ci)[:, src_col:src_col + 1], 0)
                    cp = pltpu.make_async_copy(
                        sliver_s.at[gi, ci, pl.ds(0, th), pl.ds(0, 128)],
                        plane_dst(ci, pl.ds(dst_r, th), pl.ds(dst_col, 128)),
                        ssem,
                    )
                    cp.start()
                    cp.wait()

            def sliver_corner(src_row, src_col, dst_row, dst_col, local_row, local_col):
                """(8, 128) block with (local_row, local_col) = tile
                (src_row, src_col); dst offsets 8/128-aligned."""
                sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                for ci in planes:
                    v = plane_val(ci)[src_row, src_col]
                    sliver_s[gi, ci, :8, :128] = jnp.where(
                        (sub == local_row) & (lane == local_col), v, 0)
                    cp = pltpu.make_async_copy(
                        sliver_s.at[gi, ci, pl.ds(0, 8), pl.ds(0, 128)],
                        plane_dst(ci, pl.ds(dst_row, 8), pl.ds(dst_col, 128)),
                        ssem,
                    )
                    cp.start()
                    cp.wait()

            # --- pre-bulk slivers (their junk rows/cols are repaired by this
            # tile's own bulk, so they must complete first) ---
            @pl.when((i == 0) & (j == 0))
            def _():  # corner (7, 127) <- image (1, 1); junk: lead pad + left
                sliver_corner(1, 1, 0, 0, 7, 127)  # ring rows 0-6 (L fixes below)

            if exact_w:
                @pl.when((i == 0) & (j == jlast))
                def _():  # corner (7, 128+w0) <- (1, w0-2); junk: R ring rows
                    sliver_corner(1, tw - 2, 0, 128 + w0, 7, 0)  # 0-6 (R fixes)

            @pl.when(i == 0)
            def _():  # top ring row 7 <- row 1 (block [0, 8): junk = lead pad)
                sliver_rows(1, 0, 7)

            @pl.when(j == 0)
            def _():  # left ring col 127 <- col 1 (junk cols 0-126: lead pad)
                sliver_cols(1, 0, 127)

            if exact_w:
                @pl.when(j == jlast)
                def _():  # right ring col 128+w0 <- col w0-2 (junk: trail pad)
                    sliver_cols(tw - 2, 128 + w0, 0)

            # --- bulk: full tile, after the pre-bulk slivers ---
            cps = [
                pltpu.make_async_copy(
                    plane_src(ci),
                    plane_dst(ci, pl.ds(dst_r, th), pl.ds(dst_c, tw)),
                    wsems.at[gi, ci],
                )
                for ci in planes
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

            # --- post-bulk slivers (regions no bulk ever touches) ---
            if exact_h:
                @pl.when(i == ilast)
                def _():  # bottom ring row 8+h0 <- row th-2 (junk: below ring;
                    # 8+h0 is 8-aligned here since h0 % th == 0 and th % 8 == 0)
                    sliver_rows(th - 2, 8 + h0, 0)

                @pl.when((i == ilast) & (j == 0))
                def _():  # corner (8+h0, 127) <- (th-2, 1)
                    sliver_corner(th - 2, 1, 8 + h0, 0, 0, 127)

            if exact_h and exact_w:
                @pl.when((i == ilast) & (j == jlast))
                def _():  # corner (8+h0, 128+w0) <- (th-2, tw-2)
                    sliver_corner(th - 2, tw - 2, 8 + h0, 128 + w0, 0, 0)

        def emit(gi, outs, ok_t, clip_t):
            if packed is None:
                for ci in range(c):
                    out_ref[gi, ci] = outs[ci].astype(out_ref.dtype)
            else:
                emit_packed(gi, outs, ok_t, clip_t)

        for gi in range(g):
            xt, yt, ox, oy, ok_t, clip_t, copies, sees_tile = state[gi]
            if ablate == "proj_only":
                for cp in copies:
                    cp.wait()
                emit(gi, [jnp.zeros((th, tw), jnp.float32)] * c, ok_t, clip_t)
                continue

            def contract(gi=gi, xt=xt, yt=yt, ox=ox, oy=oy, ok_t=ok_t,
                         clip_t=clip_t, copies=copies):
                lxr = jnp.clip(xt - ox.astype(jnp.float32), 0.0, ww - 1.0).reshape(1, p)
                lyr = jnp.clip(yt - oy.astype(jnp.float32), 0.0, wh - 1.0).reshape(1, p)
                lxr = jnp.round(lxr * 256.0) * (1.0 / 256.0)
                lyr = jnp.round(lyr * 256.0) * (1.0 / 256.0)
                if ablate == "ones_wx":
                    wxT = jnp.broadcast_to(lxr * (1.0 / ww), (ww, p))
                else:
                    wxT = jnp.maximum(1.0 - jnp.abs(lxr - jx), 0.0)  # (WW, P), bf16-exact
                # (an explicit wxT.astype(bfloat16) to halve the weight
                # matrix's VMEM traffic measured ~4 ms SLOWER: Mosaic already
                # folds the f32->bf16 conversion into the MXU operand stream,
                # so the cast only adds a materialization pass)
                wyT = jnp.maximum(1.0 - jnp.abs(lyr - jy), 0.0)  # (WH, P), bf16-exact

                for cp in copies:
                    cp.wait()

                def xdot(lhs, rhs):
                    return jax.lax.dot_general(
                        lhs, rhs, (((1,), (0,)), ((), ())),
                        precision=precision, preferred_element_type=jnp.float32,
                    )

                if ablate == "skip_dot":
                    tmp = jnp.broadcast_to(wxT[:1].astype(jnp.float32) * wyT[:1], (c * wh, p))
                elif src_exact_bf16:
                    # sources quantized to k/256 at upload (cost.quantize_src):
                    # every window value is exactly bf16-representable, and
                    # (8-bit) x (8-bit) products fit f32 exactly — ONE
                    # contraction, no hi/lo split. With a bf16 stack the
                    # weights cast to bf16 too (they are k/256 = bf16-exact,
                    # so the products are BIT-identical to the f32 stack's)
                    # and the MXU runs native bf16 x bf16.
                    win = win_ref[gi][...]
                    tmp = xdot(win, wxT.astype(win.dtype))
                else:
                    win = win_ref[gi].astype(jnp.float32)  # (C*WH, WW)
                    win_hi = win.astype(jnp.bfloat16).astype(jnp.float32)
                    win_lo = win - win_hi
                    tmp = xdot(win_hi, wxT) + xdot(win_lo, wxT)  # (C*WH, P)
                okr = ok_t.reshape(1, p)
                outs = []
                for ci in range(c):
                    if ablate == "skip_fold":
                        outs.append((tmp[ci * wh:ci * wh + 1] * okr).reshape(th, tw))
                        continue
                    rows = tmp[ci * wh:(ci + 1) * wh] * wyT  # (WH, P) f32 on the VPU
                    if pow2 != wh:
                        rows = jnp.concatenate(
                            [rows, jnp.zeros((pow2 - wh, p), jnp.float32)], axis=0
                        )
                    n_rows = pow2
                    while n_rows > 1:
                        half = n_rows // 2
                        rows = rows[:half] + rows[half:2 * half]
                        n_rows = half
                    outs.append((rows * okr).reshape(th, tw))
                emit(gi, outs, ok_t, clip_t)

            if ablate:
                contract()
            else:
                # skip the weights/wait/contraction/fold for a source that
                # sees no pixel of this tile (predicate matches the DMA
                # start's); still write the zero samples + flags
                @pl.when(sees_tile)
                def _():
                    contract()

                @pl.when(jnp.logical_not(sees_tile))
                def _():
                    emit(gi, [jnp.zeros((th, tw), jnp.float32)] * c, ok_t, clip_t)

    return _kernel


# Sources per grid step (multi-src batching; sweep on v5e, see NOTES).
# The per-launch fixed costs (grid sequencing, block loads, world-point math)
# were ~40% of the sampler at g=1; g amortizes them and overlaps window DMAs
# across sources. Must divide the source count — auto-derated otherwise.
V4_SRCS_PER_LAUNCH = 4


def k2_tile_defaults(h0: int, w0: int, th: int | None = None, tw: int | None = None):
    """ssd_combine core-tile defaults, adaptive to the image: the 512-wide
    core's (tw+256)-wide fetch overfetches ~3x at small pyramid levels."""
    if th is None:
        th = K2_TILE_H
    if tw is None:
        tw = K2_TILE_W if w0 >= K2_TILE_W else 256
    return th, tw


def packed_pad_dims(h0: int, w0: int, k2_th: int | None = None, k2_tw: int | None = None):
    """Padded-buffer dims shared by project_sample_packed (writer) and
    ssd_combine (reader): leading (8, 128), image at (8+y, 128+x), sized to
    cover both v4's full-tile bulk writes and k2's window fetch reach."""
    k2_th, k2_tw = k2_tile_defaults(h0, w0, k2_th, k2_tw)
    hc = -(-h0 // V4_TILE_H) * V4_TILE_H
    wc = -(-w0 // TILE_W) * TILE_W
    r_pad = max(-(-h0 // k2_th) * k2_th + 16, hc + 16)
    c_pad = max(-(-w0 // k2_tw) * k2_tw + 256, wc + 256)
    return r_pad, c_pad


def _reflect1_grid_pad(x: jnp.ndarray, th: int, tw: int, hw_axes=(0, 1)):
    """Grid-pad the (H, W) axes where the FIRST padded row/col is the
    reflect-101 value (index h := h-2) and the rest are edge. With this,
    project_sample_packed's padded-region outputs ARE the reflect ring —
    identical disparity + ray give a bit-identical projection and sample —
    so the full-tile bulk writes lay the ring down wherever grid padding
    exists (see emit_packed)."""
    for axis, t in zip(hw_axes, (th, tw)):
        n = x.shape[axis]
        pn = (-n) % t
        if pn:
            idx = np.concatenate(
                [np.arange(n), [max(n - 2, 0)], np.full(pn - 1, n - 1)]
            ).astype(np.int32)
            x = jnp.take(x, jnp.asarray(idx), axis=axis)
    return x


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "precision", "out_dtype", "src_exact_bf16", "th", "tw", "wh_max",
        "ww_max", "srcs_per_launch", "_ablate"
    ),
)
def project_sample_planar_v4(
    src_planar: jnp.ndarray,   # (N, C, H_s, W_s)
    cam_params: jnp.ndarray,   # (N, PARAM_SIZE) from pack_camera_params
    dst_position: jnp.ndarray, # (3,)
    disparity: jnp.ndarray,    # (H, W)
    rays: jnp.ndarray,         # (3, H, W) dst ray planes
    interpret: bool | None = None,
    precision=None,
    out_dtype=jnp.float32,
    src_exact_bf16: bool = False,
    th: int | None = None,     # dst tile height (default V4_TILE_H)
    tw: int | None = None,     # dst tile width (default TILE_W)
    wh_max: int | None = None, # window rows (default V4_WINDOW_H)
    ww_max: int | None = None, # window cols (default V4_WINDOW_W)
    srcs_per_launch: int | None = None,  # default V4_SRCS_PER_LAUNCH
    _ablate: str = "",  # timing ablations only (tools/); NOT a correct kernel
):
    """Fused plane-sweep projection + bilinear sampling (kernel v4: see the
    section comment). Returns channel-planar (sampled (N, C, H, W), valid
    (N, H, W), clipped (N, H, W) — visible-but-unsampled flags whose pixels'
    costs must be treated as unevaluable)."""
    if interpret is None:
        interpret = _default_interpret()
    th = V4_TILE_H if th is None else th
    tw = TILE_W if tw is None else tw
    wh_max = V4_WINDOW_H if wh_max is None else wh_max
    ww_max = V4_WINDOW_W if ww_max is None else ww_max
    n = src_planar.shape[0]
    _, c, hs, ws = src_planar.shape
    g = V4_SRCS_PER_LAUNCH if srcs_per_launch is None else srcs_per_launch
    while n % g:
        g -= 1
    if src_planar.dtype == jnp.bfloat16 and not src_exact_bf16:
        # the hi/lo exactness split needs the f32 residual; a bf16 stack is
        # only lossless when pre-quantized to k/256 (cost.quantize_src)
        raise ValueError("bf16 source stack requires src_exact_bf16")
    # edge-pad sources to the (ay, 128) DMA tiling (ay = the dtype's sublane
    # tile: 16 for bf16); the kernel keeps using the TRUE dims for
    # projection/clipping, so small pyramid levels (w < 128) run the same
    # kernel instead of falling back to XLA gathers
    ay = 16 if src_planar.dtype == jnp.bfloat16 else 8
    ph, pw = (-hs) % ay, (-ws) % 128
    if ph or pw:
        src_planar = jnp.pad(src_planar, ((0, 0), (0, 0), (0, ph), (0, pw)), mode="edge")
    hs_pad, ws_pad = hs + ph, ws + pw
    disparity_p, (h0, w0) = pad_to_tiles(disparity, th, tw)
    rays_p, _ = pad_to_tiles_nhw(rays, th, tw)
    h, w = disparity_p.shape
    grid = (n // g, h // th, w // tw)
    ww = min(ww_max, ws_pad)
    wh = min(-(-min(wh_max, hs_pad) // ay) * ay, hs_pad)

    out, valid, clipped = pl.pallas_call(
        _make_project_kernel_v4(ww, wh, c, hs, ws, precision, src_exact_bf16, g, _ablate,
                                ay=ay),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cam params (N, PARAM_SIZE)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dst position (1, 4)
            pl.BlockSpec((th, tw), lambda s, i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, th, tw), lambda s, i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((g, c, th, tw), lambda s, i, j: (s, 0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, th, tw), lambda s, i, j: (s, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, th, tw), lambda s, i, j: (s, i, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, c, h, w), out_dtype),
            jax.ShapeDtypeStruct((n, h, w), out_dtype),
            jax.ShapeDtypeStruct((n, h, w), out_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((g, c * wh, ww), src_planar.dtype),
            pltpu.SemaphoreType.DMA((g, c)),
        ],
        interpret=interpret,
    )(
        jnp.asarray(cam_params, jnp.float32),
        jnp.pad(jnp.asarray(dst_position, jnp.float32), (0, 1)).reshape(1, 4),
        disparity_p.astype(jnp.float32),
        rays_p.astype(jnp.float32),
        src_planar,
    )
    return out[:, :, :h0, :w0], valid[:, :h0, :w0], clipped[:, :h0, :w0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "precision", "src_exact_bf16", "srcs_per_launch", "k2_th", "k2_tw",
        "ww_max", "wh_max",
    ),
)
def project_sample_packed(
    src_planar: jnp.ndarray,   # (N, C, H_s, W_s)
    cam_params: jnp.ndarray,   # (N, PARAM_SIZE)
    dst_position: jnp.ndarray, # (3,)
    disparity: jnp.ndarray,    # (H, W)
    rays: jnp.ndarray,         # (3, H, W)
    interpret: bool | None = None,
    precision=None,
    src_exact_bf16: bool = False,
    srcs_per_launch: int | None = None,
    k2_th: int | None = None,  # consumer (ssd_combine) tile dims; set the
    k2_tw: int | None = None,  # padded buffer extents
    ww_max: int | None = None,  # window cols (default V4_WINDOW_W; see
    wh_max: int | None = None,  # cost.auto_window for rig-derived sizing)
):
    """project_sample_planar_v4 writing DIRECTLY into ssd_combine's padded
    window layout, skipping the XLA pad of the sampled stack between the two
    kernels (a full-HBM rewrite per cost eval — measured 41 of the combine
    stage's 43 ms at 2K x 16 src).

    Returns sampled_p (N, C, R, W_p) where R = ceil(H/k2_th)*k2_th + 16 and
    W_p = ceil(W/k2_tw)*k2_tw + 256; image pixel (y, x) lives at
    (8 + y, 128 + x), with the reflect-101 ring at rows/cols 7, 8+H, 127,
    128+W. Validity is embedded in channel 0 (samples are >= 0): the sample
    when valid, -1 invisible, -2 clipped (visible but unsampled -> the
    pixel's cost is unevaluable). Regions beyond the ring are uninitialized
    — by construction no in-image patch reads them.
    """
    if interpret is None:
        interpret = _default_interpret()
    th, tw = V4_TILE_H, TILE_W
    k2_th, k2_tw = k2_tile_defaults(disparity.shape[0], disparity.shape[1], k2_th, k2_tw)
    n = src_planar.shape[0]
    _, c, hs, ws = src_planar.shape
    g = V4_SRCS_PER_LAUNCH if srcs_per_launch is None else srcs_per_launch
    while n % g:
        g -= 1
    if src_planar.dtype == jnp.bfloat16 and not src_exact_bf16:
        raise ValueError("bf16 source stack requires src_exact_bf16")
    ay = 16 if src_planar.dtype == jnp.bfloat16 else 8
    ph, pw = (-hs) % ay, (-ws) % 128
    if ph or pw:
        src_planar = jnp.pad(src_planar, ((0, 0), (0, 0), (0, ph), (0, pw)), mode="edge")
    hs_pad, ws_pad = hs + ph, ws + pw
    h0, w0 = disparity.shape
    disparity_p = _reflect1_grid_pad(jnp.asarray(disparity, jnp.float32), th, tw)
    rays_p = _reflect1_grid_pad(jnp.asarray(rays, jnp.float32), th, tw, hw_axes=(1, 2))
    h, w = disparity_p.shape
    grid = (n // g, h // th, w // tw)
    ww = min(V4_WINDOW_W if ww_max is None else ww_max, ws_pad)
    wh = min(-(-min(V4_WINDOW_H if wh_max is None else wh_max, hs_pad) // ay) * ay, hs_pad)
    r_pad, c_pad = packed_pad_dims(h0, w0, k2_th, k2_tw)

    sampled_p = pl.pallas_call(
        _make_project_kernel_v4(
            ww, wh, c, hs, ws, precision, src_exact_bf16, g, "", (h0, w0), ay=ay
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((th, tw), lambda s, i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, th, tw), lambda s, i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        # 2 int32 planes: validity + 2^-24 fixed-point R, and G|B as 2 x u16
        # (see emit_packed — integer arithmetic only, Mosaic has no bitcast)
        out_shape=jax.ShapeDtypeStruct((n, 2, r_pad, c_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((g, c * wh, ww), src_planar.dtype),
            pltpu.SemaphoreType.DMA((g, c)),
            pltpu.VMEM((g, 2, th, tw), jnp.int32),   # out tile staging
            pltpu.VMEM((g, 2, th, 128), jnp.int32),  # ring sliver staging
            pltpu.SemaphoreType.DMA((g, 2)),           # bulk write sems
            pltpu.SemaphoreType.DMA,                   # shared sliver sem
        ],
        interpret=interpret,
    )(
        jnp.asarray(cam_params, jnp.float32),
        jnp.pad(jnp.asarray(dst_position, jnp.float32), (0, 1)).reshape(1, 4),
        disparity_p.astype(jnp.float32),
        rays_p.astype(jnp.float32),
        src_planar,
    )
    return sampled_p


def pack_camera_params_traced(cams) -> jnp.ndarray:
    """pack_camera_params for traced (device) camera pytrees."""
    n = cams.position.shape[0]
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731

    def bcast(a, k):
        a = f32(a).reshape(n, -1)
        return a[:, :k]

    return jnp.concatenate(
        [
            bcast(cams.position, 3),
            f32(cams.rotation).reshape(n, 9),
            bcast(cams.principal, 2),
            bcast(cams.focal, 2),
            bcast(cams.distortion, 3),
            f32(cams.distortion_max).reshape(n, 1),
            f32(cams.cos_fov).reshape(n, 1),
            f32(cams.type_code).reshape(n, 1),
            bcast(cams.resolution, 2),
        ],
        axis=1,
    )


# ---------------------------------------------------------------------------
# Kernel k2: fused bias-compensated SSD + drop-2-worst combine.
#
# Consumes the channel-planar sampled stack straight from kernel v4 and
# emits (cost, confidence) maps, replacing the XLA-side ssd_planar +
# combine_top2 stage (measured ~123 ms/eval at 2K/16-src: XLA materializes
# the (N, C, H, W) diff intermediates in f32). Per (32, 256) tile it DMAs
# one (N, C, 48, 512) window of samples + validity + dst color (the halo
# rides the aligned leading (8, 128) pad, v3's trick), forms the 3x3 box
# sums with shifted adds in VMEM, and keeps a running two-worst-biased
# accumulator across sources (Derp.cpp:203-225 semantics, identical to
# cost.combine_top2).
# ---------------------------------------------------------------------------

HALO = 1  # 3x3 patch radius (Derp.h:26 kSearchWindowRadius)
# k2 core tile. The 1-px halo costs a full (8, 128) alignment ring on the
# window fetch; (32, 512) amortizes the ring a little better than the old
# (32, 256) (42.0 vs 43.2 ms at 2K x 16 src) while leaving VMEM headroom —
# (48, 512) was 41.3 ms but its 13 MB scratch trips the 16 MB scoped-vmem
# limit at mid-pyramid shapes (w=1024 OOMs at compile).
K2_TILE_H = 32
K2_TILE_W = 512
K2_IN_H = K2_TILE_H + 16   # leading pad 8 + halo 1 -> rows [i*th, i*th+th+16)
K2_IN_W = K2_TILE_W + 256  # leading pad 128 + halo 1 -> cols [j*tw, j*tw+tw+256)


def _make_ssd_combine_kernel(n_src: int, c: int, min_keep: int,
                             flt_max: float, min_var: float,
                             unroll: bool = False, ablate: str = "",
                             th: int = None, tw: int = None,
                             val3: bool = False):
    """``val3``: validity is embedded in the sampled stack's channel 0
    (project_sample_packed: sample >= 0 when valid, -1 invisible,
    -2 clipped) — no separate validity plane is fetched, and clipped pixels
    force the whole cost to FLT_MAX in-kernel (cost.cost_for_disparity's
    any_clip guard, folded here so neither the validity nor the clipped
    stack ever round-trips HBM)."""
    th = K2_TILE_H if th is None else th
    tw = K2_TILE_W if tw is None else tw
    ih, iw = th + 16, tw + 256
    n_patch = float((2 * HALO + 1) ** 2)

    def _core(x):
        return x[8:8 + th, 128:128 + tw]

    if ablate == "no_box":
        _box = _core
    else:
        def _box(x):
            """3x3 box sum of the (ih, iw) plane, returned for the (th, tw)
            core (core origin at local (8, 128); halo 1)."""
            rows = x[8 - 1:8 - 1 + th] + x[8:8 + th] + x[8 + 1:8 + 1 + th]
            return rows[:, 128 - 1:128 - 1 + tw] + rows[:, 128:128 + tw] + rows[:, 128 + 1:128 + 1 + tw]

    def _kernel(*refs):
        if val3:
            (exclude_ref, samp_hbm, dst_hbm, var_ref,
             cost_ref, conf_ref, swin_ref, dwin_ref, sems) = refs
            vwin_ref = None
        else:
            (exclude_ref, samp_hbm, val_hbm, dst_hbm, var_ref,
             cost_ref, conf_ref, swin_ref, vwin_ref, dwin_ref, sems) = refs
        i = pl.program_id(0)
        j = pl.program_id(1)
        row0 = pl.multiple_of(i * th, 8)
        col0 = pl.multiple_of(j * tw, 128)

        cps = [
            pltpu.make_async_copy(
                samp_hbm.at[:, :, pl.ds(row0, ih), pl.ds(col0, iw)], swin_ref, sems.at[0]),
            pltpu.make_async_copy(
                dst_hbm.at[:, pl.ds(row0, ih), pl.ds(col0, iw)], dwin_ref, sems.at[2]),
        ] + ([] if val3 else [
            pltpu.make_async_copy(
                val_hbm.at[:, pl.ds(row0, ih), pl.ds(col0, iw)], vwin_ref, sems.at[1]),
        ]) if ablate != "no_dma" else []
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        dst_c = [dwin_ref[ci].astype(jnp.float32) for ci in range(c)]
        neg = jnp.float32(-flt_max)

        def src_samples(s):
            """Per-channel sample planes for source s. val3 carries TWO
            planes: validity+R (f32 exact) and G|B as 2 x u16 fixed point in
            one 32-bit lane (emit_packed) — unpack costs two VPU shifts and
            saves a third of the stack's HBM write + window read."""
            if not val3:
                return [swin_ref[s, ci].astype(jnp.float32) for ci in range(c)]
            # int32 planes (emit_packed): R at 2^-24 fixed point, G|B as two
            # u16 at 2^-16. Logical shift (arithmetic would sign-extend when
            # G >= 0x8000); the power-of-two dequantizing multiplies are
            # EXACT in f32 -> deterministic under any fusion
            r0 = swin_ref[s, 0].astype(jnp.float32) * (1.0 / 16777216.0)
            u = swin_ref[s, 1]
            sg = jax.lax.shift_right_logical(u, jnp.int32(16)).astype(jnp.float32) * (1.0 / 65536.0)
            sb = (u & 0xFFFF).astype(jnp.float32) * (1.0 / 65536.0)
            return [r0, sg, sb]


        if ablate == "read_only":
            cost_ref[...] = _core(dst_c[0])
            conf_ref[...] = _core(dst_c[1 % c])
            return
        if ablate == "diff_only":
            acc = jnp.zeros((th, tw), jnp.float32)
            def dstep(s, a):
                d2 = jnp.zeros((ih, iw), jnp.float32)
                samples = src_samples(s)
                for ci in range(c):
                    diff = dst_c[ci] - samples[ci]
                    d2 = d2 + diff * diff
                return a + _core(d2)
            acc = jax.lax.fori_loop(0, n_src, dstep, acc)
            cost_ref[...] = acc
            conf_ref[...] = acc
            return

        def src_step(s, carry):
            b1, u1, b2, u2, total_u, count, clip_any = carry
            not_self = (exclude_ref[0, 0] != s).astype(jnp.float32)
            samples = src_samples(s)
            if val3:
                raw_i = swin_ref[s, 0]  # round(R*2^24) / -1 invisible / -2 clipped
                vld = (raw_i >= 0).astype(jnp.float32) * not_self  # (ih, iw)
                clip_any = jnp.maximum(
                    clip_any, _core((raw_i < -1).astype(jnp.float32)) * not_self)
            else:
                vld = vwin_ref[s].astype(jnp.float32) * not_self  # (ih, iw)
            cnt = _box(vld)
            cnt_safe = jnp.maximum(cnt, 1.0)
            inv_cnt = 1.0 / cnt_safe  # one divide; scale and md reuse it
            scale = n_patch * inv_cnt

            d2 = jnp.zeros((ih, iw), jnp.float32)
            md_sq = jnp.zeros((th, tw), jnp.float32)
            for ci in range(c):
                diff = (dst_c[ci] - samples[ci]) * vld
                d2 = d2 + diff * diff
                if ablate != "no_md":
                    md = _box(diff) * inv_cnt
                    md_sq = md_sq + md * md
            biased = _box(d2) * scale
            unbiased = jnp.maximum(biased - n_patch * md_sq, 0.0)

            # majority patch support (cost.MIN_PATCH_SUPPORT): single-member
            # patches make the bias compensation an identity (phantom zero)
            v = (_core(vld) > 0.0) & (cnt >= 5.0)
            b = jnp.where(v, biased, neg)
            u = jnp.where(v, unbiased, 0.0)
            is1 = b > b1
            nb1 = jnp.where(is1, b, b1)
            nu1 = jnp.where(is1, u, u1)
            b_dem = jnp.where(is1, b1, b)
            u_dem = jnp.where(is1, u1, u)
            is2 = b_dem > b2
            nb2 = jnp.where(is2, b_dem, b2)
            nu2 = jnp.where(is2, u_dem, u2)
            return (nb1, nu1, nb2, nu2, total_u + u, count + v.astype(jnp.float32), clip_any)

        zero = jnp.zeros((th, tw), jnp.float32)
        carry = (jnp.full((th, tw), neg), zero, jnp.full((th, tw), neg), zero, zero, zero, zero)
        if unroll:
            for s in range(n_src):
                carry = src_step(s, carry)
            b1, u1, b2, u2, total_u, count, clip_any = carry
        else:
            b1, u1, b2, u2, total_u, count, clip_any = jax.lax.fori_loop(0, n_src, src_step, carry)

        keep = jnp.clip(jnp.maximum(count - 2.0, float(min_keep)), 1.0, float(n_src))
        drop = count - keep
        cost_sum = total_u - jnp.where(drop >= 1.0, u1, 0.0) - jnp.where(drop >= 2.0, u2, 0.0)
        confidence = jnp.maximum(var_ref[...], min_var)
        cost = cost_sum / (keep * keep) / confidence
        enough = count >= float(min_keep)
        cost_out = jnp.where(enough, cost, jnp.float32(flt_max))
        if val3:
            # a visible-but-unsampled source makes the pixel unevaluable
            # (cost only — confidence keeps cost_for_disparity's semantics)
            cost_out = jnp.where(clip_any > 0.5, jnp.float32(flt_max), cost_out)
        cost_ref[...] = cost_out
        conf_ref[...] = jnp.where(enough, confidence, 0.0)

    return _kernel


@functools.partial(jax.jit, static_argnames=(
    "min_keep", "flt_max", "min_var", "interpret", "unroll", "_ablate", "th", "tw",
    "true_shape"))
def ssd_combine(
    sampled: jnp.ndarray,    # (N, C, H, W); with true_shape: pre-padded (N, C, R, Wp)
    k_valid: jnp.ndarray | None,  # (N, H, W) {0,1}; None with true_shape (embedded)
    dst_planar: jnp.ndarray, # (C, H, W)
    variance: jnp.ndarray,   # (H, W)
    exclude_idx,             # () int
    min_keep: int,
    flt_max: float = 3.4028235e38,
    min_var: float = 1.0 / 12.0 / 65025.0,
    interpret: bool | None = None,
    unroll: bool = False,
    _ablate: str = "",  # timing ablations only (tools/); NOT a correct kernel
    th: int | None = None,  # core tile (default K2_TILE_H/W)
    tw: int | None = None,
    true_shape: tuple | None = None,  # (h0, w0): consume project_sample_packed
):
    """Bias-compensated 3x3 patch SSD across sources + drop-2-worst combine
    (cost.per_src_ssd + cost.combine_top2 semantics; Derp.cpp:104-226,
    203-225). Returns (cost, confidence) each (H, W) float32.

    With ``true_shape``, ``sampled`` comes straight from
    project_sample_packed in the padded window layout (no XLA pad of the
    big stack — it dominated this stage) with validity EMBEDDED in channel
    0 (sample >= 0 / -1 invisible / -2 clipped; no separate plane is
    fetched), and clipped pixels force cost to FLT_MAX in-kernel."""
    if interpret is None:
        interpret = _default_interpret()
    n, n_planes = sampled.shape[:2]
    c = dst_planar.shape[0]
    if true_shape is not None:
        assert n_planes == 2, "packed mode carries (validity+R, G|B) planes"
    else:
        assert n_planes == c, (n_planes, c)
    if true_shape is not None:
        h0, w0 = true_shape
    else:
        h0, w0 = sampled.shape[2], sampled.shape[3]
    th, tw = k2_tile_defaults(h0, w0, th, tw)
    ih, iw = th + 16, tw + 256
    grid = ((h0 + th - 1) // th, (w0 + tw - 1) // tw)
    # Aligned leading pad (8, 128) + trailing so each (ih, iw) DMA fits.
    # The kernel's 3x3 box reads exactly ONE halo pixel past the image, and
    # the XLA path's sampling.box_sum is reflect-101 — so the innermost ring
    # of the pad mirrors the image (jnp.pad 'reflect'). Zero-padding validity
    # here undercounts border patches (corner cnt = 4 < MIN_PATCH_SUPPORT)
    # and invalidates the 4 corner pixels for EVERY source, which made
    # check_coverage reject default-FOV rigs on the TPU hot path. Beyond the
    # 1-px ring the filler is never read by any in-image pixel's box.
    r_pad = grid[0] * th + 16   # the kernel's fetch reach
    c_pad = grid[1] * tw + 256
    ring = lambda a: [(0, 0)] * (a.ndim - 2) + [(1, 1), (1, 1)]  # noqa: E731
    pads = [(7, r_pad - h0 - 8 - 1), (127, c_pad - w0 - 128 - 1)]

    def pad2(a, mode):
        a = jnp.pad(a, ring(a), mode="reflect")
        cfg = [(0, 0)] * (a.ndim - 2) + pads
        return jnp.pad(a, cfg, mode=mode) if mode != "zero" else jnp.pad(a, cfg)

    packed = true_shape is not None
    if packed:
        assert sampled.shape[2:] == packed_pad_dims(h0, w0, th, tw), (
            sampled.shape, packed_pad_dims(h0, w0, th, tw))
        assert k_valid is None, "packed mode embeds validity in channel 0"
        samp_p, val_p = sampled, None
    else:
        samp_p = pad2(sampled, "edge")
        val_p = pad2(k_valid, "zero")
    dst_p = pad2(jnp.asarray(dst_planar, jnp.float32), "edge")
    var_p = jnp.pad(
        jnp.asarray(variance, jnp.float32),
        [(0, grid[0] * th - h0), (0, grid[1] * tw - w0)], mode="edge",
    )

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), any_spec]  # exclude, sampled
    operands = [jnp.asarray(exclude_idx, jnp.int32).reshape(1, 1), samp_p]
    scratch = [pltpu.VMEM((n, n_planes, ih, iw), samp_p.dtype)]
    if not packed:
        in_specs.append(any_spec)           # separate validity plane
        operands.append(val_p)
        scratch.append(pltpu.VMEM((n, ih, iw), val_p.dtype))
    in_specs += [any_spec,                  # dst color
                 pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM)]
    operands += [dst_p, var_p]
    scratch += [pltpu.VMEM((c, ih, iw), dst_p.dtype), pltpu.SemaphoreType.DMA((3,))]

    cost, conf = pl.pallas_call(
        _make_ssd_combine_kernel(n, c, min_keep, flt_max, min_var, unroll, _ablate, th, tw,
                                 val3=packed),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid[0] * th, grid[1] * tw), jnp.float32),
            jax.ShapeDtypeStruct((grid[0] * th, grid[1] * tw), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
    return cost[:h0, :w0], conf[:h0, :w0]


