"""Fused plane-sweep matching cost — the hot path of depth estimation.

The reference evaluates a per-pixel, per-hypothesis patch SSD in a scalar
C++ loop (``depth_estimation/Derp.cpp:104-226`` computeCost +
``DerpUtil.cpp:126-162`` computeSSD), threaded over rows and disparity
hypotheses. Here the same cost is computed for ALL pixels of a destination
camera at once, as a chain of fused vector ops:

  1. unproject every dst pixel at the hypothesis disparity and project into a
     src camera (vectorized camera math; Derp.cpp:144-162),
  2. one bilinear gather from the src image (replacing the reference's
     infinity-warp + projected-color double indirection — sampling the source
     directly at the reprojection is the same parallax correction with one
     less interpolation; Derp.cpp:176-196),
  3. per-pixel squared color differences, 3x3 box sums for the biased SSD,
     and the identity  unbiased = biased - n * |patch-mean diff|^2
     (the reference's bias compensation, DerpUtil.cpp:136-152, with the patch
     mean playing the role of the blurred color bias),
  4. across cameras: drop the two worst biased SSDs, average the unbiased
     SSDs of the keepers, divide by keep (trust) and by local variance
     (confidence) — Derp.cpp:203-225.

TPU shape of the computation: the dst unprojection (Newton undistort) does
not depend on disparity, so dst ray directions are precomputed once per
level and every cost evaluation is just ``position + ray * depth`` plus the
src-side projection polynomial. Sampling all sources runs as one
multi-source Pallas launch (warp_pallas) when the transposed image stack is
present; the cross-camera drop-2-worst reduction is sort-free
(combine_top2: two masked max passes fuse into the SSD producers).
"""

from __future__ import annotations

import logging
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import camera as cam
from . import sampling
from . import warp_pallas

# Algorithm constants (Derp.h:26-48)
SEARCH_WINDOW_RADIUS = 1
MIN_OVERLAPPING_CAMS = 2
# Minimum valid members for a bias-compensated 3x3 patch SSD. With one
# member the compensation is an identity (SSD == 0: a phantom perfect score
# that random proposals latch onto at mask edges under scattered candidate
# maps); the reference never hits this because it samples full clamped
# patches (DerpUtil computeSSD). Majority support keeps the statistic sane.
MIN_PATCH_SUPPORT = 5
NUM_DEPTHS = 150
RANDOM_PROP_MAX_COST = 5.0
RANDOM_PROP_HIGH_VAR_DEVIATION = 0.1
MIN_VAR = 1.0 / 12.0 / 65025.0
LEVEL_SCALE = 0.9
FLT_MAX = jnp.finfo(jnp.float32).max

# auto_window hardware caps: the sampler's source-window scratch is
# (3*wh, ww) f32 in VMEM, double-buffered; 512x88 keeps it ~0.5 MB and the
# stacked window at 264 MXU rows (3 passes), paid only by rigs that need it.
WW_CAP = 512
WH_CAP = 88

# Quantize the Pallas sampling stack to k/256 color levels at upload: every
# value becomes exactly bf16-representable, so the sampler runs ONE MXU
# contraction instead of the hi/lo split (warp_pallas MATMUL_PRECISION;
# round-3 item 8). Cost: source colors carry <= 1/512 one-time quantization
# (equivalent to matching against ~8-bit sources); unlike per-eval bf16
# rounding this is FIXED per scene pixel, so it does not flip hypothesis
# comparisons the way the round-2 matmul rounding did. Flip to False to
# A/B the hi/lo path (tools/ablate_single_pass.py).
SRC_QUANT_EXACT = True

# Store the Pallas sampling stack as bfloat16 (round-5 sampler lever).
# LOSSLESS: with SRC_QUANT_EXACT every color is k/256 (k <= 256), which bf16's
# 8 significand bits represent exactly — so this halves the source stack's HBM
# residency and the per-tile window DMA into VMEM while every MXU product
# (8-bit x 8-bit into an f32 accumulator) stays bit-identical to the f32
# stack. Requires (16, 128) DMA tiling on the window's sublane axis: the
# kernels switch their y-anchor alignment to 16 and round window rows up to a
# multiple of 16 (auto_window sizes with y_align=16 accordingly).
#
# DEFAULT OFF: measured on the real v5e (tools/ab_bf16_stack.py, 2K x 16
# src) the lever is ~5% SLOWER at every window size (packed eval 74.5 ->
# 78.4 ms at 256x40; 100.7 -> 106.6 at 384x56; 148.5 -> 155.2 at 512x88):
# the 16-row alignment rounds the default 40-row window up to 48 — the
# stacked (3*wh, ww) contraction grows 120 -> 144 MXU rows, crossing the
# 128-row pass boundary — and the window DMA it halves was already
# pipelined behind compute (same finding as the round-4 packed stack's
# write floor). Kept as a capability for HBM-residency-bound multi-map
# batching; bit-exactness vs the f32 stack is pinned in interpret mode
# (tests/test_warp_pallas.py::test_bf16_stack_bit_identical).
SRC_STACK_BF16 = False

# Pixel count above which cost_for_disparity uses the packed sampler->combine
# layout (project_sample_packed): the packed buffers' min-768-col footprint
# and border slivers cost more than the tiny XLA pads they avoid at small
# pyramid levels (measured ~2x at w <= 256 on v5e, ~45% faster at 2K). Both
# paths are bit-identical (tests force 0 to cover packed at test sizes).
PACKED_MIN_PIXELS = 512 * 384


def quantize_src(planar: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Snap colors to multiples of 1/256 (exact in bf16's 8-bit significand).

    ``dtype=jnp.bfloat16`` stores the quantized stack losslessly at half the
    HBM footprint (see SRC_STACK_BF16)."""
    return (jnp.round(jnp.asarray(planar, jnp.float32) * 256.0)
            * (1.0 / 256.0)).astype(dtype)


def stack_dtype():
    """The sampling-stack dtype the solver hot path uses."""
    return jnp.bfloat16 if (SRC_QUANT_EXACT and SRC_STACK_BF16) else jnp.float32


class CostContext(NamedTuple):
    """Device-resident state for evaluating costs of one destination camera."""

    cam_dst: cam.Camera  # normalized
    src_cams: cam.Camera  # stacked (N,), normalized
    dst_img: jnp.ndarray  # (H, W, 3) float in [0,1]
    src_imgs: jnp.ndarray  # (N, Hs, Ws, 3)
    variance: jnp.ndarray  # (H, W) dst color variance
    exclude_idx: jnp.ndarray  # () int32: index of dst within src rig
    dst_rays: jnp.ndarray  # (H, W, 3) unit ray dirs of the dst pixels
    src_imgs_t: jnp.ndarray | None = None  # (N, Ws, Hs, 3) transposed (Pallas path)


def dst_ray_dirs(cam_dst, h: int, w: int) -> jnp.ndarray:
    """(H, W, 3) unit rays through the dst pixel centers (normalized pixel
    units). This is the disparity-independent half of dstToWorldPoint
    (DerpUtil.cpp:38-52): hoisting it out of the cost evaluation removes the
    Newton undistort from the hot loop."""
    grid = sampling.pixel_center_grid(h, w) / jnp.asarray([w, h], jnp.float32)
    return cam.ray_dir(cam_dst, grid)


def probe_disparities(num: int, min_disparity: float, max_disparity: float) -> jnp.ndarray:
    """Uniform-in-disparity probe schedule, probe 0 = closest depth.
    util/ImageUtil.cpp:100-107."""
    fraction = jnp.arange(num, dtype=jnp.float32) / (num - 1)
    return fraction * min_disparity + (1 - fraction) * max_disparity


def reproject_to_src(cam_dst, cam_src, disparity, dst_hw, src_hw):
    """Per-pixel src sampling coords for a disparity map (or scalar).

    Returns ((H, W, 2) coords in src pixel units, (H, W) validity).
    Derp.cpp:144-162 (dstToWorldPoint -> worldToSrcPoint).
    """
    h, w = dst_hw
    rays = dst_ray_dirs(cam_dst, h, w)
    return reproject_rays(cam_dst.position, rays, cam_src, disparity, src_hw)


def reproject_rays(dst_position, dst_rays, cam_src, disparity, src_hw):
    """reproject_to_src with the dst unprojection already done: the cheap,
    disparity-dependent half of the warp."""
    hs, ws = src_hw
    h, w = dst_rays.shape[:2]
    disparity = jnp.broadcast_to(jnp.asarray(disparity, jnp.float32), (h, w))
    depth = 1.0 / jnp.maximum(disparity, 1e-12)
    world = dst_position + dst_rays * depth[..., None]
    src_pix, valid = cam.sees(cam_src, world)
    coords = src_pix * jnp.asarray([ws, hs], jnp.float32)
    valid &= (disparity > 0) & jnp.all(jnp.isfinite(coords), axis=-1)
    return coords, valid


def per_src_ssd(ctx_pos_rays, cam_src, dst_img, src_img, disparity, radius=SEARCH_WINDOW_RADIUS):
    """Biased & bias-compensated patch SSD maps for one src camera.

    ``ctx_pos_rays`` is (dst_position, dst_rays). Returns (biased, unbiased,
    valid), each (H, W). Patch terms whose own reprojection is invalid are
    excluded via masked normalization (the reference instead clamps
    out-of-range samples; differences appear only in the 1-2 px band at src
    FOV edges).
    """
    dst_position, dst_rays = ctx_pos_rays
    coords, valid = reproject_rays(dst_position, dst_rays, cam_src, disparity, src_img.shape[:2])
    sampled = sampling.bilinear_sample(src_img[..., :3], coords)
    validf = valid.astype(dst_img.dtype)
    diff = jnp.where(valid[..., None], dst_img[..., :3] - sampled, 0.0)

    n = (2 * radius + 1) ** 2
    cnt = sampling.box_sum(validf, radius)
    cnt_safe = jnp.maximum(cnt, 1.0)
    scale = n / cnt_safe

    d2 = jnp.sum(diff * diff, axis=-1)
    biased = sampling.box_sum(d2, radius) * scale
    mean_diff = sampling.box_sum(diff, radius) / cnt_safe[..., None]
    unbiased = jnp.maximum(biased - n * jnp.sum(mean_diff * mean_diff, axis=-1), 0.0)
    return biased, unbiased, valid & (cnt >= MIN_PATCH_SUPPORT)


def combine_ssds(biased, unbiased, valid, variance):
    """Cross-camera reduction: drop 2 worst by biased SSD, average unbiased,
    apply trust (1/keep) and confidence (1/max(var, kMinVar)). Derp.cpp:203-225.

    biased/unbiased/valid: (N, H, W); variance: (H, W).
    Returns (cost, confidence) each (H, W); cost is FLT_MAX where fewer than
    kMinOverlappingCams-1 cameras see the point.
    """
    n = biased.shape[0]
    biased_key = jnp.where(valid, biased, jnp.inf)
    order = jnp.argsort(biased_key, axis=0)
    unb = jnp.where(valid, unbiased, 0.0)
    unb_sorted = jnp.take_along_axis(unb, order, axis=0)
    prefix = jnp.cumsum(unb_sorted, axis=0)

    count = jnp.sum(valid, axis=0)
    min_keep = MIN_OVERLAPPING_CAMS - 1
    keep = jnp.clip(jnp.maximum(count - 2, min_keep), 1, n)
    cost_sum = jnp.take_along_axis(prefix, (keep - 1)[None], axis=0)[0]
    keepf = keep.astype(biased.dtype)
    confidence = jnp.maximum(variance, MIN_VAR)
    cost = cost_sum / (keepf * keepf) / confidence

    enough = count >= min_keep
    cost = jnp.where(enough, cost, FLT_MAX)
    confidence = jnp.where(enough, confidence, 0.0)
    return cost, confidence


def combine_top2(biased, unbiased, valid, variance):
    """Cross-camera drop-2-worst reduction without a sort.

    biased/unbiased/valid: (N, H, W); variance: (H, W). Per pixel keep the
    two largest biased SSDs via two masked max passes and subtract their
    unbiased values from the total — exactly keep = clip(max(count-2, 1),
    1, n) of Derp.cpp:203-225 (see combine_ssds); O(N) instead of O(N log N)
    and fuses into the SSD producers.
    """
    n = biased.shape[0]
    neg = jnp.float32(-FLT_MAX)
    b = jnp.where(valid, biased, neg)
    u = jnp.where(valid, unbiased, 0.0)

    i1 = jnp.argmax(b, axis=0)  # worst source
    b1 = jnp.take_along_axis(b, i1[None], axis=0)[0]
    u1 = jnp.take_along_axis(u, i1[None], axis=0)[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, b.shape, 0)
    b_rest = jnp.where(lane == i1[None], neg, b)
    i2 = jnp.argmax(b_rest, axis=0)  # second worst
    u2 = jnp.take_along_axis(u, i2[None], axis=0)[0]

    count = jnp.sum(valid, axis=0)
    total_u = jnp.sum(u, axis=0)
    min_keep = MIN_OVERLAPPING_CAMS - 1
    keep = jnp.clip(jnp.maximum(count - 2, min_keep), 1, n)
    drop = count - keep  # 0, 1, or 2
    cost_sum = total_u - jnp.where(drop >= 1, u1, 0.0) - jnp.where(drop >= 2, u2, 0.0)
    keepf = keep.astype(jnp.float32)
    confidence = jnp.maximum(variance, MIN_VAR)
    cost = cost_sum / (keepf * keepf) / confidence

    enough = count >= min_keep
    cost = jnp.where(enough, cost, FLT_MAX)
    confidence = jnp.where(enough, confidence, 0.0)
    return cost, confidence


def auto_window(src_cams, dst_cams, dst_hw, src_hw=None,
                min_depth: float = 0.5, max_depth: float = 1e4, grid: int = 0,
                y_align: int | None = None):
    """Rig-derived sampler window size (VERDICT r3 #5; span-based since r5).

    The Pallas sampler covers each (24, 128) dst tile with a fixed source
    window (defaults 256x40). Clipping is SAFE (the candidate's cost goes
    FLT_MAX and the solver keeps its carry) but a rig with sustained warp
    magnification — a dst camera whose FOV is much wider than a source's,
    strongly rotated outward rigs near their shared FOV edges, or fisheye
    rigs near the warp's azimuthal singularity — clips persistently and
    silently degrades coverage there.

    This measures, at FULL destination resolution, the per-tile SPAN of
    source sampling coordinates (exactly the quantity the kernel's window
    must cover — an earlier Jacobian-percentile heuristic under-sized
    fisheye rigs whose grid-averaged derivatives hid local peaks) for every
    (dst, src) pair at the near/far sweep extremes, restricted to dst
    pixels inside the dst's own image circle (beyond-circle pixels are
    solver-masked: make_level_context NaNs their rays). Window = smallest
    aligned size whose span-centered-anchor guarantee covers the max span
    (warp_pallas: x span <= ww-128, y span <= wh-8):

      x: ww = 256 while span <= 192 (the measured-safe regime: the 128-col
         anchor alignment rarely wastes its worst case; the bench forward
         rig spans ~158 px with 0.09% clipping), else
         128*ceil((span + 130)/128), capped at 512.
      y: anchors align to ``y_align`` rows (8 for an f32 stack, 16 for the
         bf16 stack's (16, 128) DMA tiling; default follows stack_dtype()),
         so wh = 40 while span <= 36 (the kernel rounds 40 up to 48 under
         16-alignment, preserving the same covered-span guarantee of 32;
         typical alignment loses ~half its worst case, and the sub-0.1%
         tail rides the clip guard), else y_align*ceil((span + 2 +
         y_align)/y_align), capped at WH_CAP rounded up to y_align (fisheye
         ring + top camera rigs measure 74 px tile spans; 88 stacks to 264
         MXU rows = 3 passes, paid only by rigs that need it).

    Scattered candidate maps (random proposals) can still exceed the
    smooth-map spans measured here — that tail rides the clip guard.
    ``grid`` is accepted for backward compatibility and ignored.
    Thread the result via SolverConfig.ww_max/wh_max.
    """
    import math

    from . import warp_pallas as _wp

    dst_hw = tuple(dst_hw)
    src_hw = dst_hw if src_hw is None else tuple(src_hw)
    h, w = dst_hw
    th, tw = _wp.V4_TILE_H, _wp.TILE_W
    nt_i, nt_j = -(-h // th), -(-w // tw)
    big = jnp.float32(1e9)
    ns = len(jax.tree.leaves(src_cams.position)[0])
    n_dst = len(jax.tree.leaves(dst_cams.position)[0])
    src_stack = jax.tree.map(jnp.asarray, src_cams)

    @jax.jit
    def spans_one_dst(cdst, d):
        rays = dst_ray_dirs(cdst, h, w)
        gridn = sampling.pixel_center_grid(h, w) / jnp.asarray([w, h], jnp.float32)
        in_circle = ~cam.is_outside_image_circle(cdst, gridn * cdst.resolution)

        def tile_span(a, valid):
            hi = jnp.pad(jnp.where(valid, a, -big),
                         ((0, nt_i * th - h), (0, nt_j * tw - w)),
                         constant_values=-big).reshape(nt_i, th, nt_j, tw)
            lo = jnp.pad(jnp.where(valid, a, big),
                         ((0, nt_i * th - h), (0, nt_j * tw - w)),
                         constant_values=big).reshape(nt_i, th, nt_j, tw)
            s = jnp.max(hi, axis=(1, 3)) - jnp.min(lo, axis=(1, 3))
            return jnp.max(jnp.maximum(s, 0.0))  # empty tiles -> 0

        def per_src(csrc):
            coords, valid = reproject_rays(
                cdst.position, rays, csrc, jnp.full((h, w), d, jnp.float32), src_hw
            )
            valid &= in_circle
            return tile_span(coords[..., 0], valid), tile_span(coords[..., 1], valid)

        # sequential over sources: full-res coords for the whole stack at
        # once would be ns * H * W * 8 bytes of intermediates
        sx, sy = jax.lax.map(per_src, src_stack)
        return jnp.max(sx), jnp.max(sy)

    span_x = span_y = 0.0
    for di in range(n_dst):
        cdst = jax.tree.map(lambda a: jnp.asarray(a)[di], dst_cams)
        for d in (1.0 / max_depth, 1.0 / min_depth):
            sx, sy = spans_one_dst(cdst, jnp.float32(d))
            span_x = max(span_x, float(sx))
            span_y = max(span_y, float(sy))

    ay = (16 if stack_dtype() == jnp.bfloat16 else 8) if y_align is None else y_align
    wh_cap = -(-WH_CAP // ay) * ay
    ww = 256 if span_x <= 192.0 else 128 * math.ceil((span_x + 130.0) / 128.0)
    wh = 40 if span_y <= 36.0 else ay * math.ceil((span_y + 2.0 + ay) / ay)
    ww_c, wh_c = min(max(ww, 256), WW_CAP), min(max(wh, 40), wh_cap)
    if ww > ww_c or wh > wh_c:
        # beyond the hardware cap the guard still holds (FLT_MAX cost,
        # carried disparity) but coverage can silently degrade — make
        # extreme rigs diagnosable
        logging.getLogger(__name__).warning(
            "auto_window: computed window %dx%d exceeds cap %dx%d "
            "(max tile span %.0fx%.0f px); sampler clipping may degrade "
            "coverage on this rig", ww, wh, ww_c, wh_c, span_x, span_y)
    return ww_c, wh_c


def cost_for_disparity(ctx: CostContext, disparity, window=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cost + confidence maps for a whole disparity map (or scalar hypothesis).

    With src_imgs_t present (the TPU hot path) the eval is two Pallas
    launches: project_sample_planar_v4 (projection + bilinear sampling of
    all sources) and ssd_combine (bias-compensated SSDs + drop-2-worst).
    Otherwise sources evaluate under vmap with XLA gathers and the
    reduction is the sort-free combine_top2.
    """
    n = ctx.src_imgs.shape[0]
    pos_rays = (ctx.cam_dst.position, ctx.dst_rays)
    h, w = ctx.dst_img.shape[:2]

    if ctx.src_imgs_t is not None:
        # two fused kernels, no big XLA intermediates: v4 projects + samples
        # (warp fields never touch HBM) and writes STRAIGHT INTO k2's padded
        # window layout (an XLA pad of the sampled stack between the kernels
        # was a full-HBM rewrite per eval — 41 of the combine's 43 ms at 2K);
        # k2 forms the bias-compensated SSDs + drop-2-worst combine, folding
        # the visible-but-unsampled (clipped) guard in-kernel: any non-self
        # source clipped at a pixel makes its cost unevaluable (FLT_MAX), or
        # the keep^2 renormalization would fabricate false minima wherever
        # scattered candidate maps blow up a tile's source footprint
        disparity_map = jnp.broadcast_to(jnp.asarray(disparity, jnp.float32), (h, w))
        rays_planar = jnp.moveaxis(ctx.dst_rays, -1, 0)  # (3, H, W)
        params = warp_pallas.pack_camera_params_traced(ctx.src_cams)
        dst_planar = jnp.moveaxis(ctx.dst_img[..., :3], -1, 0)
        ww_max, wh_max = window if window is not None else (None, None)
        if h * w >= PACKED_MIN_PIXELS:
            sampled_p = warp_pallas.project_sample_packed(
                ctx.src_imgs_t, params, ctx.cam_dst.position, disparity_map, rays_planar,
                # producers (solver.make_level_context / parallel.sharding)
                # quantize the stack under the same flag
                src_exact_bf16=SRC_QUANT_EXACT,
                ww_max=ww_max, wh_max=wh_max,
            )
            return warp_pallas.ssd_combine(
                sampled_p, None, dst_planar, ctx.variance, ctx.exclude_idx,
                min_keep=MIN_OVERLAPPING_CAMS - 1, flt_max=float(FLT_MAX),
                min_var=float(MIN_VAR), true_shape=(h, w),
            )
        # small pyramid levels: the packed layout's min-768-col buffers and
        # border slivers cost more than the (tiny) XLA pads they avoid —
        # measured ~2x at w <= 256 on v5e; both paths are bit-identical
        sampled, k_valid, clipped = warp_pallas.project_sample_planar_v4(
            ctx.src_imgs_t, params, ctx.cam_dst.position, disparity_map, rays_planar,
            src_exact_bf16=SRC_QUANT_EXACT,
            ww_max=ww_max, wh_max=wh_max,
        )
        cost, confidence = warp_pallas.ssd_combine(
            sampled, k_valid, dst_planar, ctx.variance, ctx.exclude_idx,
            min_keep=MIN_OVERLAPPING_CAMS - 1, flt_max=float(FLT_MAX),
            min_var=float(MIN_VAR),
        )
        not_self = (jnp.arange(n) != ctx.exclude_idx).astype(clipped.dtype)
        any_clip = jnp.max(clipped * not_self[:, None, None], axis=0) > 0
        return jnp.where(any_clip, FLT_MAX, cost), confidence

    def one(cam_src, src_img):
        return per_src_ssd(pos_rays, cam_src, ctx.dst_img, src_img, disparity)

    biased, unbiased, valid = jax.vmap(one)(ctx.src_cams, ctx.src_imgs)
    not_self = jnp.arange(n) != ctx.exclude_idx
    valid &= not_self[:, None, None]
    return combine_top2(biased, unbiased, valid, ctx.variance)


def ssd_planar(dst_img, sampled_planar, valid, radius=SEARCH_WINDOW_RADIUS):
    """Biased/unbiased patch SSD stacks from channel-planar samples.

    dst_img: (H, W, 3); sampled_planar: (N, C, H, W); valid: (N, H, W).
    Channel-planar throughout: a trailing C=3 axis would occupy the 128-wide
    lane dimension of every TPU tile (97% padding waste).
    """
    n_patch = (2 * radius + 1) ** 2
    dst_planar = jnp.moveaxis(dst_img[..., :3], -1, 0)  # (C, H, W)
    validf = valid.astype(dst_img.dtype)
    diff = jnp.where(valid[:, None], dst_planar[None] - sampled_planar, 0.0)  # (N, C, H, W)

    def box2(x):  # box over the trailing (H, W) of any leading batch dims
        flat = x.reshape((-1,) + x.shape[-2:])
        out = jax.vmap(lambda a: sampling.box_sum(a, radius))(flat)
        return out.reshape(x.shape)

    cnt = box2(validf)
    cnt_safe = jnp.maximum(cnt, 1.0)
    scale = n_patch / cnt_safe
    d2 = jnp.sum(diff * diff, axis=1)  # (N, H, W)
    biased = box2(d2) * scale
    mean_diff = box2(diff) / cnt_safe[:, None]
    unbiased = jnp.maximum(biased - n_patch * jnp.sum(mean_diff * mean_diff, axis=1), 0.0)
    return biased, unbiased, valid & (cnt >= MIN_PATCH_SUPPORT)


def brute_force_disparity(
    ctx: CostContext,
    min_depth: float,
    max_depth: float,
    fov_mask: jnp.ndarray,
    fg_mask: jnp.ndarray,
    bg_disparity: jnp.ndarray,
    has_fg_masks: bool,
    num_depths: int = NUM_DEPTHS,
    window=None,
):
    """Plane sweep: scan NUM_DEPTHS hypotheses with a running argmin.

    Derp.cpp:230-401 (computeBruteForceCosts + computeBruteForceDisparity),
    with the per-hypothesis cost maps produced by the fused kernel above and
    the argmin folded into the scan carry (no 150-map materialization).
    Returns (disparity, cost, confidence) maps.
    """
    disparities = probe_disparities(num_depths, 1.0 / max_depth, 1.0 / min_depth)
    h, w = ctx.dst_img.shape[:2]

    def step(carry, d):
        best_cost, best_disp, best_conf = carry
        cost, conf = cost_for_disparity(ctx, d, window=window)
        # Foreground pixels must be closer than the background (Derp.cpp:240-242)
        if has_fg_masks:
            closer = bg_disparity < d
            cost = jnp.where(closer, cost, FLT_MAX)
        better = cost < best_cost
        return (
            jnp.where(better, cost, best_cost),
            jnp.where(better, d, best_disp),
            jnp.where(better, conf, best_conf),
        ), None

    init = (
        jnp.full((h, w), FLT_MAX, jnp.float32),
        jnp.full((h, w), disparities[-1], jnp.float32),  # min disparity fallback (Derp.cpp:349)
        jnp.zeros((h, w), jnp.float32),
    )
    (best_cost, best_disp, best_conf), _ = jax.lax.scan(step, init, disparities)

    # Masking semantics of Derp.cpp:310-321
    disparity = jnp.where(fov_mask, best_disp, jnp.nan)
    if has_fg_masks:
        disparity = jnp.where(fg_mask | ~fov_mask, disparity, bg_disparity)
    cost = jnp.where(best_cost == FLT_MAX, jnp.nan, best_cost)
    return disparity, cost, best_conf
