"""Per-level disparity solver: the TPU-native re-design of "Derp".

The reference's processLevel (``depth_estimation/Derp.cpp:1005-1034``) runs,
per pyramid level:

  reprojectColors -> brute force (coarsest only) -> randomProposals ->
  pingPongPropagation -> handleDisparityMismatches -> bilateralFilter ->
  medianFilter -> maskFov

Everything here is a pure jit-able function over a LevelContext of stacked
device arrays. Data-parallel redesigns vs the reference:

- Brute force: lax.scan over 150 hypotheses with a running argmin instead of
  150 threaded cost maps (Derp.cpp:264-401).
- Random proposals: per-pixel threefry draws evaluated as whole-image cost
  maps, amplitude-halving carried through a scan (Derp.cpp:750-873; the
  reference seeds per row for thread-count determinism, we key on
  (level, proposal) for the same property).
- Ping-pong: Jacobi sweeps — all 9 star-template candidates (DerpUtil.h:34-43)
  evaluated as shifted disparity maps per iteration, instead of serial row
  scans with a changed mask (Derp.cpp:403-551). Convergence per iteration is
  slightly weaker than the serial sweep; iterations are configurable.
- Mismatch handling: the cross-camera agreement test vectorized over the
  (src, pixel) axes with a small sort for the mismatch median
  (Derp.cpp:553-748).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..ops import cost as cost_ops
from ..ops import filters, sampling, warp_pallas
from ..ops.cost import FLT_MAX, CostContext


class LevelContext(NamedTuple):
    """Device-resident state for one (frame, level)."""

    src_cams: cam.Camera  # stacked (N,), normalized
    dst_cams: cam.Camera  # stacked (D,), normalized
    dst2src: jnp.ndarray  # (D,) int32
    src_imgs: jnp.ndarray  # (N, H, W, 3) float32 [0,1]
    src_variance: jnp.ndarray  # (N, H, W)
    dst_fov_masks: jnp.ndarray  # (D, H, W) bool
    dst_fg_masks: jnp.ndarray  # (D, H, W) bool
    dst_bg_disp: jnp.ndarray  # (D, H, W)
    var_noise_floor: jnp.ndarray  # () level-scaled (PyramidLevel.h:232-236)
    var_high_thresh: jnp.ndarray  # ()
    dst_rays: jnp.ndarray  # (D, H, W, 3) precomputed dst pixel ray dirs
    src_imgs_t: jnp.ndarray | None = None  # (N, 3, H, W) planar (Pallas sampler)


class SolverConfig(NamedTuple):
    """Static solve parameters (one jit specialization per value set)."""

    min_depth: float = 0.5
    max_depth: float = 1e4
    num_random_proposals: int = 2
    ping_pong_iterations: int = 1
    mismatches_start_level: int = -1
    do_bilateral_filter: bool = True
    do_median_filter: bool = True
    has_fg_masks: bool = False
    level: int = 0
    num_levels: int = 1
    # sampler window override from cost.auto_window (None = kernel defaults);
    # static per-level, so a new value re-jits exactly like a new level size
    ww_max: int | None = None
    wh_max: int | None = None
    # Convergence-aware propagation template: drop the four long-range
    # (+/-2, +/-2) diagonal candidates from the PatchMatch star
    # (DerpUtil.h:34-43), keeping the center + 4 axis neighbors. The
    # diagonals buy long-range propagation, which matters from a cold
    # start; at FINE pyramid levels the upsampled coarser-level init is
    # already near-converged and each dropped candidate saves a full-image
    # cost evaluation (the dominant cost at the 2048 level). Measured
    # quality impact: tools/ab_finest_schedule.py. Default False =
    # reference-shaped template at every level.
    star_axis_only: bool = False


def make_level_context(
    rig_src,
    rig_dst,
    src_imgs,
    dst_fov_masks,
    dst_fg_masks=None,
    dst_bg_disp=None,
    src_fg_masks=None,
    var_noise_floor=4e-5,
    var_high_thresh=1e-3,
    full_height=None,
    use_pallas_sampler: bool | None = None,
) -> LevelContext:
    """Build the device context (computes per-src variance; PyramidLevel.h:232-247)."""
    src_imgs = jnp.asarray(src_imgs, jnp.float32)
    n, h, w = src_imgs.shape[:3]
    d = len(rig_dst.ids)
    variance = jax.vmap(lambda img: sampling.rgb_variance(img))(src_imgs)
    if dst_fg_masks is None:
        dst_fg_masks = jnp.ones((d, h, w), bool)
    if dst_bg_disp is None:
        dst_bg_disp = jnp.zeros((d, h, w), jnp.float32)
    full_height = full_height if full_height is not None else h
    # Variance noise floor scales with the square of (level width / full height)
    # — reference parity: PyramidLevel.h:232-236.
    scale = w / float(full_height)
    floor = jnp.maximum(var_noise_floor * scale * scale, cost_ops.MIN_VAR)

    def to_f32(c):
        return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32) if jnp.asarray(a).dtype.kind == "f" else jnp.asarray(a), c)

    dst_cams_f32 = to_f32(rig_dst.cameras)
    # dst unprojection is disparity-independent: hoist the Newton undistort
    # out of every cost evaluation (cost.dst_ray_dirs)
    dst_rays = jax.lax.map(
        lambda c: cost_ops.dst_ray_dirs(c, h, w),
        dst_cams_f32,
    )
    # NaN rays outside the dst FOV mask: those pixels are discarded by
    # mask_fov anyway (Derp.cpp:940-951), but on FISHEYE rigs their rays
    # point up to ~15 deg beyond the image circle where the warp Jacobian
    # explodes — inside the Pallas sampler they dragged the per-tile window
    # anchor off the real footprint and clipped IN-circle pixels of every
    # tile straddling the circle boundary. NaN makes them kernel-invisible
    # (finite-check -> ok0 false), on both sampler paths identically.
    dst_fov_b = jnp.asarray(dst_fov_masks, bool)
    dst_rays = jnp.where(dst_fov_b[..., None], dst_rays, jnp.nan)

    return LevelContext(
        src_cams=to_f32(rig_src.cameras),
        dst_cams=dst_cams_f32,
        dst2src=jnp.asarray(cam.map_src_to_dst_indexes(rig_src, rig_dst)),
        src_imgs=src_imgs,
        src_variance=variance,
        dst_fov_masks=jnp.asarray(dst_fov_masks, bool),
        dst_fg_masks=jnp.asarray(dst_fg_masks, bool),
        dst_bg_disp=jnp.asarray(dst_bg_disp, jnp.float32),
        var_noise_floor=jnp.asarray(floor, jnp.float32),
        var_high_thresh=jnp.asarray(var_high_thresh, jnp.float32),
        dst_rays=dst_rays,
        # Raw bf16 SAMPLED colors would corrupt the SSD of small diffs
        # (|dst-src| ~ 1e-2 at the optimum) by ~30%, flipping proposal/
        # ping-pong decisions at weakly-textured pixels — the round-2 RMSE
        # tail. The contractions run at DEFAULT MXU precision but are built
        # to be EXACT there: colors snap to k/256 when cost.SRC_QUANT_EXACT
        # (single contraction, and with cost.SRC_STACK_BF16 the stack then
        # STORES as bf16 losslessly — half the HBM residency and window
        # DMA, bit-identical products); without the quantization the stack
        # must be f32 and the sampler runs the hi/lo exactness split.
        src_imgs_t=(
            (
                (lambda a: cost_ops.quantize_src(a, dtype=cost_ops.stack_dtype()))
                if cost_ops.SRC_QUANT_EXACT else (lambda a: a)
            )(warp_pallas.planar_for_sampling(src_imgs[..., :3]).astype(jnp.float32))
            if use_pallas_sampler
            else None
        ),
    )


def _cost_ctx(ctx: LevelContext, dst_idx) -> CostContext:
    src_idx = ctx.dst2src[dst_idx]
    return CostContext(
        cam_dst=jax.tree.map(lambda a: a[dst_idx], ctx.dst_cams),
        src_cams=ctx.src_cams,
        dst_img=ctx.src_imgs[src_idx],
        src_imgs=ctx.src_imgs,
        variance=ctx.src_variance[src_idx],
        exclude_idx=src_idx,
        dst_rays=ctx.dst_rays[dst_idx],
        src_imgs_t=ctx.src_imgs_t,
    )


def _window(cfg: SolverConfig):
    return (cfg.ww_max, cfg.wh_max) if (cfg.ww_max or cfg.wh_max) else None


def brute_force_all(ctx: LevelContext, cfg: SolverConfig):
    """Coarsest-level initialization for every dst camera (Derp.cpp:384-401)."""

    def one(dst_idx):
        return cost_ops.brute_force_disparity(
            _cost_ctx(ctx, dst_idx),
            cfg.min_depth,
            cfg.max_depth,
            ctx.dst_fov_masks[dst_idx],
            ctx.dst_fg_masks[dst_idx],
            ctx.dst_bg_disp[dst_idx],
            cfg.has_fg_masks,
            window=_window(cfg),
        )

    return jax.lax.map(one, jnp.arange(len(ctx.dst2src)))


def random_proposals(ctx: LevelContext, cfg: SolverConfig, disparity, costs, confidences, key):
    """Per-pixel randomized refinement (Derp.cpp:750-873), one dst at a time
    via lax.map; the proposal loop is a scan carrying (disp, cost, amplitude)."""
    if cfg.num_random_proposals <= 0:
        return disparity, costs, confidences

    max_disp = 1.0 / cfg.min_depth
    var_high_dev = cost_ops.RANDOM_PROP_HIGH_VAR_DEVIATION * ctx.var_high_thresh
    var_thresh = jnp.maximum(var_high_dev, ctx.var_noise_floor)

    def one(args):
        dst_idx, disp0, key = args
        cctx = _cost_ctx(ctx, dst_idx)
        fov = ctx.dst_fov_masks[dst_idx]
        fg = ctx.dst_fg_masks[dst_idx]
        bg = ctx.dst_bg_disp[dst_idx]
        variance = cctx.variance
        min_disp = bg if cfg.has_fg_masks else jnp.full_like(bg, 1.0 / cfg.max_depth)

        active = fov & fg & (variance >= var_thresh)
        cost0, conf0 = cost_ops.cost_for_disparity(cctx, disp0, window=_window(cfg))
        cost_thresh = jnp.minimum(0.5 * cost0, cost_ops.RANDOM_PROP_MAX_COST)
        amplitude0 = (max_disp - min_disp) / 2.0

        def step(carry, k):
            disp, cost, conf, amp = carry
            lo = jnp.maximum(min_disp, disp - amp)
            hi = jnp.minimum(max_disp, disp + amp)
            u = jax.random.uniform(k, disp.shape, disp.dtype)
            prop = lo + u * (hi - lo)
            pcost, pconf = cost_ops.cost_for_disparity(cctx, jnp.where(active, prop, disp), window=_window(cfg))
            accept = active & (pcost < cost) & (pcost < cost_thresh)
            return (
                jnp.where(accept, prop, disp),
                jnp.where(accept, pcost, cost),
                jnp.where(accept, pconf, conf),
                jnp.where(accept, amp / 2.0, amp),
            ), None

        keys = jax.random.split(key, cfg.num_random_proposals)
        (disp, cost, conf, _), _ = jax.lax.scan(step, (disp0, cost0, conf0, amplitude0), keys)

        disp = jnp.where(active, disp, disp0)
        if cfg.has_fg_masks:
            disp = jnp.where(fg | ~fov, disp, bg)
        return disp, jnp.where(active, cost, cost0), jnp.where(active, conf, conf0)

    d = len(ctx.dst2src)
    keys = jax.random.split(key, d)
    return jax.lax.map(one, (jnp.arange(d), disparity, keys))


# PatchMatch star template (DerpUtil.h:34-43)
PING_PONG_OFFSETS = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1), (-2, -2), (2, -2), (-2, 2), (2, 2))


def ping_pong(ctx: LevelContext, cfg: SolverConfig, disparity, costs, confidences):
    """Jacobi spatial propagation: evaluate all star-template candidate
    disparity maps, keep the best per pixel (Derp.cpp:403-551)."""
    if cfg.ping_pong_iterations <= 0:
        return disparity, costs, confidences

    def one(args):
        dst_idx, disp0, cost_in, conf_in = args
        cctx = _cost_ctx(ctx, dst_idx)
        fov = ctx.dst_fov_masks[dst_idx]
        fg = ctx.dst_fg_masks[dst_idx]
        bg = ctx.dst_bg_disp[dst_idx]
        variance = cctx.variance
        active = fov & fg & (variance >= ctx.var_noise_floor)
        bg_floor = bg if cfg.has_fg_masks else jnp.zeros_like(bg)

        def iteration(state, _):
            disp, cost, conf = state
            # The center candidate (offset (0, 0)) re-evaluates the pixel's
            # own current disparity — whose cost the carry already holds
            # (computed by random_proposals / the previous iteration), so
            # seed the running best from it instead of spending a 9th full
            # cost eval. The reference likewise starts from the stored
            # disparity/confidence and only re-computes candidates flagged
            # `changed` (Derp.cpp:439-470). Only when no proposals ran is
            # the carried cost a placeholder (inf) and the center must be
            # evaluated like any other candidate.
            seed_center = cfg.num_random_proposals > 0
            if seed_center:
                center_ok = fov & (disp >= bg_floor) & jnp.isfinite(disp)
                best_cost = jnp.where(center_ok, cost, jnp.inf)
                offsets = PING_PONG_OFFSETS[1:]
            else:
                best_cost = jnp.full_like(cost, jnp.inf)
                offsets = PING_PONG_OFFSETS
            if cfg.star_axis_only:
                offsets = tuple(
                    o for o in offsets if max(abs(o[0]), abs(o[1])) <= 1
                )
            best_disp = disp
            best_conf = conf
            for dy, dx in offsets:
                cand = filters._shift(disp, dy, dx)
                cand_fov = filters._shift(fov, dy, dx)
                ok = cand_fov & (cand >= bg_floor) & jnp.isfinite(cand)
                ccost, cconf = cost_ops.cost_for_disparity(cctx, jnp.where(ok, cand, disp), window=_window(cfg))
                ccost = jnp.where(ok, ccost, jnp.inf)
                better = ccost < best_cost
                best_cost = jnp.where(better, ccost, best_cost)
                best_disp = jnp.where(better, cand, best_disp)
                best_conf = jnp.where(better, cconf, best_conf)
            disp = jnp.where(active, best_disp, disp)
            cost = jnp.where(active, best_cost, cost)
            conf = jnp.where(active, best_conf, conf)
            return (disp, cost, conf), None

        (disp, cost, conf), _ = jax.lax.scan(
            iteration, (disp0, cost_in, conf_in), None, length=cfg.ping_pong_iterations
        )
        if cfg.has_fg_masks:
            disp = jnp.where(fg | ~fov, disp, bg)
        return disp, cost, conf

    d = len(ctx.dst2src)
    return jax.lax.map(one, (jnp.arange(d), disparity, costs, confidences))


def handle_mismatches(ctx: LevelContext, cfg: SolverConfig, disparity, full_disparity=None):
    """Cross-camera consistency (Derp.cpp:553-748): project each dst pixel's
    depth into every other camera's disparity map; with <1 agreeing camera,
    replace with the median of the farther mismatched disparities.

    Requires rigDst == rigSrc (as the reference CHECKs). ``disparity`` holds
    this shard's dst maps; ``full_disparity`` is the (N, H, W) all-camera
    stack (defaults to ``disparity`` single-shard; under shard_map pass the
    all-gathered stack). Returns (new disparity, mismatch mask).
    """
    disparity = jnp.asarray(disparity, jnp.float32)
    full_disparity = disparity if full_disparity is None else jnp.asarray(full_disparity, jnp.float32)
    n, h, w = ctx.src_imgs.shape[:3]
    d = disparity.shape[0]
    # every source camera's disparity must be present: indexing a short stack
    # is out-of-bounds (the reference CHECKs rigDst == rigSrc; under
    # shard_map pass the all-gathered stack)
    assert full_disparity.shape[0] == n, (full_disparity.shape, n)
    frac = 0.1  # kFractionChange, Derp.cpp:594

    # NaN-safe sampling stack for the Pallas path: NaNs in a window would
    # poison the whole interpolation matmul, so sample (filled, finite-mask)
    # channel pairs and require a fully-finite footprint
    if ctx.src_imgs_t is not None:
        disp_planar = jnp.stack(
            [jnp.nan_to_num(full_disparity), jnp.isfinite(full_disparity).astype(jnp.float32)],
            axis=1,
        )
    else:
        disp_planar = None

    def one(args):
        dst_idx, disp = args
        cam_dst = jax.tree.map(lambda a: a[dst_idx], ctx.dst_cams)
        fov = ctx.dst_fov_masks[dst_idx]
        fg = ctx.dst_fg_masks[dst_idx]
        variance = ctx.src_variance[ctx.dst2src[dst_idx]]
        pos, rays = cam_dst.position, ctx.dst_rays[dst_idx]

        not_self = jnp.arange(n)[:, None, None] != ctx.dst2src[dst_idx]
        if disp_planar is not None:
            # project + sample in ONE v4 launch over the 2-channel
            # (disparity, finite-mask) stack: the projection math runs
            # in-kernel (identical to reproject_rays/cam.sees — the parity
            # the kernel tests pin), which skips materializing the
            # (N, H, W, 2) coords + validity in HBM entirely (~500 MB per
            # map at 2K x 16 src; this chip copies HBM at ~47 GB/s).
            params = warp_pallas.pack_camera_params_traced(ctx.src_cams)
            rays_planar = jnp.moveaxis(rays, -1, 0)
            win = _window(cfg) or (None, None)
            smp, k_valid, _clipped = warp_pallas.project_sample_planar_v4(
                disp_planar, params, pos, jnp.broadcast_to(disp, (h, w)), rays_planar,
                ww_max=win[0], wh_max=win[1],
            )
            # smp is channel-planar (N, C, H, W): plane 0 = NaN-filled
            # disparity, plane 1 = finite-mask. Window-clipped samples are
            # missing -> that source simply doesn't vote (k_valid = 0),
            # matching the v1 kernel's out-of-window semantics.
            d_srcs = smp[:, 0]
            all_finite = smp[:, 1] > 0.999
            valids = not_self & (k_valid > 0.5) & all_finite & jnp.isfinite(d_srcs)
        else:
            def src_coords(cam_src):
                return cost_ops.reproject_rays(pos, rays, cam_src, disp, (h, w))

            coords, valid = jax.vmap(src_coords)(ctx.src_cams)  # (N, H, W, ...)
            d_srcs = jax.vmap(lambda c, i: sampling.bilinear_sample(full_disparity[i], c))(
                coords, jnp.arange(n)
            )
            valids = valid & not_self & jnp.isfinite(d_srcs)
        lo, hi = (1 - frac) * disp, (1 + frac) * disp
        is_match = valids & (d_srcs >= lo) & (d_srcs <= hi)
        is_mismatch = valids & ~is_match
        num_match = jnp.sum(is_match, axis=0)
        num_mismatch = jnp.sum(is_mismatch, axis=0)
        total = num_match + num_mismatch

        # Median of the mismatched disparities, counted from the far end
        # (updateDstDisparityAndMismatchMask, Derp.cpp:605-652)
        mm_vals = jnp.where(is_mismatch, d_srcs, jnp.inf)
        mm_sorted = jnp.sort(mm_vals, axis=0)
        closer = jnp.sum(is_mismatch & (d_srcs < disp), axis=0)
        median_idx = jnp.clip(closer // 2, 0, n - 1)
        median_val = jnp.take_along_axis(mm_sorted, median_idx[None], axis=0)[0]

        keep = (
            (total == 0)
            | (num_match >= cost_ops.MIN_OVERLAPPING_CAMS - 1)
            | (variance > ctx.var_high_thresh)
            | (variance < ctx.var_noise_floor)
        )
        replace = ~keep & fov & fg
        new_disp = jnp.where(replace, jnp.minimum(disp, median_val), disp)
        return new_disp, replace

    return jax.lax.map(one, (jnp.arange(d), disparity))


def spatial_bilateral(ctx: LevelContext, cfg: SolverConfig, disparity):
    """Color-guided joint bilateral on disparity; radius shrinks coarse->fine
    via kLevelScale (Derp.cpp:875-902)."""
    scale = cost_ops.LEVEL_SCALE**cfg.level
    radius = max(
        int(-(-filters.BILATERAL_SPACE_RADIUS_MAX * scale // 1)),
        filters.BILATERAL_SPACE_RADIUS_MIN,
    )

    def one(args):
        dst_idx, disp = args
        color = ctx.src_imgs[ctx.dst2src[dst_idx]]
        mask = ctx.dst_fov_masks[dst_idx] & ctx.dst_fg_masks[dst_idx]
        filtered = filters.joint_bilateral(disp, color[..., :3], mask, radius)
        return jnp.where(ctx.dst_fg_masks[dst_idx], filtered, disp)

    return jax.lax.map(one, (jnp.arange(disparity.shape[0]), disparity))


def median_filter(ctx: LevelContext, cfg: SolverConfig, disparity):
    """Masked median blur, radius 1, background-aware (Derp.cpp:904-920)."""

    def one(args):
        dst_idx, disp = args
        mask = ctx.dst_fov_masks[dst_idx] & ctx.dst_fg_masks[dst_idx]
        bg = ctx.dst_bg_disp[dst_idx] if cfg.has_fg_masks else None
        return filters.masked_median(disp, bg, mask, radius=1)

    return jax.lax.map(one, (jnp.arange(disparity.shape[0]), disparity))


def mask_fov(ctx: LevelContext, disparity):
    """NaN outside the FOV (Derp.cpp:940-951)."""
    return jnp.where(ctx.dst_fov_masks, disparity, jnp.nan)


# Per-stage jitted entry points (used by debug_sync bisection and the
# sharded path; the default path is the fused _jit_level below — one
# program per level, which matters on tunneled devices where every host
# dispatch costs ~20 ms).
_jit_brute_force = jax.jit(brute_force_all, static_argnames=("cfg",))
_jit_random_proposals = jax.jit(random_proposals, static_argnames=("cfg",))
_jit_ping_pong = jax.jit(ping_pong, static_argnames=("cfg",))
_jit_mismatches = jax.jit(handle_mismatches, static_argnames=("cfg",))
_jit_bilateral = jax.jit(spatial_bilateral, static_argnames=("cfg",))
_jit_median = jax.jit(median_filter, static_argnames=("cfg",))
_jit_mask_fov = jax.jit(mask_fov)


def _level_body(ctx: LevelContext, cfg: SolverConfig, init_disparity, key, use_init: bool):
    """The complete per-level pipeline as one traceable function."""
    d = len(ctx.dst2src)
    h, w = ctx.src_imgs.shape[1:3]
    coarsest = cfg.level == cfg.num_levels - 1

    if coarsest or not use_init:
        disparity, costs, confidences = brute_force_all(ctx, cfg)
    else:
        disparity = jnp.asarray(init_disparity, jnp.float32)
        costs = jnp.full((d, h, w), jnp.inf, jnp.float32)
        confidences = jnp.zeros((d, h, w), jnp.float32)

    mismatch_mask = jnp.zeros((d, h, w), bool)
    if not coarsest:
        disparity, costs, confidences = random_proposals(
            ctx, cfg, disparity, costs, confidences, key
        )
        disparity, costs, confidences = ping_pong(ctx, cfg, disparity, costs, confidences)
        if 0 <= cfg.level <= cfg.mismatches_start_level:
            disparity, mismatch_mask = handle_mismatches(ctx, cfg, disparity)

    if cfg.do_bilateral_filter:
        disparity = spatial_bilateral(ctx, cfg, disparity)
    if cfg.do_median_filter:
        disparity = median_filter(ctx, cfg, disparity)
    disparity = mask_fov(ctx, disparity)
    return {
        "disparity": disparity,
        "cost": costs,
        "confidence": confidences,
        "mismatches": mismatch_mask,
    }


_jit_level = jax.jit(_level_body, static_argnames=("cfg", "use_init"))


def process_level(ctx: LevelContext, cfg: SolverConfig, init_disparity=None, key=None,
                  debug_sync: bool = False):
    """Full per-level pipeline (Derp.cpp:1005-1034). ``init_disparity`` is the
    upsampled coarser-level result (None at the coarsest level).

    Runs as ONE jitted program per level (host dispatch costs ~20 ms on
    tunneled devices; the pyramid's small levels would otherwise be
    dispatch-bound). Returns dict with disparity/cost/confidence/mismatch-
    mask maps (D, H, W). With ``debug_sync`` the level runs as per-stage
    programs instead, each blocking and logging (device-fault bisection).
    """
    d = len(ctx.dst2src)
    h, w = ctx.src_imgs.shape[1:3]
    if key is None:
        key = jax.random.PRNGKey(cfg.level)
    use_init = init_disparity is not None
    if init_disparity is None:
        init_disparity = jnp.zeros((d, h, w), jnp.float32)

    if not debug_sync:
        return _jit_level(ctx, cfg, init_disparity, key, use_init)

    import logging as _logging

    _slog = _logging.getLogger("solver")

    def _sync(name, val):
        jax.block_until_ready(val)
        _slog.info("stage %s done", name)
        return val

    coarsest = cfg.level == cfg.num_levels - 1
    if coarsest or not use_init:
        disparity, costs, confidences = _sync("brute_force", _jit_brute_force(ctx, cfg))
    else:
        disparity = jnp.asarray(init_disparity, jnp.float32)
        costs = jnp.full((d, h, w), jnp.inf, jnp.float32)
        confidences = jnp.zeros((d, h, w), jnp.float32)

    mismatch_mask = jnp.zeros((d, h, w), bool)
    if not coarsest:
        disparity, costs, confidences = _sync(
            "random_proposals",
            _jit_random_proposals(ctx, cfg, disparity, costs, confidences, key),
        )
        disparity, costs, confidences = _sync(
            "ping_pong", _jit_ping_pong(ctx, cfg, disparity, costs, confidences)
        )
        if 0 <= cfg.level <= cfg.mismatches_start_level:
            disparity, mismatch_mask = _sync("mismatches", _jit_mismatches(ctx, cfg, disparity))

    if cfg.do_bilateral_filter:
        disparity = _sync("bilateral", _jit_bilateral(ctx, cfg, disparity))
    if cfg.do_median_filter:
        disparity = _sync("median", _jit_median(ctx, cfg, disparity))
    disparity = _sync("mask_fov", _jit_mask_fov(ctx, disparity))
    return {
        "disparity": disparity,
        "cost": costs,
        "confidence": confidences,
        "mismatches": mismatch_mask,
    }
