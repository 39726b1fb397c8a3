"""Coarse-to-fine depth-estimation driver: the DerpCLI equivalent.

Host loop over pyramid levels and frames (``depth_estimation/DerpCLI.cpp:
179-328``); per level, data lives on device and :func:`solver.process_level`
runs as one jitted program. Between levels, the coarser disparity initializes
the finer one via upsampling (``UpsampleDisparityLib.cpp:93-220``).

The filesystem contract (color_levels/level_N/<cam>/<frame>.ext in,
disparity_levels out) matches the reference so stages interoperate.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..core import camera as cam
from ..core import imagetypes, io
from ..ops import cost as cost_ops
from ..ops import sampling
from . import solver

log = logging.getLogger("derp")


@dataclass
class DepthEstimatorOptions:
    """Mirrors the DerpCLI flags (DerpCLI.cpp:40-67)."""

    input_root: str = ""
    output_root: str = ""
    rig: str = ""
    color: str = ""
    background_disp: str = ""
    foreground_masks: str = ""
    background_frame: str = "000000"
    cameras: str = ""
    first: str = "000000"
    last: str = "000000"
    level_start: int = -1
    level_end: int = -1
    num_levels: int = -1
    min_depth_m: float = 0.5
    max_depth_m: float = 1e4
    mismatches_start_level: int = -1
    output_formats: str = "pfm"
    partial_coverage: bool = False
    ping_pong_iterations: int = 1
    random_proposals: int = 2
    # Convergence-aware fine-level schedule: the N finest levels drop the
    # PatchMatch star's four long-range diagonal candidates
    # (solver.SolverConfig.star_axis_only) and run
    # ``fast_fine_random_proposals`` random proposals instead of
    # ``random_proposals``. At those levels the upsampled coarser-level
    # init is near-converged, so the dropped candidates are measured
    # quality-neutral on the bench scenes (tools/ab_finest_schedule.py;
    # PARITY.md) while each removes a full-image cost evaluation — the
    # dominant cost at the finest level. 0 = the reference-shaped
    # schedule at every level (Derp.cpp:403-551).
    fast_fine_levels: int = 0
    fast_fine_random_proposals: int = 1
    resolution: int = 2048
    use_foreground_masks: bool = False
    var_high_thresh: float = 1e-3
    var_noise_floor: float = 4e-5
    do_bilateral_filter: bool = True
    do_median_filter: bool = True
    save_debug_images: bool = False
    # plotMatches (Derp.cpp:28-70; kDebug* constants Derp.h:50-55 exposed as
    # flags): project one dst pixel's solved depth into every src image
    debug_dir: str = ""
    debug_plot_match_dst: str = ""
    debug_plot_match_x: int = -1
    debug_plot_match_y: int = -1
    debug_plot_match_level: int = -1
    # SURVEY §5.1: reusable profiler hook — when set, each level's solve runs
    # under jax.profiler.trace(profile_dir) (one trace subdir per run),
    # viewable with tensorboard/xprof or perfetto
    profile_dir: str = ""
    extra: dict = field(default_factory=dict)

    def resolve_paths(self):
        if not self.rig:
            self.rig = os.path.join(self.input_root, "rigs/rig_calibrated.json")
        if not self.color:
            self.color = imagetypes.image_dir(self.input_root, "color_levels")
        if not self.background_disp:
            self.background_disp = imagetypes.image_dir(self.input_root, "background_disp_levels")
        if not self.foreground_masks:
            self.foreground_masks = imagetypes.image_dir(self.input_root, "foreground_masks_levels")


from functools import partial


@partial(jax.jit, static_argnames=("h", "w"))
def _fov_masks(cams, h: int, w: int) -> jnp.ndarray:
    # the pixel grid is built INSIDE the trace: capturing an eagerly-computed
    # grid embeds a (H, W, 2) constant in the HLO, which this environment's
    # remote-compile service uploads at ~0.1 MB/s (minutes per compile at 2K)
    grid = sampling.pixel_center_grid(h, w) / jnp.asarray([w, h], jnp.float32)
    return jax.vmap(lambda c: ~cam.is_outside_image_circle(c, grid))(cams)


def generate_fov_masks(rig: cam.Rig, size_hw) -> jnp.ndarray:
    """(D, H, W) bool: inside-image-circle per dst camera (DerpUtil.cpp:259-276)."""
    h, w = size_hw
    cams = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32) if jnp.asarray(a).dtype.kind == "f" else jnp.asarray(a), rig.cameras)
    return _fov_masks(cams, int(h), int(w))


def upsample_disparity_init(disp: np.ndarray, size_wh) -> np.ndarray:
    """Between-level init, no-foreground path: NaN -> minDisp then Lanczos4
    (UpsampleDisparityLib.cpp:143-148)."""
    d = np.nan_to_num(np.asarray(disp, np.float32), nan=1e-4)
    return io.resize_image(d, size_wh, "lanczos")


def upsample_disparity_fg(
    disp: np.ndarray,
    mask: np.ndarray,
    mask_up: np.ndarray,
    bg_disp_up: np.ndarray,
    size_wh: tuple,
) -> np.ndarray:
    """Foreground path (UpsampleDisparityLib.cpp:97-141): mask out background,
    nearest upsample, fill in-mask NaNs from the nearest valid sample, fill the
    rest from the upsampled background disparity."""
    import cv2

    d = np.asarray(disp, np.float32).copy()
    d[~mask] = np.nan
    d_up = cv2.resize(d, tuple(int(v) for v in size_wh), interpolation=cv2.INTER_NEAREST)
    d_up[~mask_up] = np.nan

    invalid = ~np.isfinite(d_up) & mask_up
    if invalid.any():
        valid = np.isfinite(d_up)
        if valid.any():
            _, (iy, ix) = _nearest_valid_index(valid)
            d_up[invalid] = d_up[iy[invalid], ix[invalid]]
    remaining = ~np.isfinite(d_up)
    d_up[remaining] = bg_disp_up[remaining]
    return d_up


def _nearest_valid_index(valid: np.ndarray):
    import cv2

    inv = (~valid).astype(np.uint8)
    dist, labels = cv2.distanceTransformWithLabels(
        inv, cv2.DIST_L2, 3, labelType=cv2.DIST_LABEL_PIXEL
    )
    ys, xs = np.nonzero(valid)
    # labels index into the set of zero pixels (valid ones), 1-based
    lbl_at_valid = labels[ys, xs]
    map_y = np.zeros(labels.max() + 1, np.int32)
    map_x = np.zeros(labels.max() + 1, np.int32)
    map_y[lbl_at_valid] = ys
    map_x[lbl_at_valid] = xs
    return dist, (map_y[labels], map_x[labels])


class DepthEstimator:
    """Loads rig + pyramid metadata once; estimates disparity per frame/level."""

    def __init__(self, opts: DepthEstimatorOptions):
        opts.resolve_paths()
        self.opts = opts
        rig_src = cam.load_rig(opts.rig)
        self.rig_src_full = rig_src
        rig_dst = cam.filter_destinations(rig_src, opts.cameras)
        self.full_width = int(np.asarray(rig_dst.cameras.resolution)[0][0])
        self.full_height = int(np.asarray(rig_dst.cameras.resolution)[0][1])
        self.rig_src = cam.normalize_rig(rig_src)
        self.rig_dst = cam.normalize_rig(rig_dst)

        sizes = io.get_pyramid_level_sizes(opts.color)
        sizes.update(io.get_pyramid_level_sizes(imagetypes.image_dir(opts.output_root, "disparity_levels")))
        assert sizes, f"no pyramid levels found under {opts.color}"
        self.level_sizes = sizes  # level -> (width, height)
        self.num_levels = (max(sizes) + 1) if opts.num_levels == -1 else opts.num_levels
        self.level_start = opts.level_start if opts.level_start >= 0 else self.num_levels - 1
        self.level_end = self._resolve_level_end()

    def _resolve_level_end(self) -> int:
        """Largest level whose width fits the requested resolution (DerpCLI.cpp:159-178)."""
        level_end = 0
        for level in sorted(self.level_sizes):
            if self.level_sizes[level][0] <= self.opts.resolution:
                level_end = level
                break
        return max(level_end, self.opts.level_end if self.opts.level_end >= 0 else 0)

    # ---- per level/frame IO -------------------------------------------------

    def _load_level_images(self, root, level, rig, frame, loader):
        out = []
        for cam_id in rig.ids:
            path_dir = os.path.join(str(root), f"level_{level}", cam_id)
            probe = io.first_image_in(path_dir)
            assert probe, f"no images in {path_dir}"
            ext = os.path.splitext(probe)[1]
            out.append(loader(os.path.join(path_dir, frame + ext)))
        return np.stack(out)

    def load_colors(self, level, frame):
        imgs = self._load_level_images(self.opts.color, level, self.rig_src, frame, io.read_color)
        return imgs[..., :3]

    def load_fg_masks(self, level, frame, rig):
        return self._load_level_images(self.opts.foreground_masks, level, rig, frame, io.read_mask)

    def load_bg_disp(self, level):
        return self._load_level_images(
            self.opts.background_disp, level, self.rig_dst, self.opts.background_frame, io.read_disparity
        )

    def _disparity_path(self, level, cam_id, frame, ext):
        return imagetypes.gen_filename(self.opts.output_root, "disparity_levels", level, cam_id, frame, ext)

    def save_results(self, level, frame, result):
        formats = {f for f in self.opts.output_formats.split(",") if f}
        formats.add("pfm")  # always save PFM (Derp.cpp:930-937)
        disp = np.asarray(result["disparity"])
        for i, cam_id in enumerate(self.rig_dst.ids):
            for ext in sorted(formats):
                path = self._disparity_path(level, cam_id, frame, ext)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                io.write_disparity(path, disp[i])

    def save_debug_images(self, level, frame, result, fov_masks):
        """Per-dst cost/confidence/mismatch-overlay/disparity debug PNGs
        (PyramidLevel.h:418-461 saveDebugImages; scales DerpUtil.h:23-25)."""
        import cv2

        disp = np.asarray(result["disparity"], np.float32)
        cost = np.asarray(result["cost"], np.float32)
        conf = np.asarray(result["confidence"], np.float32)
        mism = np.asarray(result["mismatches"], bool)
        fov = np.asarray(fov_masks, bool)
        for i, cam_id in enumerate(self.rig_dst.ids):
            def path(image_type):
                p = imagetypes.gen_filename(self.opts.output_root, image_type, level, cam_id, frame, "png")
                os.makedirs(os.path.dirname(p), exist_ok=True)
                return p

            # disparity: clamp [0,1] -> PNG16, NaN -> 0 (PyramidLevel.h:442-445)
            d16 = np.nan_to_num(np.clip(disp[i], 0.0, 1.0)) * 65535.0
            cv2.imwrite(path("disparity_levels"), d16.astype(np.uint16))
            # cost x 255/100, confidence x 255*100 -> PNG8
            c8 = np.clip(np.nan_to_num(cost[i].astype(np.float64)) * (255.0 / 100.0), 0, 255)
            cv2.imwrite(path("cost"), c8.astype(np.uint8))
            f8 = np.clip(np.nan_to_num(conf[i].astype(np.float64)) * (255.0 * 100.0), 0, 255)
            cv2.imwrite(path("confidence"), f8.astype(np.uint8))
            # mismatch overlay: red where mismatched, gray disparity elsewhere,
            # transparent black outside FOV (overlayMismatchedDstDisparityMask)
            g = np.clip(np.nan_to_num(disp[i]), 0.0, 1.0) * 255.0
            bgra = np.zeros(disp[i].shape + (4,), np.uint8)
            inside = fov[i]
            for ch in range(3):
                bgra[..., ch] = np.where(inside, g, 0).astype(np.uint8)
            red = inside & mism[i]
            bgra[red] = (0, 0, 255, 255)
            bgra[..., 3] = np.where(inside, 255, 0).astype(np.uint8)
            cv2.imwrite(path("mismatches"), bgra)

    def check_coverage(self, level, frame, result, fov_masks):
        """Insufficient-coverage policy at the brute-force level
        (Derp.cpp:334-348): pixels inside the FOV that no camera pair covers
        are fatal unless --partial_coverage or --use_foreground_masks."""
        cost = np.asarray(result["cost"])
        uncovered = ~np.isfinite(cost) & np.asarray(fov_masks, bool)
        n = int(uncovered.sum())
        if n == 0:
            return
        reasons = []
        if self.opts.partial_coverage:
            reasons.append("due to partial coverage")
        if self.opts.use_foreground_masks:
            reasons.append("due to noisy foreground masks")
        msg = (
            f"Insufficient coverage at {n} pixels (level {level}, frame {frame}) "
            + " or ".join(reasons)
        )
        if not reasons:
            raise RuntimeError(msg + "; pass --partial_coverage if the rig does not cover 360")
        log.warning(msg)

    def plot_matches(self, level, frame, result, colors, caller="processLevel"):
        """plotDstPointInSrc for every src (Derp.cpp:28-70, DerpUtil.cpp:164-197):
        unproject the debug pixel at its solved disparity, project into each
        src image, mark the landing point green, save one PNG per src."""
        o = self.opts
        if (
            not o.debug_dir
            or not o.debug_plot_match_dst
            or o.debug_plot_match_level != level
            or o.debug_plot_match_x < 0
            or o.debug_plot_match_y < 0
        ):
            return
        import cv2

        from ..core import camera as cam

        x, y = o.debug_plot_match_x, o.debug_plot_match_y
        di = self.rig_dst.ids.index(o.debug_plot_match_dst)
        disp = float(np.asarray(result["disparity"])[di, y, x])
        if not np.isfinite(disp) or disp <= 0:
            log.warning("plotMatches: no disparity at (%d, %d)", x, y)
            return
        h, w = np.asarray(result["disparity"]).shape[1:]
        cdst = jax.tree.map(lambda a: np.asarray(a)[di], self.rig_dst.cameras)
        # rig cameras are normalized (resolution == [1,1]): pixel coords scale
        # by the level size both directions (as in ops.cost.reproject_rays)
        pix_norm = jnp.asarray([(x + 0.5) / w, (y + 0.5) / h], jnp.float32)
        ray = np.asarray(cam.ray_dir(cdst, pix_norm))
        world = np.asarray(cdst.position) + ray / disp
        os.makedirs(o.debug_dir, exist_ok=True)
        for si, src_id in enumerate(self.rig_src.ids):
            if src_id == o.debug_plot_match_dst:
                continue
            csrc = jax.tree.map(lambda a: np.asarray(a)[si], self.rig_src.cameras)
            pix, valid = cam.sees(csrc, jnp.asarray(world))
            if not bool(np.asarray(valid)):
                continue
            px, py = float(pix[0]) * w, float(pix[1]) * h
            img = (np.clip(np.asarray(colors[si])[..., :3], 0, 1) * 65535).astype(np.uint16)
            img = np.ascontiguousarray(img[..., ::-1])  # BGR for imwrite
            iy = int(np.clip(py, 0, img.shape[0] - 1))
            ix = int(np.clip(px, 0, img.shape[1] - 1))
            img[iy, ix] = (0, 65535, 0)
            fn = os.path.join(
                o.debug_dir,
                f"{caller}_{o.debug_plot_match_dst}_x={x}_y={y}->"
                f"{src_id}_x={px:.2f}_y={py:.2f}.png",
            )
            cv2.imwrite(fn, img)
        log.info("plotMatches: wrote projections of %s (%d, %d) disparity %.4f",
                 o.debug_plot_match_dst, x, y, disp)

    def load_coarser_disparity(self, level, frame, size_wh):
        """Upsampled init from level+1 outputs (DerpCLI.cpp:271-303)."""
        out = []
        for i, cam_id in enumerate(self.rig_dst.ids):
            path = self._disparity_path(level + 1, cam_id, frame, "pfm")
            coarse = io.read_disparity(path)
            if self.opts.use_foreground_masks:
                mask = self.load_fg_masks(level + 1, frame, self.rig_dst)[i]
                mask_up = self.load_fg_masks(level, frame, self.rig_dst)[i]
                bg_up = self.load_bg_disp(level)[i]
                out.append(upsample_disparity_fg(coarse, mask, mask_up, bg_up, size_wh))
            else:
                out.append(upsample_disparity_init(coarse, size_wh))
        return np.stack(out)

    # ---- main entry ---------------------------------------------------------

    def frames(self):
        first, last = int(self.opts.first), int(self.opts.last)
        return [io.frame_name(f) for f in range(first, last + 1)]

    def run(self):
        if self.opts.profile_dir:
            # one device+host trace around the whole solve; per-level
            # boundaries appear as named TraceAnnotations
            with jax.profiler.trace(self.opts.profile_dir):
                self._run_levels()
            log.info("profiler trace written to %s", self.opts.profile_dir)
        else:
            self._run_levels()

    def _run_levels(self):
        t0 = time.time()
        for level in range(self.level_start, self.level_end - 1, -1):
            size_wh = self.level_sizes[level]
            w, h = size_wh
            fov_masks = generate_fov_masks(self.rig_dst, (h, w))
            # rig-derived sampler window (cost.auto_window): high-magnification
            # rigs (dst FOV much wider than a src's) exceed the default 256x40
            # source window and would silently clip; measure the warp Jacobian
            # once per level and size the window to fit
            use_pallas = jax.default_backend() == "tpu"
            ww_max = wh_max = None
            if use_pallas:
                ww_max, wh_max = cost_ops.auto_window(
                    self.rig_src.cameras, self.rig_dst.cameras, (h, w),
                    min_depth=self.opts.min_depth_m, max_depth=self.opts.max_depth_m,
                )
                if (ww_max, wh_max) != (256, 40):
                    log.info("level %d: auto sampler window %dx%d", level, ww_max, wh_max)
                # defaults are the tuned fast path; only override upward
                ww_max = None if ww_max <= 256 else ww_max
                wh_max = None if wh_max <= 40 else wh_max
            fast_fine = level < self.opts.fast_fine_levels
            cfg = solver.SolverConfig(
                min_depth=self.opts.min_depth_m,
                max_depth=self.opts.max_depth_m,
                num_random_proposals=(
                    self.opts.fast_fine_random_proposals
                    if fast_fine else self.opts.random_proposals
                ),
                star_axis_only=fast_fine,
                ping_pong_iterations=self.opts.ping_pong_iterations,
                mismatches_start_level=self.opts.mismatches_start_level,
                do_bilateral_filter=self.opts.do_bilateral_filter,
                do_median_filter=self.opts.do_median_filter,
                has_fg_masks=self.opts.use_foreground_masks,
                level=level,
                num_levels=self.num_levels,
                ww_max=ww_max,
                wh_max=wh_max,
            )
            if cfg.mismatches_start_level >= 0:
                assert self.rig_dst.ids == self.rig_src.ids, (
                    "mismatch handling requires all cameras as destinations"
                )
            for frame in self.frames():
                tf = time.time()
                colors = self.load_colors(level, frame)
                fg = bg = src_fg = None
                if self.opts.use_foreground_masks:
                    src_fg = self.load_fg_masks(level, frame, self.rig_src)
                    fg = self.load_fg_masks(level, frame, self.rig_dst)
                    bg = self.load_bg_disp(level)
                ctx = solver.make_level_context(
                    self.rig_src,
                    self.rig_dst,
                    colors,
                    fov_masks,
                    dst_fg_masks=fg,
                    dst_bg_disp=bg,
                    src_fg_masks=src_fg,
                    var_noise_floor=self.opts.var_noise_floor,
                    var_high_thresh=self.opts.var_high_thresh,
                    full_height=self.full_height,
                    # the windowed Pallas sampler wins at every level on TPU
                    # (~10x at mid-pyramid widths; sources edge-pad to the
                    # (8,128) DMA tiling below 128 px); on CPU backends the
                    # interpret-mode kernel would be the slow path
                    use_pallas_sampler=use_pallas,
                )
                # below the coarsest level, init from the coarser level's saved
                # result (also how mid-pyramid resume works; DerpCLI.cpp:271-303)
                init = None
                if level < self.num_levels - 1:
                    init = self.load_coarser_disparity(level, frame, size_wh)
                result = solver.process_level(ctx, cfg, init_disparity=init)
                result = jax.tree.map(np.asarray, result)
                if level == self.num_levels - 1 or init is None:
                    # brute force ran: enforce the coverage policy
                    self.check_coverage(level, frame, result, fov_masks)
                self.save_results(level, frame, result)
                if self.opts.save_debug_images:
                    self.save_debug_images(level, frame, result, fov_masks)
                self.plot_matches(level, frame, result, colors)
                log.info("frame %s level %d (%dx%d): %.2fs", frame, level, w, h, time.time() - tf)
            log.info("-- Elapsed time: %.2fs", time.time() - t0)
        log.info("-- TOTAL: %.2fs", time.time() - t0)
