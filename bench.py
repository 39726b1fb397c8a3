"""Benchmark: seconds per 2K depth map per chip (BASELINE.md metric), over
all five BASELINE.json configs.

Headline value = the FULL coarse-to-fine pyramid (reference widths 2048..50,
scripts/render/config.py:46) solved from brute-force init at the coarsest
level — no ground-truth shortcut — plus the amortized cross-camera mismatch
stage (BASELINE config 2). Also timed: the coarse-level-only config (config
1, both at the true coarsest level and as a 150-hypothesis sweep at 2K),
the foreground/background split path (config 3), the 30-frame temporal
bilateral filter (config 4), and the end-to-end publish path — depth +
ConvertToBinary + fusion striping (config 5). Quality: end-to-end disparity
rel RMSE vs synthetic ground truth and rephotography MSSIM at 2K.

Prints ONE JSON line on stdout (progress on stderr). Fixtures are generated
on-device; the axon tunnel memoizes identical executions, so every timed
call is warmed with a perturbed input first and timed with the real one.

vs_baseline divides by a MEASURED reference CPU cost: a faithful C++/OpenCV
port of the reference hot loop (computeCost + computeSSD, Derp.cpp:104-226 /
DerpUtil.cpp:126-162 — tools/ref_cpu_baseline.cpp) run at this exact
workload measured 238.1 s/map single-core on the local Xeon @ 2.1 GHz;
the baseline assumes PERFECT linear ThreadPool scaling on a 16-core node
(238.1/16 = 14.9 s/map — generous to the reference, whose memory-bound
scalar loop scales sublinearly). Methodology + per-level numbers in
BASELINE_MEASURED.json / BASELINE.md. Falls back to the round-1/2 30 s/map
estimate only if the measured file is missing.
"""

import functools
import json
import os
import sys
import time

import numpy as np

from facebook360_dep_tpu.core.hostmem import tune_malloc

tune_malloc()  # host-side configs (publish, IO) pay page faults without it

_MEASURED = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
if os.path.exists(_MEASURED):
    with open(_MEASURED) as _f:
        _m = json.load(_f)
    REFERENCE_SECONDS_PER_MAP_CPU = float(_m["baseline_s_per_map"])
    REFERENCE_BASELINE_SOURCE = {
        "single_core_s_per_map_measured": _m["single_core_s_per_map"],
        "assumed_cores_perfect_scaling": _m["assumed_cores"],
        "machine": _m["machine"],
    }
else:  # pragma: no cover - measured file ships with the repo
    REFERENCE_SECONDS_PER_MAP_CPU = 30.0
    REFERENCE_BASELINE_SOURCE = {"estimate": "30 s/map (unmeasured fallback)"}

NUM_CAMERAS = 16
BENCH_DST = 2  # destination maps solved in the pyramid (metric is per map)
# the reference pyramid (scripts/render/config.py:46), 4:3 aspect
WIDTHS = [2048, 1024, 512, 256, 200, 128, 100, 80, 60, 50]
TEMPORAL_FRAMES = 30
TIME_RADIUS = 2  # TemporalBilateralFilter.cpp default


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def hw(width):
    return (3 * width + 2) // 4  # 1536 at 2048


def main():
    t_start = time.perf_counter()
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from facebook360_dep_tpu.core import camera as cam
    from facebook360_dep_tpu.depth import pipeline, solver
    from facebook360_dep_tpu.ops import filters
    from facebook360_dep_tpu.render import rephoto, synthetic

    def elapsed():
        return f"[{time.perf_counter() - t_start:.0f}s]"

    rig = synthetic.make_test_rig(
        num_cameras=NUM_CAMERAS, resolution=(WIDTHS[0], hw(WIDTHS[0])), ring_radius=0.3
    )
    nrig = cam.normalize_rig(rig)

    def take_dst(d):
        return cam.Rig(
            cameras=jax.tree.map(lambda a: a[:d], nrig.cameras),
            ids=nrig.ids[:d],
            groups=nrig.groups[:d],
        )

    dst_rig = take_dst(BENCH_DST)
    colors_2k, gt_2k = synthetic.render_sphere_scene(
        rig, (WIDTHS[0], hw(WIDTHS[0])), radius=5.0, as_numpy=False
    )
    colors_2k = jax.block_until_ready(colors_2k)
    log(f"{elapsed()} fixtures rendered")

    def build_ctx(w, rig_dst, colors, rig_src=None, full_height=None, **kw):
        h = colors.shape[1]
        fov = pipeline.generate_fov_masks(rig_dst, (h, w))
        return solver.make_level_context(
            nrig if rig_src is None else rig_src, rig_dst, colors, fov,
            use_pallas_sampler=True,
            full_height=hw(WIDTHS[0]) if full_height is None else full_height,
            **kw
        )

    def _sync(out):
        """Force completion with a tiny host readback: on the tunnelled
        backend block_until_ready can return before execution finishes
        (deferred dispatch), which silently under-measures."""
        jax.block_until_ready(out)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf[(slice(0, 1),) * leaf.ndim]))

    def timed(fn, warm_args, real_args):
        """Run fn(warm) to compile+warm (the tunnel memoizes identical
        executions), then time fn(real)."""
        _sync(fn(*warm_args))
        t0 = time.perf_counter()
        out = fn(*real_args)
        _sync(out)
        return time.perf_counter() - t0, out

    resize = jax.jit(
        lambda imgs, h, w: jax.image.resize(imgs, (imgs.shape[0], h, w, imgs.shape[3]), "linear"),
        static_argnames=("h", "w"),
    )
    upsample_disp = jax.jit(
        lambda d, h, w: jax.image.resize(
            jnp.nan_to_num(d, nan=1e-4), (d.shape[0], h, w), "linear"
        ),
        static_argnames=("h", "w"),
    )

    # --- config 2 (headline): full coarse-to-fine pyramid, 10 levels --------
    num_levels = len(WIDTHS)

    def solve_pyramid(colors_full, rig_dst_=None, rig_src_=None, window=None,
                      aspect=None):
        """Full coarse-to-fine cascade from brute-force init; returns
        (disparity stack, total seconds, per-level times, coarsest time).
        ``aspect``: width -> height (default the 4:3 reference ladder; the
        production FTHETA rig is 14:9)."""
        aspect = hw if aspect is None else aspect
        level_times = {}
        disp = None
        total_s = 0.0
        coarsest_s = None
        for level in range(num_levels - 1, -1, -1):
            w = WIDTHS[level]
            h = aspect(w)
            colors_l = colors_full if level == 0 else resize(colors_full, h, w)
            ctx = build_ctx(w, dst_rig if rig_dst_ is None else rig_dst_, colors_l,
                            rig_src=rig_src_, full_height=aspect(WIDTHS[0]))
            cfg = solver.SolverConfig(
                min_depth=1.0, max_depth=100.0, level=level, num_levels=num_levels,
                num_random_proposals=2, ping_pong_iterations=1,
                ww_max=None if window is None else window[0],
                wh_max=None if window is None else window[1],
            )
            if level == num_levels - 1:
                fn = lambda c: solver.process_level(c, cfg)  # noqa: E731
                warm_ctx = ctx._replace(src_variance=ctx.src_variance * (1.0 + 1e-6))
                t, out = timed(fn, (warm_ctx,), (ctx,))
                coarsest_s = t
            else:
                init = upsample_disp(disp, h, w)
                fn = lambda c, i: solver.process_level(c, cfg, init_disparity=i)  # noqa: E731
                t, out = timed(fn, (ctx, init * 1.01), (ctx, init))
            disp = out["disparity"]
            total_s += t
            level_times[w] = round(t, 4)
            log(f"{elapsed()} level {level} ({w}x{h}): {t:.3f}s for {BENCH_DST} maps")
        return disp, total_s, level_times, coarsest_s

    disp, pyramid_s, level_times, coarsest_s = solve_pyramid(colors_2k)
    pyramid_s_per_map = pyramid_s / BENCH_DST

    disp_np = np.asarray(disp)
    gt_np = np.asarray(gt_2k[:BENCH_DST])
    valid = np.isfinite(disp_np)
    rel_rmse = float(
        np.sqrt(np.mean((disp_np[valid] - gt_np[valid]) ** 2)) / np.mean(gt_np[valid])
    )

    # Covered-pixel RMSE: the ring rig leaves a thin sliver per dst seen by
    # <2 other cameras (kMinOverlappingCams, Derp.h:27) — geometry the
    # reference REFUSES without --partial_coverage (Derp.cpp:334-348), so the
    # quality contract binds where stereo coverage exists. Mask = >=2 srcs
    # see the GT point.
    from facebook360_dep_tpu.ops import cost as costmod

    @jax.jit
    def _coverage_for(cams, gt_d, di):
        cdst = jax.tree.map(lambda a: a[di], cams)

        def one_src(si):
            csrc = jax.tree.map(lambda a: a[si], cams)
            _, v = costmod.reproject_to_src(
                cdst, csrc, gt_d, gt_d.shape, gt_d.shape
            )
            return v & (si != di)

        cnt = jnp.sum(jax.vmap(one_src)(jnp.arange(NUM_CAMERAS)), axis=0)
        return cnt >= 2

    def coverage(gt_d, di, cams=None):
        return _coverage_for(nrig.cameras if cams is None else cams, gt_d, di)

    cov = np.stack([np.asarray(coverage(gt_2k[i], i)) for i in range(BENCH_DST)])
    vc = valid & cov
    rel_rmse_cov = float(
        np.sqrt(np.mean((disp_np[vc] - gt_np[vc]) ** 2)) / np.mean(gt_np[vc])
    )
    rel_median = float(np.median(np.abs(disp_np[vc] - gt_np[vc]) / gt_np[vc]))
    log(
        f"{elapsed()} pyramid {pyramid_s_per_map:.3f}s/map, rel RMSE {rel_rmse:.4f} "
        f"(covered {rel_rmse_cov:.4f} over {cov.mean():.1%})"
    )

    # rephotography MSSIM at 2K: re-render dst 0 from the other sources at the
    # solved disparity (ComputeRephotographyErrors equivalent)
    from facebook360_dep_tpu.ops import warp_pallas

    @jax.jit
    def rephoto_mssim(ctx, disparity):
        params = warp_pallas.pack_camera_params_traced(ctx.src_cams)
        rays_planar = jnp.moveaxis(ctx.dst_rays[0], -1, 0)
        sampled, k_valid, _ = warp_pallas.project_sample_planar_v4(
            ctx.src_imgs_t, params, jax.tree.map(lambda a: a[0], ctx.dst_cams).position,
            disparity, rays_planar,
        )
        k_valid = k_valid.at[ctx.dst2src[0]].set(0.0)
        wsum = jnp.maximum(k_valid.sum(0), 1e-6)
        rerender = jnp.moveaxis((sampled * k_valid[:, None]).sum(0) / wsum, 0, -1)
        ref_img = ctx.src_imgs[ctx.dst2src[0]][..., :3]
        score = rephoto.compute_score_map("MSSIM", rerender, ref_img)
        mask = (k_valid.sum(0) > 0)[..., None] & jnp.isfinite(score)
        return jnp.where(mask, score, 0.0).sum() / jnp.maximum(mask.sum(), 1)

    ctx_2k = build_ctx(WIDTHS[0], dst_rig, colors_2k)
    mssim = float(rephoto_mssim(ctx_2k, jnp.nan_to_num(disp[0], nan=1e-4))) * 100.0
    log(f"{elapsed()} rephoto MSSIM {mssim:.2f}")

    # mismatch stage at 2K needs every camera as a destination
    # (Derp.cpp:553-748); timed once with the full rig, amortized per map
    ctx_mm = build_ctx(WIDTHS[0], nrig, colors_2k)
    cfg_mm = solver.SolverConfig(min_depth=1.0, max_depth=100.0, level=0, num_levels=num_levels)
    disp_all = jnp.broadcast_to(gt_2k, (NUM_CAMERAS,) + gt_2k.shape[1:]) if gt_2k.shape[0] != NUM_CAMERAS else gt_2k
    fn_mm = lambda d: solver._jit_mismatches(ctx_mm, cfg_mm, d)  # noqa: E731
    t_mm, _ = timed(fn_mm, (disp_all * 1.01,), (disp_all,))
    mismatch_s_per_map = t_mm / NUM_CAMERAS
    log(f"{elapsed()} mismatch stage: {t_mm:.3f}s for {NUM_CAMERAS} maps")

    headline_s_per_map = pyramid_s_per_map + mismatch_s_per_map

    # --- config 2b: the HARD scene — BVH occluder room ----------------------
    # Perlin-textured room + floating occluder boxes (render/raytrace.py):
    # depth discontinuities + occlusion, the regime the analytic sphere scene
    # cannot exercise (VERDICT r2 weak #4). Same cascade, same metrics.
    from facebook360_dep_tpu.render import raytrace

    mesh_occ = raytrace.box_room_with_occluders(seed=11, num_occluders=4)
    colors_occ, gt_occ = raytrace.render_mesh_scene(
        rig, (WIDTHS[0], hw(WIDTHS[0])), mesh_occ, as_numpy=False
    )
    colors_occ = jax.block_until_ready(colors_occ)
    log(f"{elapsed()} occluder-room fixtures raytraced")
    disp_occ, pyramid_occ_s, _, _ = solve_pyramid(colors_occ)
    pyramid_occ_s_per_map = pyramid_occ_s / BENCH_DST
    disp_occ_np = np.asarray(disp_occ)
    gt_occ_np = np.asarray(gt_occ[:BENCH_DST])
    v_occ = np.isfinite(disp_occ_np)
    rmse_occ = float(
        np.sqrt(np.mean((disp_occ_np[v_occ] - gt_occ_np[v_occ]) ** 2)) / np.mean(gt_occ_np[v_occ])
    )
    cov_occ = np.stack([np.asarray(coverage(gt_occ[i], i)) for i in range(BENCH_DST)])
    vc_occ = v_occ & cov_occ
    rmse_occ_cov = float(
        np.sqrt(np.mean((disp_occ_np[vc_occ] - gt_occ_np[vc_occ]) ** 2)) / np.mean(gt_occ_np[vc_occ])
    )
    # RMSE on the occluder room is dominated by the 1-px bands at depth
    # discontinuities; the median shows the bulk accuracy
    rel_median_occ = float(
        np.median(np.abs(disp_occ_np[vc_occ] - gt_occ_np[vc_occ]) / gt_occ_np[vc_occ])
    )
    ctx_occ = build_ctx(WIDTHS[0], dst_rig, colors_occ)
    mssim_occ = float(rephoto_mssim(ctx_occ, jnp.nan_to_num(disp_occ[0], nan=1e-4))) * 100.0
    log(
        f"{elapsed()} occluder scene: {pyramid_occ_s_per_map:.3f}s/map, rel RMSE "
        f"{rmse_occ:.4f} (covered {rmse_occ_cov:.4f} over {cov_occ.mean():.1%}), "
        f"MSSIM {mssim_occ:.2f}"
    )

    # --- config 2c: outward-facing production 360 ring -----------------------
    # the rig shape the sampler's visibility skip was built for (~80% of
    # (source, tile) pairs mutually invisible; adjacent-camera stereo only)
    orig_rig = synthetic.make_outward_ring_rig(
        NUM_CAMERAS, resolution=(WIDTHS[0], hw(WIDTHS[0])), ring_radius=0.3
    )
    norig = cam.normalize_rig(orig_rig)
    or_dst = cam.Rig(
        cameras=jax.tree.map(lambda a: a[:BENCH_DST], norig.cameras),
        ids=norig.ids[:BENCH_DST], groups=norig.groups[:BENCH_DST],
    )
    colors_or, gt_or = synthetic.render_sphere_scene(
        orig_rig, (WIDTHS[0], hw(WIDTHS[0])), radius=5.0, as_numpy=False
    )
    colors_or = jax.block_until_ready(colors_or)
    log(f"{elapsed()} outward-ring fixtures rendered")
    # rig-derived sampler window (cost.auto_window): the outward ring's
    # rotation stretch needs 384x56; forward rigs keep the tuned defaults
    win_or = costmod.auto_window(
        norig.cameras, or_dst.cameras, (hw(WIDTHS[0]), WIDTHS[0]),
        min_depth=1.0, max_depth=100.0,
    )
    win_or = None if win_or == (256, 40) else win_or
    log(f"{elapsed()} outward-ring sampler window: {win_or or 'defaults'}")
    disp_or, pyramid_or_s, _, _ = solve_pyramid(
        colors_or, rig_dst_=or_dst, rig_src_=norig, window=win_or
    )
    pyramid_or_s_per_map = pyramid_or_s / BENCH_DST
    disp_or_np = np.asarray(disp_or)
    gt_or_np = np.asarray(gt_or[:BENCH_DST])
    cov_or = np.stack(
        [np.asarray(coverage(gt_or[i], i, cams=norig.cameras)) for i in range(BENCH_DST)]
    )
    vc_or = np.isfinite(disp_or_np) & cov_or
    rmse_or_cov = float(
        np.sqrt(np.mean((disp_or_np[vc_or] - gt_or_np[vc_or]) ** 2)) / np.mean(gt_or_np[vc_or])
    )
    rel_median_or = float(
        np.median(np.abs(disp_or_np[vc_or] - gt_or_np[vc_or]) / gt_or_np[vc_or])
    )
    ctx_or = build_ctx(WIDTHS[0], or_dst, colors_or, rig_src=norig)
    mssim_or = float(rephoto_mssim(ctx_or, jnp.nan_to_num(disp_or[0], nan=1e-4))) * 100.0
    log(
        f"{elapsed()} outward ring: {pyramid_or_s_per_map:.3f}s/map, covered rel RMSE "
        f"{rmse_or_cov:.4f} over {cov_or.mean():.1%}, MSSIM {mssim_or:.2f}"
    )

    # --- config 2d: the reference's PRODUCTION rig: 16-cam FTHETA fisheye ---
    # the real res/test/rigs/rig.json geometry (measured calibration:
    # FTHETA projection + polynomial distortion, fov pi/2, 3360x2160 14:9
    # sensors) — executes the in-kernel fisheye + distortion branches at 2K
    # (VERDICT r5 #1c). Loaded from the reference checkout; falls back to
    # the equivalent synthetic production shape if absent on this host.
    ref_rig_path = "/root/reference/res/test/rigs/rig.json"
    if os.path.exists(ref_rig_path):
        ft_rig_raw = cam.load_rig(ref_rig_path)
        ft_src_note = "res/test/rigs/rig.json"
    else:  # pragma: no cover - reference checkout ships with the image
        ft_rig_raw = synthetic.make_ftheta_ring_rig(
            15, ring_radius=0.33, resolution=(3360, 2160),
            distortion=synthetic.PRODUCTION_FTHETA_DISTORTION)
        ft_src_note = "synthetic ftheta_ring fallback"

    def ft_hw(w):  # the rig's 14:9 sensor aspect (2160/3360)
        return int(round(w * 2160.0 / 3360.0))

    ftrig = cam.normalize_rig(ft_rig_raw)
    ft_n = len(ftrig.ids)
    ft_dst = cam.Rig(
        cameras=jax.tree.map(lambda a: a[:BENCH_DST], ftrig.cameras),
        ids=ftrig.ids[:BENCH_DST], groups=ftrig.groups[:BENCH_DST],
    )
    colors_ft, gt_ft = synthetic.render_sphere_scene(
        ftrig, (WIDTHS[0], ft_hw(WIDTHS[0])), radius=5.0, as_numpy=False
    )
    colors_ft = jax.block_until_ready(colors_ft)
    log(f"{elapsed()} ftheta-rig fixtures rendered ({ft_n} cams, {ft_src_note})")
    win_ft = costmod.auto_window(
        ftrig.cameras, ft_dst.cameras, (ft_hw(WIDTHS[0]), WIDTHS[0]),
        min_depth=1.0, max_depth=100.0,
    )
    log(f"{elapsed()} ftheta-rig sampler window: {win_ft}")
    disp_ft, pyramid_ft_s, _, _ = solve_pyramid(
        colors_ft, rig_dst_=ft_dst, rig_src_=ftrig,
        window=None if win_ft == (256, 40) else win_ft, aspect=ft_hw,
    )
    pyramid_ft_s_per_map = pyramid_ft_s / BENCH_DST
    disp_ft_np = np.asarray(disp_ft)
    gt_ft_np = np.asarray(gt_ft[:BENCH_DST])

    @jax.jit
    def _coverage_ft(gt_d, di):
        cdst = jax.tree.map(lambda a: a[di], ftrig.cameras)

        def one_src(si):
            csrc = jax.tree.map(lambda a: a[si], ftrig.cameras)
            _, v = costmod.reproject_to_src(cdst, csrc, gt_d, gt_d.shape, gt_d.shape)
            return v & (si != di)

        cnt = jnp.sum(jax.vmap(one_src)(jnp.arange(ft_n)), axis=0)
        return cnt >= 2

    cov_ft = np.stack([np.asarray(_coverage_ft(gt_ft[i], i)) for i in range(BENCH_DST)])
    vc_ft = np.isfinite(disp_ft_np) & cov_ft
    rmse_ft_cov = float(
        np.sqrt(np.mean((disp_ft_np[vc_ft] - gt_ft_np[vc_ft]) ** 2)) / np.mean(gt_ft_np[vc_ft])
    )
    rel_median_ft = float(
        np.median(np.abs(disp_ft_np[vc_ft] - gt_ft_np[vc_ft]) / gt_ft_np[vc_ft])
    )
    # in-circle coverage achieved by the solve (the fisheye circle leaves
    # the raster corners dark; fraction is over in-circle pixels)
    fov_ft = np.asarray(pipeline.generate_fov_masks(
        ft_dst, (ft_hw(WIDTHS[0]), WIDTHS[0])))
    cov_ft_frac = float((vc_ft & fov_ft).sum() / max(fov_ft.sum(), 1))
    ctx_ft = build_ctx(WIDTHS[0], ft_dst, colors_ft, rig_src=ftrig,
                       full_height=ft_hw(WIDTHS[0]))
    mssim_ft = float(rephoto_mssim(ctx_ft, jnp.nan_to_num(disp_ft[0], nan=1e-4))) * 100.0
    log(
        f"{elapsed()} ftheta production rig: {pyramid_ft_s_per_map:.3f}s/map, covered rel "
        f"RMSE {rmse_ft_cov:.4f} over {cov_ft_frac:.1%} of the circle, MSSIM {mssim_ft:.2f}"
    )

    # --- config 1: coarse-level-only -----------------------------------------
    # (a) the true coarsest level is timed above (coarsest_s);
    # (b) a full 150-hypothesis brute-force sweep at 2K, one destination
    ctx_c1 = build_ctx(WIDTHS[0], take_dst(1), colors_2k)
    cfg_c1 = solver.SolverConfig(min_depth=1.0, max_depth=100.0, level=0, num_levels=1)
    fn_bf = lambda c: solver._jit_brute_force(c, cfg_c1)  # noqa: E731
    warm_c1 = ctx_c1._replace(src_variance=ctx_c1.src_variance * (1.0 + 1e-6))
    t_coarse2k, _ = timed(fn_bf, (warm_c1,), (ctx_c1,))
    log(f"{elapsed()} 150-sweep at 2K: {t_coarse2k:.3f}s/map")

    # --- config 6: batch throughput on ONE chip (VERDICT r5 #7) --------------
    # vs_baseline_per_v5e8_slice assumes independent maps scale linearly
    # across the slice's 8 chips; the per-CHIP term it extrapolates from is
    # grounded here by solving 1 vs 8 destination maps in one pyramid pass —
    # the batch=8 run shares the chip's HBM bandwidth across 4x the
    # headline's maps, so its per-map time measures the contention the x8
    # extrapolation assumes away.
    _, t_b1, _, _ = solve_pyramid(colors_2k, rig_dst_=take_dst(1))
    _, t_b8, _, _ = solve_pyramid(colors_2k, rig_dst_=take_dst(8))
    batch_eff = (t_b1 * 8.0) / t_b8 if t_b8 > 0 else 0.0
    log(
        f"{elapsed()} batch throughput: 1 map {t_b1:.3f}s, 8 maps {t_b8:.3f}s "
        f"({8.0 / t_b8:.2f} maps/s, scaling efficiency {batch_eff:.2f}x vs 1-map latency)"
    )

    # --- config 7: MFU / roofline accounting (VERDICT r5 #5) -----------------
    # achieved MAC/s and HBM GB/s of the hot kernels vs this chip's MEASURED
    # ceilings (dispatch-floor-corrected; see tools/utilization.py)
    from tools import utilization as _util

    util = _util.measure(width=WIDTHS[0], num_src=NUM_CAMERAS, reps=3,
                         log=lambda s: log(f"{elapsed()} utilization: {s}"))

    # --- config 3: foreground/background split ------------------------------
    med = jnp.nanmedian(gt_2k[:BENCH_DST])
    fg_masks = gt_2k[:BENCH_DST] > med
    bg_disp = jnp.where(fg_masks, 0.5 * gt_2k[:BENCH_DST], gt_2k[:BENCH_DST])
    ctx_fg = build_ctx(WIDTHS[0], dst_rig, colors_2k, dst_fg_masks=fg_masks, dst_bg_disp=bg_disp)
    cfg_fg = solver.SolverConfig(
        min_depth=1.0, max_depth=100.0, level=0, num_levels=num_levels,
        num_random_proposals=2, ping_pong_iterations=1, has_fg_masks=True,
    )
    init_fg = jnp.asarray(disp_np) if disp_np.shape[0] == BENCH_DST else gt_np
    init_fg = jnp.nan_to_num(init_fg, nan=1e-4)
    fn_fg = lambda i: solver.process_level(ctx_fg, cfg_fg, init_disparity=i)  # noqa: E731
    t_fg, _ = timed(fn_fg, (init_fg * 1.01,), (init_fg,))
    fgbg_s_per_map = t_fg / BENCH_DST
    log(f"{elapsed()} fg/bg split level: {fgbg_s_per_map:.3f}s/map")

    # --- config 4: 30-frame temporal bilateral filter ------------------------
    h2k, w2k = hw(WIDTHS[0]), WIDTHS[0]
    key = jax.random.PRNGKey(7)
    tshift = (0.02 * jax.random.normal(key, (2 * TIME_RADIUS + 1, 1, 1))).astype(jnp.float32)
    guides = jnp.clip(colors_2k[0][None] * (1.0 + tshift[..., None]), 0, 1)
    disps_t = gt_2k[0][None] * (1.0 + 0.01 * tshift)
    masks_t = jnp.isfinite(disps_t)

    @jax.jit
    def one_frame(guides, disps, masks):
        return filters.temporal_bilateral(
            guides, disps, masks, frame_offset=TIME_RADIUS, sigma=0.01, spatial_radius=1
        )

    t_tf, _ = timed(
        lambda g: one_frame(g, disps_t, masks_t), (guides * 0.999,), (guides,)
    )
    log(f"{elapsed()} temporal filter: {t_tf:.3f}s/frame (window {2*TIME_RADIUS+1}, {TEMPORAL_FRAMES}-frame clip = {t_tf*TEMPORAL_FRAMES:.1f}s)")

    # --- config 5: end-to-end publish (depth + ConvertToBinary + fusion) ----
    # per-(frame, camera) process pool (ConvertToBinary.cpp ThreadPool
    # parity), median-of-3 with spread — round-2 single-runs swung 3x with
    # host contention
    import tempfile

    from facebook360_dep_tpu.cli import convert_to_binary as ctb
    from facebook360_dep_tpu.core import io as dep_io
    from facebook360_dep_tpu.stream import fusion

    pub_cams = list(nrig.ids[:BENCH_DST])
    with tempfile.TemporaryDirectory() as tmp:
        disp_dir = os.path.join(tmp, "disp")
        color_dir = os.path.join(tmp, "color")
        for i, cam_id in enumerate(pub_cams):
            os.makedirs(os.path.join(disp_dir, cam_id), exist_ok=True)
            os.makedirs(os.path.join(color_dir, cam_id), exist_ok=True)
            dep_io.write_pfm(
                os.path.join(disp_dir, cam_id, "000000.pfm"),
                np.nan_to_num(disp_np[i], nan=1e-4).astype(np.float32),
            )
            dep_io.write_color(
                os.path.join(color_dir, cam_id, "000000.png"),
                np.asarray(colors_2k[i]), bit_depth=8,
            )
        rig_path = os.path.join(tmp, "rig.json")
        import facebook360_dep_tpu.core.camera as _cam

        _cam.save_rig(rig_path, cam.Rig(
            cameras=jax.tree.map(lambda a: np.asarray(a)[:BENCH_DST], nrig.cameras),
            ids=tuple(pub_cams), groups=("",) * BENCH_DST,
        ))
        pub_times = []
        for rep in range(5):  # median-of-5: single-core host tenancy swings
            # individual runs by seconds (round-4 spread 5.2 s at median 4.9)
            bin_dir = os.path.join(tmp, f"bin{rep}")
            t0 = time.perf_counter()
            ctb.main([
                "--rig", rig_path, "--bin", bin_dir,
                "--color", color_dir, "--disparity", disp_dir,
                "--fused", os.path.join(tmp, f"fused{rep}"),
            ])
            pub_times.append(time.perf_counter() - t0)
        pub_times.sort()
        t_pub = pub_times[len(pub_times) // 2] / len(pub_cams)  # median run, per frame-camera
        pub_spread = (pub_times[-1] - pub_times[0]) / len(pub_cams)
    log(
        f"{elapsed()} publish path: {t_pub:.3f}s/frame-camera "
        f"(median of {len(pub_times)}, spread {pub_spread:.3f}s, pool over {len(pub_cams)} cams)"
    )

    print(
        json.dumps(
            {
                "metric": "seconds_per_2k_depth_map_per_chip",
                "value": round(headline_s_per_map, 4),
                "unit": "s/map",
                "vs_baseline": round(REFERENCE_SECONDS_PER_MAP_CPU / headline_s_per_map, 2),
                "detail": {
                    "reference_baseline_s_per_map": REFERENCE_SECONDS_PER_MAP_CPU,
                    "reference_baseline_source": REFERENCE_BASELINE_SOURCE,
                    # one v5e-8 slice solves 8 maps concurrently (frame/camera
                    # sharding is embarrassingly parallel; parallel/sharding.py)
                    "vs_baseline_per_v5e8_slice": round(
                        REFERENCE_SECONDS_PER_MAP_CPU / (headline_s_per_map / 8.0), 2
                    ),
                    "full_pyramid_s_per_map": round(pyramid_s_per_map, 4),
                    "mismatch_stage_s_per_map": round(mismatch_s_per_map, 4),
                    "level_times_for_2_maps": level_times,
                    "disparity_rel_rmse_full_pyramid_vs_gt": round(rel_rmse, 6),
                    "disparity_rel_rmse_covered_pixels": round(rel_rmse_cov, 6),
                    "disparity_rel_median_covered": round(rel_median, 6),
                    "covered_pixel_fraction": round(float(cov.mean()), 4),
                    "rephoto_mssim_pct": round(mssim, 2),
                    "coarsest_level_s_per_map": round(coarsest_s / BENCH_DST, 4),
                    "coarse_2k_150_sweep_s_per_map": round(t_coarse2k, 4),
                    "fgbg_split_s_per_map": round(fgbg_s_per_map, 4),
                    "temporal_filter_s_per_frame": round(t_tf, 4),
                    "publish_s_per_frame_camera": round(t_pub, 4),
                    "publish_spread_s": round(pub_spread, 4),
                    "single_pass_sampler": bool(getattr(costmod, "SRC_QUANT_EXACT", False)),
                    "outward_ring": {
                        "pyramid_s_per_map": round(pyramid_or_s_per_map, 4),
                        "disparity_rel_rmse_covered_pixels": round(rmse_or_cov, 6),
                        "disparity_rel_median_covered": round(rel_median_or, 6),
                        "covered_pixel_fraction": round(float(cov_or.mean()), 4),
                        "rephoto_mssim_pct": round(mssim_or, 2),
                    },
                    "ftheta_rig": {
                        "source": ft_src_note,
                        "num_cameras": ft_n,
                        "sampler_window": list(win_ft),
                        "pyramid_s_per_map": round(pyramid_ft_s_per_map, 4),
                        "disparity_rel_rmse_covered_pixels": round(rmse_ft_cov, 6),
                        "disparity_rel_median_covered": round(rel_median_ft, 6),
                        "covered_in_circle_fraction": round(cov_ft_frac, 4),
                        "rephoto_mssim_pct": round(mssim_ft, 2),
                    },
                    "occluder_scene": {
                        "pyramid_s_per_map": round(pyramid_occ_s_per_map, 4),
                        "disparity_rel_rmse_vs_gt": round(rmse_occ, 6),
                        "disparity_rel_rmse_covered_pixels": round(rmse_occ_cov, 6),
                        "disparity_rel_median_covered": round(rel_median_occ, 6),
                        "covered_pixel_fraction": round(float(cov_occ.mean()), 4),
                        "rephoto_mssim_pct": round(mssim_occ, 2),
                    },
                    "batch_throughput": {
                        "one_map_pyramid_s": round(t_b1, 4),
                        "eight_map_pyramid_s": round(t_b8, 4),
                        "maps_per_s_batched": round(8.0 / t_b8, 4) if t_b8 > 0 else 0.0,
                        "scaling_efficiency_vs_1map": round(batch_eff, 3),
                    },
                    "utilization": util,
                    "pyramid_widths": WIDTHS,
                    "num_src_cameras": NUM_CAMERAS,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
