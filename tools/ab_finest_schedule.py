"""A/B: convergence-aware finest-level solve schedule.

At the finest pyramid levels the upsampled coarser-level disparity is
near-converged, yet the per-level schedule still spends 11 full-image cost
evaluations per map (1 init + 2 random proposals + 8 star candidates,
Derp.cpp:403-551,750-873) — and the 2048-wide level alone is ~54% of the
pyramid (BENCH_r04 level_times). This tool measures, on the real chip and
on every bench scene, what dropping evaluations at the fine levels does to
wall-clock AND to quality (covered RMSE / median / rephoto MSSIM), so the
schedule choice is a measured trade instead of a guess.

Variants (schedule applies to the finest `fine_levels` levels; all coarser
levels keep the reference-shaped 2-proposal full-star schedule):
  base   2 props + 8-candidate star  (11 evals)  — the reference shape
  p1     1 prop  + 8-candidate star  (10 evals)
  ax     2 props + 4-candidate axis star (7 evals)
  p1ax   1 prop  + axis star          (6 evals)
  p0ax   0 props + axis star          (5 evals: center re-eval + 4 axis)

Usage: python tools/ab_finest_schedule.py [--scenes sphere,ring,occluder]
           [--variants base,p1,ax,p1ax,p0ax] [--fine_levels 1] [--width 2048]

Prints one JSON line per (scene, variant).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from facebook360_dep_tpu.core.hostmem import tune_malloc

tune_malloc()

NUM_CAMERAS = 16
BENCH_DST = 2
WIDTHS = [2048, 1024, 512, 256, 200, 128, 100, 80, 60, 50]

VARIANTS = {
    "base": (2, False),
    "p1": (1, False),
    "ax": (2, True),
    "p1ax": (1, True),
    "p0ax": (0, True),
}


def hw(width):
    return (3 * width + 2) // 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="sphere,ring,occluder")
    ap.add_argument("--variants", default="base,p1,ax,p1ax,p0ax")
    ap.add_argument("--fine_levels", type=int, default=1,
                    help="how many finest levels get the reduced schedule")
    ap.add_argument("--width", type=int, default=2048,
                    help="finest level width (full ladder is truncated to it)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from facebook360_dep_tpu.core import camera as cam
    from facebook360_dep_tpu.depth import pipeline, solver
    from facebook360_dep_tpu.ops import cost as costmod
    from facebook360_dep_tpu.ops import warp_pallas
    from facebook360_dep_tpu.render import rephoto, synthetic

    widths = [w for w in WIDTHS if w <= args.width]
    num_levels = len(widths)
    t0 = time.perf_counter()

    def log(m):
        print(f"[{time.perf_counter() - t0:.0f}s] {m}", file=sys.stderr, flush=True)

    def _sync(out):
        jax.block_until_ready(out)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf[(slice(0, 1),) * leaf.ndim]))

    def timed(fn, warm_args, real_args):
        _sync(fn(*warm_args))
        s = time.perf_counter()
        out = fn(*real_args)
        _sync(out)
        return time.perf_counter() - s, out

    resize = jax.jit(
        lambda imgs, h, w: jax.image.resize(
            imgs, (imgs.shape[0], h, w, imgs.shape[3]), "linear"),
        static_argnames=("h", "w"),
    )
    upsample_disp = jax.jit(
        lambda d, h, w: jax.image.resize(
            jnp.nan_to_num(d, nan=1e-4), (d.shape[0], h, w), "linear"),
        static_argnames=("h", "w"),
    )

    def build_ctx(w, rig_src, rig_dst, colors, full_height=None):
        h = colors.shape[1]
        fov = pipeline.generate_fov_masks(rig_dst, (h, w))
        return solver.make_level_context(
            rig_src, rig_dst, colors, fov, use_pallas_sampler=True,
            full_height=hw(widths[0]) if full_height is None else full_height,
        )

    def solve_pyramid(rig_src, rig_dst, colors_full, n_props_fine, axis_fine,
                      window=None, aspect=hw):
        disp = None
        total_s = 0.0
        for level in range(num_levels - 1, -1, -1):
            w = widths[level]
            h = aspect(w)
            colors_l = colors_full if level == 0 else resize(colors_full, h, w)
            ctx = build_ctx(w, rig_src, rig_dst, colors_l,
                            full_height=aspect(widths[0]))
            fine = level < args.fine_levels
            cfg = solver.SolverConfig(
                min_depth=1.0, max_depth=100.0, level=level,
                num_levels=num_levels,
                num_random_proposals=n_props_fine if fine else 2,
                ping_pong_iterations=1,
                star_axis_only=axis_fine if fine else False,
                ww_max=None if window is None else window[0],
                wh_max=None if window is None else window[1],
            )
            if level == num_levels - 1:
                fn = lambda c: solver.process_level(c, cfg)  # noqa: E731
                warm = ctx._replace(src_variance=ctx.src_variance * (1.0 + 1e-6))
                t, out = timed(fn, (warm,), (ctx,))
            else:
                init = upsample_disp(disp, h, w)
                fn = lambda c, i: solver.process_level(c, cfg, init_disparity=i)  # noqa: E731
                t, out = timed(fn, (ctx, init * 1.01), (ctx, init))
            disp = out["disparity"]
            total_s += t
        return disp, total_s

    @jax.jit
    def _coverage_for(cams, gt_d, di):
        n = jax.tree.leaves(cams)[0].shape[0]
        cdst = jax.tree.map(lambda a: a[di], cams)

        def one_src(si):
            csrc = jax.tree.map(lambda a: a[si], cams)
            _, v = costmod.reproject_to_src(cdst, csrc, gt_d, gt_d.shape, gt_d.shape)
            return v & (si != di)

        cnt = jnp.sum(jax.vmap(one_src)(jnp.arange(n)), axis=0)
        return cnt >= 2

    @jax.jit
    def rephoto_mssim(ctx, disparity):
        params = warp_pallas.pack_camera_params_traced(ctx.src_cams)
        rays_planar = jnp.moveaxis(ctx.dst_rays[0], -1, 0)
        sampled, k_valid, _ = warp_pallas.project_sample_planar_v4(
            ctx.src_imgs_t, params,
            jax.tree.map(lambda a: a[0], ctx.dst_cams).position,
            disparity, rays_planar,
        )
        k_valid = k_valid.at[ctx.dst2src[0]].set(0.0)
        wsum = jnp.maximum(k_valid.sum(0), 1e-6)
        rerender = jnp.moveaxis((sampled * k_valid[:, None]).sum(0) / wsum, 0, -1)
        ref_img = ctx.src_imgs[ctx.dst2src[0]][..., :3]
        score = rephoto.compute_score_map("MSSIM", rerender, ref_img)
        mask = (k_valid.sum(0) > 0)[..., None] & jnp.isfinite(score)
        return jnp.where(mask, score, 0.0).sum() / jnp.maximum(mask.sum(), 1)

    # ---- scenes -------------------------------------------------------------
    res = (widths[0], hw(widths[0]))
    scenes = {}
    want = set(args.scenes.split(","))
    if "sphere" in want or "occluder" in want:
        rig = synthetic.make_test_rig(num_cameras=NUM_CAMERAS, resolution=res,
                                      ring_radius=0.3)
        nrig = cam.normalize_rig(rig)
        dst = cam.Rig(cameras=jax.tree.map(lambda a: a[:BENCH_DST], nrig.cameras),
                      ids=nrig.ids[:BENCH_DST], groups=nrig.groups[:BENCH_DST])
        if "sphere" in want:
            colors, gt = synthetic.render_sphere_scene(rig, res, radius=5.0,
                                                       as_numpy=False)
            scenes["sphere"] = (nrig, dst, jax.block_until_ready(colors), gt,
                                None, hw)
        if "occluder" in want:
            from facebook360_dep_tpu.render import raytrace
            mesh = raytrace.box_room_with_occluders(seed=11, num_occluders=4)
            colors, gt = raytrace.render_mesh_scene(rig, res, mesh, as_numpy=False)
            scenes["occluder"] = (nrig, dst, jax.block_until_ready(colors), gt,
                                  None, hw)
    if "ring" in want:
        orig = synthetic.make_outward_ring_rig(NUM_CAMERAS, resolution=res,
                                               ring_radius=0.3)
        norig = cam.normalize_rig(orig)
        or_dst = cam.Rig(
            cameras=jax.tree.map(lambda a: a[:BENCH_DST], norig.cameras),
            ids=norig.ids[:BENCH_DST], groups=norig.groups[:BENCH_DST])
        colors, gt = synthetic.render_sphere_scene(orig, res, radius=5.0,
                                                   as_numpy=False)
        win = costmod.auto_window(
            norig.cameras, or_dst.cameras, (hw(widths[0]), widths[0]),
            min_depth=1.0, max_depth=100.0,
        )
        win = None if win == (256, 40) else win
        scenes["ring"] = (norig, or_dst, jax.block_until_ready(colors), gt,
                          win, hw)
    if "ftheta" in want:
        # the reference's real production rig geometry (bench config 2d)
        ref_rig_path = "/root/reference/res/test/rigs/rig.json"
        if os.path.exists(ref_rig_path):
            ft_raw = cam.load_rig(ref_rig_path)
        else:  # pragma: no cover
            ft_raw = synthetic.make_ftheta_ring_rig(
                15, ring_radius=0.33, resolution=(3360, 2160),
                distortion=synthetic.PRODUCTION_FTHETA_DISTORTION)

        def ft_hw(w):
            return int(round(w * 2160.0 / 3360.0))

        ftrig = cam.normalize_rig(ft_raw)
        ft_dst = cam.Rig(
            cameras=jax.tree.map(lambda a: a[:BENCH_DST], ftrig.cameras),
            ids=ftrig.ids[:BENCH_DST], groups=ftrig.groups[:BENCH_DST])
        colors, gt = synthetic.render_sphere_scene(
            ftrig, (widths[0], ft_hw(widths[0])), radius=5.0, as_numpy=False)
        win = costmod.auto_window(
            ftrig.cameras, ft_dst.cameras, (ft_hw(widths[0]), widths[0]),
            min_depth=1.0, max_depth=100.0,
        )
        win = None if win == (256, 40) else win
        scenes["ftheta"] = (ftrig, ft_dst, jax.block_until_ready(colors), gt,
                            win, ft_hw)
    log(f"fixtures ready: {sorted(scenes)}")

    for name, (rig_src, rig_dst, colors, gt, window, aspect) in scenes.items():
        gt_np = np.asarray(gt[:BENCH_DST])
        cov = np.stack([
            np.asarray(_coverage_for(rig_src.cameras, gt[i], i))
            for i in range(BENCH_DST)
        ])
        ctx_fine = build_ctx(widths[0], rig_src, rig_dst, colors,
                             full_height=aspect(widths[0]))
        for vname in args.variants.split(","):
            n_props, axis = VARIANTS[vname]
            disp, total_s = solve_pyramid(rig_src, rig_dst, colors, n_props,
                                          axis, window=window, aspect=aspect)
            disp_np = np.asarray(disp)
            vc = np.isfinite(disp_np) & cov
            rmse = float(np.sqrt(np.mean((disp_np[vc] - gt_np[vc]) ** 2))
                         / np.mean(gt_np[vc]))
            med = float(np.median(np.abs(disp_np[vc] - gt_np[vc]) / gt_np[vc]))
            mssim = float(rephoto_mssim(
                ctx_fine, jnp.nan_to_num(disp[0], nan=1e-4))) * 100.0
            rec = {
                "scene": name, "variant": vname,
                "fine_levels": args.fine_levels,
                "pyramid_s_per_map": round(total_s / BENCH_DST, 4),
                "covered_rel_rmse": round(rmse, 6),
                "covered_rel_median": round(med, 6),
                "rephoto_mssim_pct": round(mssim, 2),
                "covered_frac": round(float(cov.mean()), 4),
            }
            print(json.dumps(rec), flush=True)
            log(f"{name}/{vname}: {rec['pyramid_s_per_map']}s/map "
                f"rmse {rmse:.4f} med {med:.4f} mssim {mssim:.2f}")


if __name__ == "__main__":
    main()
