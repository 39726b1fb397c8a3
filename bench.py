"""Benchmark: seconds per 2K-equirect depth map per chip (BASELINE.md metric).

Times the flagship fine-level solve — random proposals + ping-pong + bilateral
+ median over a 16-camera rig at 2048x1536 — which is where the reference
spends >95% of its per-frame CPU time (SURVEY.md §3.1), plus a coarsest-level
150-hypothesis brute-force sweep. Prints ONE JSON line on stdout (progress on
stderr).

All fixtures are generated on-device (render_sphere_scene(as_numpy=False));
host<->device transfers of 2K 16-camera stacks would otherwise dominate.
The fine solve runs BENCH_DST destination cameras against all 16 sources and
reports per-map seconds — per-map cost is independent of the dst count (the
solver lax.maps over destinations).

vs_baseline uses an estimated reference CPU cost of 30 s per 2K map (the
reference publishes no wall-clock numbers — BASELINE.md; 30 s/map is a
deliberately conservative floor for ~12 full-image cost evaluations x 15 src
cameras x 3.1 MPx patch-SSD on a multicore CPU, each eval being ~5e9 scalar
ops in the reference's per-pixel loop).
"""

import json
import sys
import time

import numpy as np

REFERENCE_SECONDS_PER_MAP_CPU = 30.0  # estimate; see module docstring

NUM_CAMERAS = 16
BENCH_DST = 2  # destination maps actually solved (metric is per map)
FINE_SIZE = (2048, 1536)  # (W, H)
COARSE_SIZE = (64, 48)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    from facebook360_dep_tpu.core import camera as cam
    from facebook360_dep_tpu.depth import pipeline, solver
    from facebook360_dep_tpu.render import synthetic

    t_start = time.perf_counter()
    rig = synthetic.make_test_rig(num_cameras=NUM_CAMERAS, resolution=FINE_SIZE, ring_radius=0.3)
    nrig = cam.normalize_rig(rig)
    dst_rig = cam.Rig(
        cameras=jax.tree.map(lambda a: a[:BENCH_DST], nrig.cameras),
        ids=nrig.ids[:BENCH_DST],
        groups=nrig.groups[:BENCH_DST],
    )

    # --- coarsest level: brute force over 150 hypotheses -------------------
    colors_c, gt_c = synthetic.render_sphere_scene(rig, COARSE_SIZE, radius=5.0, as_numpy=False)
    fov_c = pipeline.generate_fov_masks(nrig, (COARSE_SIZE[1], COARSE_SIZE[0]))
    ctx_c = solver.make_level_context(nrig, nrig, colors_c, fov_c)
    cfg_c = solver.SolverConfig(min_depth=1.0, max_depth=100.0, level=1, num_levels=2)
    jax.block_until_ready(solver.brute_force_all(ctx_c, cfg_c))  # compile
    log(f"[{time.perf_counter()-t_start:.0f}s] coarse compiled")
    t0 = time.perf_counter()
    disp_c, _, _ = solver.brute_force_all(ctx_c, cfg_c)
    jax.block_until_ready(disp_c)
    coarse_s = time.perf_counter() - t0
    log(f"[{time.perf_counter()-t_start:.0f}s] coarse 150-sweep x{NUM_CAMERAS} maps: {coarse_s:.2f}s")

    # --- fine level: full refinement at 2K ---------------------------------
    colors_f, gt_f = synthetic.render_sphere_scene(rig, FINE_SIZE, radius=5.0, as_numpy=False)
    fov_f = pipeline.generate_fov_masks(dst_rig, (FINE_SIZE[1], FINE_SIZE[0]))
    ctx_f = solver.make_level_context(nrig, dst_rig, colors_f, fov_f, use_pallas_sampler=True)
    cfg_f = solver.SolverConfig(
        min_depth=1.0, max_depth=100.0, level=0, num_levels=2,
        num_random_proposals=2, ping_pong_iterations=1,
    )
    key = jax.random.PRNGKey(0)
    gt_dst = gt_f[:BENCH_DST]
    init = gt_dst * (1.0 + 0.1 * jax.random.normal(key, gt_dst.shape, gt_dst.dtype))
    log(f"[{time.perf_counter()-t_start:.0f}s] fine fixtures ready; compiling")
    out = solver.process_level(ctx_f, cfg_f, init_disparity=init)  # compile
    jax.block_until_ready(out)
    log(f"[{time.perf_counter()-t_start:.0f}s] fine compiled")
    t0 = time.perf_counter()
    out = solver.process_level(ctx_f, cfg_f, init_disparity=init)
    jax.block_until_ready(out)
    fine_s = time.perf_counter() - t0
    log(f"[{time.perf_counter()-t_start:.0f}s] fine level x{BENCH_DST} maps: {fine_s:.2f}s")

    disp = np.asarray(out["disparity"])
    gt_np = np.asarray(gt_dst)
    valid = np.isfinite(disp)
    rmse = float(np.sqrt(np.mean((disp[valid] - gt_np[valid]) ** 2)))
    rel_rmse = rmse / float(np.mean(gt_np[valid]))

    secs_per_map = fine_s / BENCH_DST + coarse_s / NUM_CAMERAS
    print(
        json.dumps(
            {
                "metric": "seconds_per_2k_depth_map_per_chip",
                "value": round(secs_per_map, 4),
                "unit": "s/map",
                "vs_baseline": round(REFERENCE_SECONDS_PER_MAP_CPU / secs_per_map, 2),
                "detail": {
                    "fine_level_s_per_map": round(fine_s / BENCH_DST, 4),
                    "coarse_brute_force_s_per_map": round(coarse_s / NUM_CAMERAS, 4),
                    "disparity_rel_rmse_vs_synthetic_gt": round(rel_rmse, 6),
                    "fine_size": list(FINE_SIZE),
                    "num_src_cameras": NUM_CAMERAS,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
