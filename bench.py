"""Benchmark: seconds per 2K-equirect depth map per chip (BASELINE.md metric).

Times the flagship fine-level solve — random proposals + ping-pong + bilateral
+ median over a 16-camera rig at 2048x1536 — which is where the reference
spends >95% of its per-frame CPU time (SURVEY.md §3.1), plus a coarsest-level
150-hypothesis brute-force sweep. Prints ONE JSON line.

vs_baseline uses an estimated reference CPU cost of 30 s per 2K map (the
reference publishes no wall-clock numbers — BASELINE.md —; 30 s/map is a
deliberately conservative floor for ~12 full-image cost evaluations x 15 src
cameras x 3.1 MPx patch-SSD on a multicore CPU, each eval being ~5e9 scalar
ops in the reference's per-pixel loop).
"""

import json
import time

import numpy as np

REFERENCE_SECONDS_PER_MAP_CPU = 30.0  # estimate; see module docstring

NUM_CAMERAS = 16
FINE_SIZE = (2048, 1536)  # (W, H)
COARSE_SIZE = (64, 48)


def main():
    import jax

    from facebook360_dep_tpu.core import camera as cam
    from facebook360_dep_tpu.depth import pipeline, solver
    from facebook360_dep_tpu.render import synthetic

    rig = synthetic.make_test_rig(num_cameras=NUM_CAMERAS, resolution=FINE_SIZE, ring_radius=0.3)
    nrig = cam.normalize_rig(rig)

    # --- coarsest level: brute force over 150 hypotheses -------------------
    colors_c, gt_c = synthetic.render_sphere_scene(rig, COARSE_SIZE, radius=5.0)
    fov_c = pipeline.generate_fov_masks(nrig, colors_c.shape[1:3])
    ctx_c = solver.make_level_context(nrig, nrig, colors_c, fov_c)
    cfg_c = solver.SolverConfig(min_depth=1.0, max_depth=100.0, level=1, num_levels=2)
    jax.block_until_ready(solver.brute_force_all(ctx_c, cfg_c))  # compile
    t0 = time.perf_counter()
    disp_c, _, _ = solver.brute_force_all(ctx_c, cfg_c)
    jax.block_until_ready(disp_c)
    coarse_s = time.perf_counter() - t0

    # --- fine level: full refinement at 2K ---------------------------------
    colors_f, gt_f = synthetic.render_sphere_scene(rig, FINE_SIZE, radius=5.0)
    fov_f = pipeline.generate_fov_masks(nrig, colors_f.shape[1:3])
    ctx_f = solver.make_level_context(nrig, nrig, colors_f, fov_f)
    cfg_f = solver.SolverConfig(
        min_depth=1.0, max_depth=100.0, level=1, num_levels=2,
        num_random_proposals=2, ping_pong_iterations=1,
    )
    init = gt_f * (1.0 + 0.1 * np.random.RandomState(0).randn(*gt_f.shape).astype(np.float32))
    out = solver.process_level(ctx_f, cfg_f, init_disparity=init)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = solver.process_level(ctx_f, cfg_f, init_disparity=init)
    jax.block_until_ready(out)
    fine_s = time.perf_counter() - t0

    disp = np.asarray(out["disparity"])
    valid = np.isfinite(disp)
    rmse = float(np.sqrt(np.mean((disp[valid] - gt_f[valid]) ** 2)))

    secs_per_map = (fine_s + coarse_s) / NUM_CAMERAS
    print(
        json.dumps(
            {
                "metric": "seconds_per_2k_depth_map_per_chip",
                "value": round(secs_per_map, 4),
                "unit": "s/map",
                "vs_baseline": round(REFERENCE_SECONDS_PER_MAP_CPU / secs_per_map, 2),
                "detail": {
                    "fine_level_s_16maps": round(fine_s, 4),
                    "coarse_brute_force_s_16maps": round(coarse_s, 4),
                    "disparity_rmse_vs_synthetic_gt": round(rmse, 6),
                    "fine_size": list(FINE_SIZE),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
