"""Stage-wise diff of the repo solver vs the mini reference solver.

Localizes oracle divergence (tests/test_ref_solver_oracle.py) to brute
force vs ping-pong vs median. Prints per-stage rel RMSE / median / flip
stats on the sphere scene.
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import test_ref_solver_oracle as oracle  # reuse scene/IO helpers


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "sphere"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from facebook360_dep_tpu.core import camera as cam
    from facebook360_dep_tpu.depth import pipeline, solver

    rig, u16, _gt = oracle._scene(scene)
    W, H = oracle.W, oracle.H

    nrig = cam.normalize_rig(rig)
    dst_rig = cam.Rig(
        cameras=jax.tree.map(lambda a: a[:1], nrig.cameras),
        ids=nrig.ids[:1], groups=nrig.groups[:1],
    )
    colors = jnp.asarray(u16.astype(np.float32) / 65535.0)
    fov = pipeline.generate_fov_masks(dst_rig, (H, W))
    ctx = solver.make_level_context(nrig, dst_rig, colors, fov, full_height=H)
    cfg = solver.SolverConfig(
        min_depth=oracle.MIN_DEPTH, max_depth=oracle.MAX_DEPTH,
        num_random_proposals=0, ping_pong_iterations=1,
        do_bilateral_filter=False, do_median_filter=True,
        level=0, num_levels=2,
    )
    d_bf, costs, confs = solver.brute_force_all(ctx, cfg)
    d_pp, costs, confs = solver.ping_pong(ctx, cfg, d_bf, costs, confs)
    d_med = solver.median_filter(ctx, cfg, d_pp)
    repo = {
        "_bf": np.asarray(d_bf)[0],
        "_pp": np.asarray(d_pp)[0],
        "": np.asarray(d_med)[0],
    }
    var_floor = float(ctx.var_noise_floor)
    print("fov true frac:", float(np.asarray(fov).mean()), "var floor:", var_floor)

    tool = "/tmp/ref_cpu_baseline"
    with tempfile.TemporaryDirectory() as tmp:
        oracle._run_reference(tool, rig, u16, var_floor, tmp)
        for tag in ("_bf", "_pp", ""):
            ref = np.fromfile(os.path.join(tmp, "out", f"disp00{tag}.f32"), np.float32).reshape(H, W)
            a, b = repo[tag][2:-2, 2:-2], ref[2:-2, 2:-2]
            ok = np.isfinite(a) & np.isfinite(b) & (b > 0)
            rel = np.abs(a[ok] - b[ok]) / b[ok]
            rmse = float(np.sqrt(np.mean((a[ok] - b[ok]) ** 2)) / np.mean(b[ok]))
            # hypothesis-step units at the brute-force grid
            step = (1.0 / oracle.MIN_DEPTH - 1.0 / oracle.MAX_DEPTH) / 149
            flips = np.abs(a[ok] - b[ok]) / step
            print(
                f"stage {tag or 'final':6s}: relRMSE {rmse:.5f} median {np.median(rel):.6f} "
                f"frac>0.5step {(flips > 0.5).mean():.4f} frac>1.5step {(flips > 1.5).mean():.4f} "
                f"max {rel.max():.4f}"
            )


if __name__ == "__main__":
    main()
