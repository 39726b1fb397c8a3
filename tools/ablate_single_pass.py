"""A/B the single-contraction sampler (quantized bf16-exact sources) against
the hi/lo split at the bench workload (2K x 16 src, one full cost eval).

Round-3 item 8: with sources snapped to k/256 every window value is exactly
bf16-representable and one MXU contraction suffices (cost.SRC_QUANT_EXACT).
Run on the real TPU:  python tools/ablate_single_pass.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    from facebook360_dep_tpu.core import camera as cam
    from facebook360_dep_tpu.depth import pipeline, solver
    from facebook360_dep_tpu.ops import cost as cost_ops
    from facebook360_dep_tpu.render import synthetic

    w, h = 2048, 1536
    rig = synthetic.make_test_rig(num_cameras=16, resolution=(w, h), ring_radius=0.3)
    nrig = cam.normalize_rig(rig)
    colors, gt = synthetic.render_sphere_scene(rig, (w, h), radius=5.0, as_numpy=False)
    colors = jax.block_until_ready(colors)
    fov = pipeline.generate_fov_masks(nrig, (h, w))
    disp = jnp.nan_to_num(gt[0], nan=1e-4)

    results = {}
    for exact in (False, True):
        cost_ops.SRC_QUANT_EXACT = exact
        ctx = solver.make_level_context(nrig, nrig, colors, fov, use_pallas_sampler=True)
        cctx = solver._cost_ctx(ctx, 0)

        def run(d):
            return cost_ops.cost_for_disparity(cctx, d)

        jax.block_until_ready(run(disp * 1.01))  # compile + warm
        t0 = time.perf_counter()
        out = run(disp)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        c = out[0]
        results["single_pass" if exact else "hi_lo"] = {
            "eval_s": round(dt, 5),
            "finite_cost_frac": round(float(jnp.mean(jnp.isfinite(c) & (c < 1e30))), 4),
            "median_cost": float(jnp.nanmedian(jnp.where(c < 1e30, c, jnp.nan))),
        }
        print(f"{'single' if exact else 'hi/lo'}: {dt:.4f}s/eval", file=sys.stderr, flush=True)

    results["speedup"] = round(results["hi_lo"]["eval_s"] / results["single_pass"]["eval_s"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
