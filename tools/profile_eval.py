"""Kernel-split timing of the level-0 hot path on the real TPU.

Answers NOTES_ROUND4 #1: how the ~110 ms full cost eval at 2K x 16 src
splits between the v4 sampler and the k2 ssd_combine, and what the fixed
per-level overhead of process_level is beyond its cost evals.

Run on the real TPU:  python tools/profile_eval.py [--width 2048]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=2048)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    from facebook360_dep_tpu.core import camera as cam
    from facebook360_dep_tpu.depth import pipeline, solver
    from facebook360_dep_tpu.ops import cost as cost_ops
    from facebook360_dep_tpu.ops import warp_pallas
    from facebook360_dep_tpu.render import synthetic

    w = args.width
    h = (3 * w + 2) // 4
    rig = synthetic.make_test_rig(num_cameras=16, resolution=(w, h), ring_radius=0.3)
    nrig = cam.normalize_rig(rig)
    colors, gt = synthetic.render_sphere_scene(rig, (w, h), radius=5.0, as_numpy=False)
    colors = jax.block_until_ready(colors)
    fov = pipeline.generate_fov_masks(nrig, (h, w))
    disp = jnp.nan_to_num(gt[0], nan=1e-4)

    ctx = solver.make_level_context(nrig, nrig, colors, fov, use_pallas_sampler=True)
    cctx = solver._cost_ctx(ctx, 0)

    rays_planar = jnp.moveaxis(cctx.dst_rays, -1, 0)
    params = warp_pallas.pack_camera_params_traced(cctx.src_cams)
    dst_planar = jnp.moveaxis(cctx.dst_img[..., :3], -1, 0)

    def sampler_only(d):
        dm = jnp.broadcast_to(jnp.asarray(d, jnp.float32), (h, w))
        return warp_pallas.project_sample_planar_v4(
            cctx.src_imgs_t, params, cctx.cam_dst.position, dm, rays_planar,
            src_exact_bf16=cost_ops.SRC_QUANT_EXACT,
        )

    sampled, k_valid, clipped = jax.block_until_ready(sampler_only(disp))

    def k2_only(sampled, k_valid):
        return warp_pallas.ssd_combine(
            sampled, k_valid, dst_planar, cctx.variance, cctx.exclude_idx,
            min_keep=cost_ops.MIN_OVERLAPPING_CAMS - 1,
            flt_max=float(cost_ops.FLT_MAX), min_var=float(cost_ops.MIN_VAR),
        )

    # the hot path proper: packed layout (no XLA pad between the kernels)
    def sampler_packed(d):
        dm = jnp.broadcast_to(jnp.asarray(d, jnp.float32), (h, w))
        return warp_pallas.project_sample_packed(
            cctx.src_imgs_t, params, cctx.cam_dst.position, dm, rays_planar,
            src_exact_bf16=cost_ops.SRC_QUANT_EXACT,
        )

    def k2_packed(sampled_p):
        # packed mode: validity is embedded in sampled channel 0 (k_valid=None)
        return warp_pallas.ssd_combine(
            sampled_p, None, dst_planar, cctx.variance, cctx.exclude_idx,
            min_keep=cost_ops.MIN_OVERLAPPING_CAMS - 1,
            flt_max=float(cost_ops.FLT_MAX), min_var=float(cost_ops.MIN_VAR),
            true_shape=(h, w),
        )

    def full_eval(d):
        return cost_ops.cost_for_disparity(cctx, d)

    import numpy as np

    def sync(out):
        # tiny host readback: on the tunnelled backend block_until_ready can
        # return before execution finishes (deferred dispatch)
        jax.block_until_ready(out)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf[(slice(0, 1),) * leaf.ndim]))

    def timed(fn, *a):
        sync(fn(*a))  # compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            sync(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    res = {"width": w, "num_src": 16}
    res["sampler_s"] = round(timed(sampler_only, disp), 4)
    res["k2_s"] = round(timed(k2_only, sampled, k_valid), 4)
    sampled_p = sampler_packed(disp)
    res["sampler_packed_s"] = round(timed(sampler_packed, disp), 4)
    res["k2_packed_s"] = round(timed(k2_packed, sampled_p), 4)
    res["full_eval_s"] = round(timed(full_eval, disp), 4)

    # per-stage split of one mid-pyramid level's process_level (level != coarsest)
    d2 = jnp.stack([disp, disp])
    cfg = solver.SolverConfig(
        min_depth=1.0, max_depth=100.0, level=0, num_levels=10,
        num_random_proposals=2, ping_pong_iterations=1,
    )
    ctx2 = solver.make_level_context(
        nrig, cam.Rig(cameras=jax.tree.map(lambda a: a[:2], nrig.cameras),
                      ids=nrig.ids[:2], groups=nrig.groups[:2]),
        colors, fov[:2], use_pallas_sampler=True,
    )
    key = jax.random.PRNGKey(0)

    zc = jnp.full((2, h, w), jnp.inf, jnp.float32)
    z0 = jnp.zeros((2, h, w), jnp.float32)
    res["proposals_s_2maps"] = round(
        timed(lambda: solver._jit_random_proposals(ctx2, cfg, d2, zc, z0, key)), 4)
    prop = solver._jit_random_proposals(ctx2, cfg, d2, zc, z0, key)
    res["ping_pong_s_2maps"] = round(
        timed(lambda: solver._jit_ping_pong(ctx2, cfg, *prop)), 4)
    pp = solver._jit_ping_pong(ctx2, cfg, *prop)
    res["bilateral_s_2maps"] = round(
        timed(lambda: solver._jit_bilateral(ctx2, cfg, pp[0])), 4)
    res["median_s_2maps"] = round(
        timed(lambda: solver._jit_median(ctx2, cfg, pp[0])), 4)
    res["level_s_2maps"] = round(
        timed(lambda: solver._jit_level(ctx2, cfg, d2, key, True)), 4)

    # per map: 1 init + 2 proposal + 9 ping-pong cost evals = 12
    res["accounted_eval_s_2maps"] = round(res["full_eval_s"] * 12 * 2, 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
