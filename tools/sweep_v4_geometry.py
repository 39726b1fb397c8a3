"""Sweep v4 sampler tile/window geometry at the bench workload.

The sampler's dense x-contraction is ~4.6 TFLOP per 2K x 16-src eval
(~23 ms at v5e peak) but measures 94 ms — per-grid-step overhead and VPU
weight construction eat the rest. Larger tiles cut grid steps at the price
of more matmul FLOPs per pixel (the window grows slower than the tile).
This sweeps (tile_h, tile_w, window_h, window_w) on the real TPU and
reports time + clipped fraction (configs whose windows under-cover the warp
magnification invalidate pixels and are rejected).

Run: python tools/sweep_v4_geometry.py
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
    from facebook360_dep_tpu.ops import warp_pallas
    from facebook360_dep_tpu.render import synthetic

    w, h = 2048, 1536
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
    dm = jnp.broadcast_to(disp, (h, w))

    configs = [
        # (th, tw, wh, ww) — current default first
        (24, 128, 40, 384),
        (16, 128, 32, 384),
        (32, 128, 48, 384),
        (48, 128, 64, 384),
        (64, 128, 80, 384),
        (24, 128, 40, 256),
        (32, 128, 48, 256),
        (48, 128, 64, 256),
        (24, 256, 40, 512),
        (32, 256, 48, 512),
        (48, 256, 64, 512),
        (96, 128, 112, 384),
    ]
    results = []
    for th, tw, wh, ww in configs:
        def run(d):
            return warp_pallas.project_sample_planar_v4(
                cctx.src_imgs_t, params, cctx.cam_dst.position, d, rays_planar,
                src_exact_bf16=cost_ops.SRC_QUANT_EXACT,
                th=th, tw=tw, wh_max=wh, ww_max=ww,
            )
        try:
            sampled, valid, clipped = jax.block_until_ready(run(dm))
        except Exception as e:  # noqa: BLE001 - sweep survives bad configs
            results.append({"cfg": [th, tw, wh, ww], "error": str(e)[:120]})
            print(json.dumps(results[-1]), flush=True)
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(dm))
            best = min(best, time.perf_counter() - t0)
        rec = {
            "cfg": [th, tw, wh, ww],
            "s": round(best, 4),
            "clipped_frac": round(float(jnp.mean(clipped)), 6),
            "valid_frac": round(float(jnp.mean(valid)), 6),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    results.sort(key=lambda r: r.get("s", 1e9))
    print(json.dumps({"best": results[0]}))


if __name__ == "__main__":
    main()
