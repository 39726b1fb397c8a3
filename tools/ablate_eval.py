"""Ablation suite for the cost-eval kernels on the real TPU.

Times the v4 sampler and k2 combine with their `_ablate` knobs plus a raw
HBM copy-rate probe — the methodology that localized the round-3 finds
(XLA pads dominating k2; DMA per-tile processing, not bandwidth; weight
build as VMEM traffic; dot at the MXU ceiling). One JSON line out.

Run: python tools/ablate_eval.py [--width 2048] [--num_src 16]

Timing note: on the tunnelled backend block_until_ready can return before
execution finishes, and identical executions are memoized — every sample
here forces a tiny host readback and the warm-up uses distinct inputs.
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
    p.add_argument("--num_src", type=int, default=16)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    from facebook360_dep_tpu.core import camera as cam
    from facebook360_dep_tpu.ops import cost as cost_ops
    from facebook360_dep_tpu.ops import sampling, warp_pallas
    from facebook360_dep_tpu.render import synthetic

    w = args.width
    h = (3 * w + 2) // 4
    n = args.num_src
    rig = synthetic.make_test_rig(num_cameras=n, resolution=(w, h), ring_radius=0.3)
    nrig = cam.normalize_rig(rig)
    colors = jax.random.uniform(jax.random.PRNGKey(0), (n, h, w, 3), jnp.float32)
    stack = cost_ops.quantize_src(warp_pallas.planar_for_sampling(colors))
    f32 = lambda a: jnp.asarray(a, jnp.float32) if jnp.asarray(a).dtype.kind == "f" else jnp.asarray(a)  # noqa: E731
    cams = jax.tree.map(f32, nrig.cameras)
    cam0 = jax.tree.map(lambda a: a[0], cams)
    rays_planar = jnp.moveaxis(cost_ops.dst_ray_dirs(cam0, h, w), -1, 0)
    params = warp_pallas.pack_camera_params_traced(cams)
    dm = jnp.full((h, w), 0.15, jnp.float32)
    dst_planar = jnp.moveaxis(colors[0][..., :3], -1, 0)
    variance = sampling.rgb_variance(colors[0])

    def sync(r):
        leaf = jax.tree.leaves(r)[0]
        np.asarray(jax.device_get(leaf[(slice(0, 1),) * leaf.ndim]))

    def timed(fn):
        sync(fn())
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            sync(fn())
            best = min(best, time.perf_counter() - t0)
        return round(best * 1000, 1)

    res = {"width": w, "num_src": n}

    # raw HBM copy rate: a fused elementwise read+write of the color stack
    big = jax.random.uniform(jax.random.PRNGKey(1), (n, 3, h, w), jnp.float32)
    copy_ms = timed(jax.jit(lambda: big + 1.0))
    res["hbm_copy_ms"] = copy_ms
    res["hbm_copy_gbps"] = round(2 * big.nbytes / (copy_ms / 1e3) / 1e9, 1)

    def sampler(ab="", **kw):
        def f():
            return warp_pallas.project_sample_planar_v4(
                stack, params, cam0.position, dm, rays_planar,
                src_exact_bf16=cost_ops.SRC_QUANT_EXACT, _ablate=ab, **kw)
        return f

    res["v4"] = timed(sampler())
    for ab in ("no_dma", "ones_wx", "skip_dot", "skip_fold", "proj_only"):
        res[f"v4_{ab}"] = timed(sampler(ab))
    res["v4_g1"] = timed(sampler(srcs_per_launch=1))
    res["v4_packed"] = timed(lambda: warp_pallas.project_sample_packed(
        stack, params, cam0.position, dm, rays_planar,
        src_exact_bf16=cost_ops.SRC_QUANT_EXACT))

    sampled, k_valid, _ = warp_pallas.project_sample_planar_v4(
        stack, params, cam0.position, dm, rays_planar,
        src_exact_bf16=cost_ops.SRC_QUANT_EXACT)
    kw2 = dict(min_keep=cost_ops.MIN_OVERLAPPING_CAMS - 1,
               flt_max=float(cost_ops.FLT_MAX), min_var=float(cost_ops.MIN_VAR))

    def k2(ab="", **kw):
        def f():
            return warp_pallas.ssd_combine(
                sampled, k_valid, dst_planar, variance, 0, _ablate=ab, **kw2, **kw)
        return f

    res["k2"] = timed(k2())
    for ab in ("no_dma", "read_only", "diff_only", "no_box", "no_md"):
        res[f"k2_{ab}"] = timed(k2(ab))

    sampled_p = warp_pallas.project_sample_packed(
        stack, params, cam0.position, dm, rays_planar,
        src_exact_bf16=cost_ops.SRC_QUANT_EXACT)
    res["k2_packed"] = timed(lambda: warp_pallas.ssd_combine(
        sampled_p, None, dst_planar, variance, 0, true_shape=(h, w), **kw2))

    print(json.dumps(res))


if __name__ == "__main__":
    main()
