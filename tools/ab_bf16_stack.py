"""A/B the bf16 source-stack lever (cost.SRC_STACK_BF16) on the real TPU.

Times project_sample_packed + ssd_combine (the 2K hot-path composition) and
the full cost_for_disparity with the quantized stack stored as f32 vs bf16,
and verifies the outputs are bit-identical on device. One JSON line out.

Run: python tools/ab_bf16_stack.py [--width 2048] [--num_src 16]
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
    p.add_argument("--reps", type=int, default=5)
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
    planar = warp_pallas.planar_for_sampling(colors)
    stack32 = cost_ops.quantize_src(planar)
    stack16 = cost_ops.quantize_src(planar, dtype=jnp.bfloat16)
    f32 = lambda a: jnp.asarray(a, jnp.float32) if jnp.asarray(a).dtype.kind == "f" else jnp.asarray(a)  # noqa: E731
    cams = jax.tree.map(f32, nrig.cameras)
    cam0 = jax.tree.map(lambda a: a[0], cams)
    rays_planar = jnp.moveaxis(cost_ops.dst_ray_dirs(cam0, h, w), -1, 0)
    params = warp_pallas.pack_camera_params_traced(cams)
    dm = jnp.full((h, w), 0.15, jnp.float32)
    dst_planar = jnp.moveaxis(colors[0][..., :3], -1, 0)
    variance = sampling.rgb_variance(colors[0])
    kw2 = dict(min_keep=cost_ops.MIN_OVERLAPPING_CAMS - 1,
               flt_max=float(cost_ops.FLT_MAX), min_var=float(cost_ops.MIN_VAR))

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
        return round(best * 1000, 2)

    res = {"width": w, "num_src": n}

    def packed(stack):
        return lambda: warp_pallas.project_sample_packed(
            stack, params, cam0.position, dm, rays_planar, src_exact_bf16=True)

    # arrays go in as jit ARGUMENTS: closure-captured operands would be
    # inlined into the HLO as constants, and the ~600 MB stack blows the
    # remote-compile upload limit (HTTP 413)
    @jax.jit
    def _full(stack, d, rays, dstp, var):
        sp = warp_pallas.project_sample_packed(
            stack, params, cam0.position, d, rays, src_exact_bf16=True)
        return warp_pallas.ssd_combine(
            sp, None, dstp, var, 0, true_shape=(h, w), **kw2)

    def full(stack):
        return lambda: _full(stack, dm, rays_planar, dst_planar, variance)

    # bit-identity on device first (also exercises the Mosaic compile)
    p32 = packed(stack32)()
    p16 = packed(stack16)()
    hh = 8 + h + 1
    wwp = 128 + w + 1
    eq = bool(jnp.array_equal(p32[:, :, 7:hh, 127:wwp], p16[:, :, 7:hh, 127:wwp]))
    res["bit_identical"] = eq

    res["packed_f32_ms"] = timed(packed(stack32))
    res["packed_bf16_ms"] = timed(packed(stack16))
    res["full_f32_ms"] = timed(full(stack32))
    res["full_bf16_ms"] = timed(full(stack16))
    # wider windows (the fisheye/outward auto_window regime)
    for ww_max, wh_max in ((384, 56), (512, 88)):
        a = timed(lambda: warp_pallas.project_sample_packed(
            stack32, params, cam0.position, dm, rays_planar,
            src_exact_bf16=True, ww_max=ww_max, wh_max=wh_max))
        b = timed(lambda: warp_pallas.project_sample_packed(
            stack16, params, cam0.position, dm, rays_planar,
            src_exact_bf16=True, ww_max=ww_max, wh_max=wh_max))
        res[f"packed_f32_{ww_max}x{wh_max}_ms"] = a
        res[f"packed_bf16_{ww_max}x{wh_max}_ms"] = b

    print(json.dumps(res))


if __name__ == "__main__":
    main()
