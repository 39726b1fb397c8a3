"""Attribute the per-eval cost of the depth solver on the real TPU.

Measures (a) Pallas per-grid-step overhead with a trivial copy kernel at
several grid sizes, (b) one full cost_for_disparity eval at 2K/16-src and
its ablations. Memoization-proof: inputs vary per call; completion forced
via scalar readback. Subtract the ~26 ms tunnel roundtrip from all numbers.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def timeit(fn, n=5, warmup=2):
    for i in range(warmup):
        float(fn(1000 + i))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(fn(i))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(np.min(ts))


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 1.0001


def probe_grid_steps():
    # one (256,256) f32 tile per step; grid sizes spanning 256..16384 steps
    for steps in (256, 1024, 4096, 16384):
        rows = steps * 256

        @jax.jit
        def f(i, rows=rows, steps=steps):
            x = jnp.full((rows, 256), jnp.float32(i))
            y = pl.pallas_call(
                copy_kernel,
                grid=(steps,),
                in_specs=[pl.BlockSpec((256, 256), lambda s: (s, 0))],
                out_specs=pl.BlockSpec((256, 256), lambda s: (s, 0)),
                out_shape=jax.ShapeDtypeStruct((rows, 256), jnp.float32),
            )(x)
            return y.sum()

        mb = rows * 256 * 4 / 1e6
        med, mn = timeit(f, n=4)
        print(
            f"pallas copy grid={steps:6d} ({mb:6.0f} MB): median {med*1e3:8.2f} ms  min {mn*1e3:8.2f} ms"
            f"  -> {mn/steps*1e6:7.2f} us/step (incl ~26ms floor)",
            flush=True,
        )


def probe_eval():
    from facebook360_dep_tpu.core import camera as cam
    from facebook360_dep_tpu.depth import pipeline, solver
    from facebook360_dep_tpu.ops import cost as cost_ops
    from facebook360_dep_tpu.ops import warp_pallas
    from facebook360_dep_tpu.render import synthetic

    W, H = 2048, 1536
    N = 16
    rig = synthetic.make_test_rig(num_cameras=N, resolution=(W, H), ring_radius=0.3)
    nrig = cam.normalize_rig(rig)
    colors, gt = synthetic.render_sphere_scene(rig, (W, H), radius=5.0, as_numpy=False)
    fov = pipeline.generate_fov_masks(nrig, (H, W))
    ctx = solver.make_level_context(nrig, nrig, colors, fov, use_pallas_sampler=True)
    cctx = solver._cost_ctx(ctx, jnp.int32(0))
    cctx = jax.tree.map(jax.block_until_ready, cctx)
    print("fixtures ready", flush=True)

    base_disp = jnp.asarray(gt[0])

    # (a) full eval: cost_for_disparity (cctx passed as arg: closed-over
    # device arrays would ship as constants in the remote-compile request)
    @jax.jit
    def f_full_j(cctx, base_disp, i):
        d = base_disp * (1.0 + 1e-4 * i)
        c, _ = cost_ops.cost_for_disparity(cctx, d)
        return jnp.nansum(jnp.where(jnp.isfinite(c), c, 0.0))

    med, mn = timeit(lambda i: f_full_j(cctx, base_disp, i), n=5)
    print(f"full eval (pallas sampler): median {med*1e3:.1f} ms  min {mn*1e3:.1f} ms", flush=True)

    # (b) sampler only: project_sample_planar
    rays_planar = jnp.moveaxis(cctx.dst_rays, -1, 0)
    params = warp_pallas.pack_camera_params_traced(cctx.src_cams)
    params = jax.tree.map(jax.block_until_ready, params)

    @jax.jit
    def f_sample_j(imgs_t, params, pos, base_disp, rays_planar, i):
        d = base_disp * (1.0 + 1e-4 * i)
        sampled, k_valid = warp_pallas.project_sample_planar(imgs_t, params, pos, d, rays_planar)
        return sampled.astype(jnp.float32).sum() + k_valid.sum()

    med, mn = timeit(
        lambda i: f_sample_j(cctx.src_imgs_t, params, cctx.cam_dst.position, base_disp, rays_planar, i),
        n=5,
    )
    print(f"sampler only: median {med*1e3:.1f} ms  min {mn*1e3:.1f} ms", flush=True)

    # (c) SSD+combine only (on a precomputed sampled stack)
    sampled, k_valid = jax.block_until_ready(
        warp_pallas.project_sample_planar(
            cctx.src_imgs_t, params, cctx.cam_dst.position, base_disp, rays_planar
        )
    )

    @jax.jit
    def f_ssd_j(dst_img, sampled, k_valid, variance, i):
        s = sampled * (1.0 + 1e-6 * i).astype(sampled.dtype)
        biased, unbiased, valid = cost_ops.ssd_planar(dst_img, s, k_valid > 0.5)
        c, _ = cost_ops.combine_top2(biased, unbiased, valid, variance)
        return jnp.nansum(jnp.where(jnp.isfinite(c), c, 0.0))

    med, mn = timeit(lambda i: f_ssd_j(cctx.dst_img, sampled, k_valid, cctx.variance, i), n=5)
    print(f"ssd+combine only: median {med*1e3:.1f} ms  min {mn*1e3:.1f} ms", flush=True)

    # (d) XLA coords only (no pallas)
    @jax.jit
    def f_coords_j(cctx, base_disp, i):
        d = base_disp * (1.0 + 1e-4 * i)

        def one(cam_src):
            return cost_ops.reproject_rays(
                cctx.cam_dst.position, cctx.dst_rays, cam_src, d, (H, W)
            )[0]

        coords = jax.vmap(one)(cctx.src_cams)
        return jnp.nansum(coords)

    med, mn = timeit(lambda i: f_coords_j(cctx, base_disp, i), n=5)
    print(f"XLA coords only: median {med*1e3:.1f} ms  min {mn*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    probe_grid_steps()
    probe_eval()
