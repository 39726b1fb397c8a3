"""Solve the reference's REAL production rig file end-to-end in CI.

bench.py config 2d runs `/root/reference/res/test/rigs/rig.json` (16 FTHETA
fisheye cameras, measured polynomial distortion, 14:9 sensors — the
reference's production fixture, util/Camera.h:32-419) at 2K on the TPU;
this test pins the same capability at CI scale on CPU: load the actual
rig file, rescale it, raytrace a ground-truth scene into its real
geometry, and run the full coarse-to-fine solve on BOTH sampler paths.

Skips when the reference checkout is absent (the rig file is the
reference's artifact; the synthetic make_ftheta_ring_rig path is covered
by tests/test_fisheye.py)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from facebook360_dep_tpu.core import camera as cam
from facebook360_dep_tpu.depth import pipeline, solver
from facebook360_dep_tpu.render import synthetic

REF_RIG = "/root/reference/res/test/rigs/rig.json"


@pytest.mark.slow
def test_real_rig_json_full_solve():
    if not os.path.exists(REF_RIG):
        pytest.skip("reference checkout not present")
    rig_full = cam.load_rig(REF_RIG)
    assert len(rig_full.ids) == 16

    # rescale the real calibration to CI size (14:9 sensors -> 168x108)
    w0, h0 = 168, 108
    rig = cam.rescale_rig(rig_full, (w0, h0))
    nrig = cam.normalize_rig(rig)
    colors0, gt = synthetic.render_sphere_scene(rig, (w0, h0), radius=5.0,
                                                as_numpy=False)

    widths = [168, 84, 42]

    def solve(use_pallas):
        disp = None
        num_levels = len(widths)
        for level in range(num_levels - 1, -1, -1):
            w = widths[level]
            h = int(round(h0 * w / w0))
            colors = colors0 if level == 0 else jax.image.resize(
                colors0, (colors0.shape[0], h, w, 3), "linear")
            fov = pipeline.generate_fov_masks(nrig, (h, w))
            ctx = solver.make_level_context(
                nrig, nrig, colors, fov, use_pallas_sampler=use_pallas,
                full_height=h0)
            cfg = solver.SolverConfig(
                min_depth=1.0, max_depth=100.0, level=level,
                num_levels=num_levels, num_random_proposals=2,
                ping_pong_iterations=1)
            init = None if disp is None else jax.image.resize(
                jnp.nan_to_num(disp, nan=1e-4), (disp.shape[0], h, w), "linear")
            disp = solver.process_level(ctx, cfg, init_disparity=init)["disparity"]
        return np.asarray(disp)

    d_ref = solve(False)
    d_pal = solve(True)
    gt_np = np.asarray(gt)
    fovm = np.asarray(pipeline.generate_fov_masks(nrig, (h0, w0)))

    # the solve fills the whole image circle of the real fisheye calibration
    for d in (d_ref, d_pal):
        assert (np.isfinite(d) & fovm).sum() / fovm.sum() > 0.99

    vc = fovm & np.isfinite(d_ref) & np.isfinite(d_pal) & np.isfinite(gt_np)
    med_ref = float(np.median(np.abs(d_ref[vc] - gt_np[vc]) / gt_np[vc]))
    med_pal = float(np.median(np.abs(d_pal[vc] - gt_np[vc]) / gt_np[vc]))
    # the 16-camera rig's dense overlap makes this geometry much easier than
    # the sparse test rings: the gather path must land in the calibrated
    # regime (bench 2d measures 0.5% median at 2K; CI scale is coarser), and
    # the TPU kernel path must not degrade it
    assert med_ref < 0.10, med_ref
    assert med_pal < 1.3 * med_ref + 0.01, (med_pal, med_ref)
