"""cost.auto_window: rig-derived sampler window sizing (VERDICT r3 #5).

A rig whose warp sustains high magnification — a wide-FOV destination with
narrow sources, outward rings near shared FOV edges, fisheye azimuthal
stretch — exceeds the sampler's default 256x40 window; before this, such
rigs needed a manual ww_max or silently kept carried disparities wherever
samples clipped. auto_window measures the per-tile source-coordinate SPAN
(the exact quantity the kernel's span-centered window must cover) at the
sweep extremes and sizes the window; SolverConfig.ww_max/wh_max thread it
to the kernels.

These tests are FUNCTIONAL: they assert the returned window removes the
kernel's clipping on rigs where the default window measurably clips, not
any particular window value (the span measure is resolution-dependent by
design — the same rig legitimately needs a larger window at full
resolution than at a coarse pyramid level).
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np

from facebook360_dep_tpu.core import camera as cam
from facebook360_dep_tpu.depth import pipeline, solver
from facebook360_dep_tpu.ops import cost as cost_ops
from facebook360_dep_tpu.ops import warp_pallas
from facebook360_dep_tpu.render import synthetic


def _high_mag_rig(w=128, h=96, dst_focal=0.18, src_focal=0.6):
    """dst cam 0 has a wide FOV (small focal), sources narrow: 24 dst rows
    span ~ 24 * src_focal/dst_focal source rows — far beyond the default
    window's 40."""
    cams, ids = [], []
    for i, f in enumerate([dst_focal, src_focal, src_focal, src_focal]):
        cams.append(cam.make_camera(
            type_code=cam.RECTILINEAR, position=[0.03 * i, 0.0, 0.0],
            rotation=np.eye(3), resolution=[w, h], focal=[f * w, -f * w],
        ))
        ids.append(f"cam{i}")
    return cam.normalize_rig(
        cam.Rig(cameras=cam.stack_cameras(cams), ids=tuple(ids), groups=("",) * 4)
    )


def _clip_rate(nrig, colors, gt, di, ww_max, wh_max):
    """Fraction of kernel-visible samples the (ww_max, wh_max) window clips,
    excluding the destination camera itself."""
    f32 = lambda a: jnp.asarray(a, jnp.float32) if jnp.asarray(a).dtype.kind == "f" else jnp.asarray(a)  # noqa: E731
    cams = jax.tree.map(f32, nrig.cameras)
    cdst = jax.tree.map(lambda a: a[di], cams)
    h, w = colors.shape[1:3]
    stack = cost_ops.quantize_src(warp_pallas.planar_for_sampling(colors[..., :3]))
    params = warp_pallas.pack_camera_params_traced(cams)
    rays_planar = jnp.moveaxis(cost_ops.dst_ray_dirs(cdst, h, w), -1, 0)
    dm = jnp.nan_to_num(jnp.asarray(gt[di]), nan=1e-4)
    _, valid, clipped = warp_pallas.project_sample_planar_v4(
        stack, params, cdst.position, dm, rays_planar,
        interpret=True, src_exact_bf16=True, ww_max=ww_max, wh_max=wh_max,
    )
    keep = np.arange(stack.shape[0]) != di
    clipped = np.asarray(clipped[keep])
    visible = np.asarray(valid[keep]) + clipped
    return float(clipped.sum() / max(visible.sum(), 1))


def test_forward_rig_keeps_tuned_defaults():
    nrig = cam.normalize_rig(
        synthetic.make_test_rig(4, resolution=(128, 96), ring_radius=0.3)
    )
    ww, wh = cost_ops.auto_window(
        nrig.cameras, nrig.cameras, (96, 128), min_depth=1.0, max_depth=100.0
    )
    assert (ww, wh) == (256, 40)


def test_outward_ring_window_removes_clipping():
    # rectilinear tan() stretch near the shared FOV edges of adjacent
    # outward cameras: sustained magnification the default window clips
    nrig = cam.normalize_rig(
        synthetic.make_outward_ring_rig(8, resolution=(128, 96), ring_radius=0.3)
    )
    ww, wh = cost_ops.auto_window(
        nrig.cameras, nrig.cameras, (96, 128), min_depth=1.0, max_depth=100.0
    )
    assert wh > 40, (ww, wh)

    colors, gt = synthetic.render_sphere_scene(nrig, (128, 96), radius=5.0,
                                               as_numpy=False)
    rate_default = _clip_rate(nrig, colors, gt, 0, None, None)
    rate_auto = _clip_rate(nrig, colors, gt, 0, ww, wh)
    assert rate_default > 5e-3, rate_default  # the failure mode is real
    assert rate_auto < 1e-3, (rate_auto, (ww, wh))


def test_high_mag_rig_window_removes_clipping_with_quality_parity():
    w, h = 128, 96
    nrig = _high_mag_rig(w, h)
    dst = cam.Rig(
        cameras=jax.tree.map(lambda a: a[:1], nrig.cameras),
        ids=nrig.ids[:1], groups=nrig.groups[:1],
    )
    ww, wh = cost_ops.auto_window(
        nrig.cameras, dst.cameras, (h, w), min_depth=1.0, max_depth=100.0
    )
    # x is covered by any window (the source is only 128 px wide); the 3.3x
    # magnification bites in y, where tiles are 24 rows tall
    assert wh > 40, (ww, wh)

    colors, gt = synthetic.render_sphere_scene(nrig, (w, h), radius=5.0,
                                               as_numpy=False)
    rate_default = _clip_rate(nrig, colors, gt, 0, None, None)
    rate_auto = _clip_rate(nrig, colors, gt, 0, ww, wh)
    assert rate_default > 0.1, rate_default  # the failure mode is real
    assert rate_auto < 1e-3, (rate_auto, (ww, wh))

    # quality parity: with the auto window the Pallas cost path agrees with
    # the XLA gather path (same contract as test_solver_cost_matches_gather_path)
    fov = pipeline.generate_fov_masks(dst, (h, w))
    ctx_ref = solver.make_level_context(nrig, dst, colors, fov)
    ctx_pal = solver.make_level_context(nrig, dst, colors, fov, use_pallas_sampler=True)
    cfg = solver.SolverConfig(
        min_depth=1.0, max_depth=100.0, level=1, num_levels=2, ww_max=ww, wh_max=wh
    )
    d_ref, _, _ = solver.brute_force_all(ctx_ref, cfg._replace(ww_max=None, wh_max=None))
    d_pal, _, _ = solver.brute_force_all(ctx_pal, cfg)
    d_ref, d_pal = np.asarray(d_ref), np.asarray(d_pal)
    ok = np.isfinite(d_ref) & np.isfinite(d_pal)
    assert ok.mean() > 0.5
    same = np.abs(d_pal[ok] - d_ref[ok]) <= 1e-6 + 0.02 * np.abs(d_ref[ok])
    assert same.mean() > 0.8, same.mean()


def test_cap_warning_makes_extreme_rigs_diagnosable(caplog):
    # at full resolution the high-mag rig's y span exceeds the hardware cap:
    # the window must cap (not grow unboundedly) and WARN so the silent
    # coverage degradation auto_window exists to fix stays diagnosable
    nrig = _high_mag_rig(512, 384, dst_focal=0.12)
    dst = cam.Rig(
        cameras=jax.tree.map(lambda a: a[:1], nrig.cameras),
        ids=nrig.ids[:1], groups=nrig.groups[:1],
    )
    with caplog.at_level(logging.WARNING, logger="facebook360_dep_tpu.ops.cost"):
        ww, wh = cost_ops.auto_window(
            nrig.cameras, dst.cameras, (384, 512), min_depth=1.0, max_depth=100.0
        )
    ay = 16 if cost_ops.stack_dtype() == jnp.bfloat16 else 8
    assert (ww, wh) == (512, -(-cost_ops.WH_CAP // ay) * ay), (ww, wh)
    assert any("exceeds cap" in r.getMessage() for r in caplog.records)
