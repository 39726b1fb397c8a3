"""cost.auto_window: rig-derived sampler window sizing (VERDICT r3 #5).

A rig whose destination FOV is much wider than a source's (high warp
magnification) exceeds the sampler's default 256x40 window; before this,
such rigs needed a manual ww_max=384 or silently kept carried disparities
wherever samples clipped. auto_window measures the warp Jacobian per level
and sizes the window; SolverConfig.ww_max/wh_max thread it to the kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np

from facebook360_dep_tpu.core import camera as cam
from facebook360_dep_tpu.depth import pipeline, solver
from facebook360_dep_tpu.ops import cost as cost_ops
from facebook360_dep_tpu.ops import warp_pallas
from facebook360_dep_tpu.render import synthetic


def _high_mag_rig(w=128, h=96, dst_focal=0.18, src_focal=0.6):
    """dst cam 0 has a wide FOV (small focal), sources narrow: 128 dst px
    span ~ 128 * src_focal/dst_focal source px — far beyond the default
    window."""
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


def test_forward_rig_keeps_tuned_defaults():
    nrig = cam.normalize_rig(
        synthetic.make_test_rig(4, resolution=(128, 96), ring_radius=0.3)
    )
    ww, wh = cost_ops.auto_window(
        nrig.cameras, nrig.cameras, (96, 128), min_depth=1.0, max_depth=100.0
    )
    assert (ww, wh) == (256, 40)


def test_outward_ring_gets_rotation_stretch_window():
    # rectilinear tan() stretch near the shared FOV edges of adjacent
    # outward cameras: p99.5 Jacobian ~1.9 in x / ~1.6 in y (measured) —
    # sustained magnification the default window clips
    nrig = cam.normalize_rig(
        synthetic.make_outward_ring_rig(8, resolution=(128, 96), ring_radius=0.3)
    )
    ww, wh = cost_ops.auto_window(
        nrig.cameras, nrig.cameras, (96, 128), min_depth=1.0, max_depth=100.0
    )
    assert ww == 384, ww
    assert wh > 40, wh


def test_high_mag_rig_gets_enlarged_window_and_clip_free_coverage():
    w, h = 128, 96
    nrig = _high_mag_rig(w, h)
    dst = cam.Rig(
        cameras=jax.tree.map(lambda a: a[:1], nrig.cameras),
        ids=nrig.ids[:1], groups=nrig.groups[:1],
    )
    ww, wh = cost_ops.auto_window(
        nrig.cameras, dst.cameras, (h, w), min_depth=1.0, max_depth=100.0
    )
    assert ww >= 512, ww  # mag ~3.3 -> needs far more than 256

    # render a scene with the rig and measure actual clip rates
    rig_px = _high_mag_rig(w, h)  # normalized == pixel behavior for sampling
    colors, gt = synthetic.render_sphere_scene(
        cam.Rig(
            cameras=jax.tree.map(
                lambda a: a * 1.0, nrig.cameras  # normalized rig renders fine
            ),
            ids=nrig.ids, groups=nrig.groups,
        ),
        (w, h), radius=5.0, as_numpy=False,
    )
    stack = cost_ops.quantize_src(warp_pallas.planar_for_sampling(colors[..., :3]))
    f32 = lambda a: jnp.asarray(a, jnp.float32) if jnp.asarray(a).dtype.kind == "f" else jnp.asarray(a)  # noqa: E731
    cams = jax.tree.map(f32, nrig.cameras)
    cam0 = jax.tree.map(lambda a: a[0], cams)
    params = warp_pallas.pack_camera_params_traced(cams)
    rays_planar = jnp.moveaxis(cost_ops.dst_ray_dirs(cam0, h, w), -1, 0)
    dm = jnp.nan_to_num(jnp.asarray(gt[0]), nan=1e-4)

    def clip_rate(ww_max, wh_max):
        _, valid, clipped = warp_pallas.project_sample_planar_v4(
            stack, params, cam0.position, dm, rays_planar,
            interpret=True, src_exact_bf16=True, ww_max=ww_max, wh_max=wh_max,
        )
        clipped = np.asarray(clipped[1:])  # sources only (dst sees itself)
        visible = np.asarray(valid[1:]) + clipped
        return float(clipped.sum() / max(visible.sum(), 1))

    rate_default = clip_rate(None, None)
    rate_auto = clip_rate(ww, wh)
    assert rate_default > 0.1, rate_default  # the failure mode is real
    assert rate_auto < 1e-3, rate_auto      # and the auto window removes it

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
