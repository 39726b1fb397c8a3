"""End-to-end depth solver tests on synthetic ground-truth scenes (the
reference's RigSimulator-style accuracy harness, SURVEY.md §4)."""

import numpy as np
import pytest

from facebook360_dep_tpu.core import camera as cam
from facebook360_dep_tpu.depth import pipeline, solver
from facebook360_dep_tpu.ops import cost
from facebook360_dep_tpu.render import synthetic

SPHERE_RADIUS = 5.0


@pytest.fixture(scope="module")
def scene():
    rig = synthetic.make_test_rig(num_cameras=4, resolution=(64, 48), ring_radius=0.3)
    colors, gt_disp = synthetic.render_sphere_scene(rig, (64, 48), radius=SPHERE_RADIUS)
    return rig, colors, gt_disp


def _context(rig, colors):
    nrig = cam.normalize_rig(rig)
    fov = pipeline.generate_fov_masks(nrig, colors.shape[1:3])
    return solver.make_level_context(nrig, nrig, colors, fov)


def test_brute_force_recovers_sphere(scene):
    rig, colors, gt_disp = scene
    ctx = _context(rig, colors)
    cfg = solver.SolverConfig(min_depth=1.0, max_depth=100.0, level=0, num_levels=1)
    disp, costs, conf = solver.brute_force_all(ctx, cfg)
    disp = np.asarray(disp)
    # interior pixels (skip patch margins)
    m = np.zeros(disp.shape, bool)
    m[:, 4:-4, 4:-4] = True
    err = np.abs(disp[m] - gt_disp[m]) / gt_disp[m]
    # median relative disparity error small; brute force is quantized to 150 probes
    assert np.median(err) < 0.05, f"median rel err {np.median(err)}"


@pytest.mark.slow
def test_process_level_full(scene):
    rig, colors, gt_disp = scene
    ctx = _context(rig, colors)
    cfg = solver.SolverConfig(
        min_depth=1.0, max_depth=100.0, level=1, num_levels=2,
        num_random_proposals=2, ping_pong_iterations=1,
    )
    # run as a refinement level seeded with a noisy ground truth
    rng = np.random.RandomState(0)
    init = gt_disp * (1.0 + 0.2 * rng.randn(*gt_disp.shape).astype(np.float32))
    out = solver.process_level(ctx, cfg, init_disparity=init)
    disp = np.asarray(out["disparity"])
    assert disp.shape == gt_disp.shape
    m = np.zeros(disp.shape, bool)
    m[:, 4:-4, 4:-4] = True
    valid = np.isfinite(disp) & m
    err = np.abs(disp[valid] - gt_disp[valid]) / gt_disp[valid]
    init_err = np.abs(init[valid] - gt_disp[valid]) / gt_disp[valid]
    assert np.median(err) < np.median(init_err), "refinement should beat the noisy init"
    assert np.median(err) < 0.05


def test_axis_only_star_refines(scene):
    """star_axis_only (the convergence-aware fine-level template) must still
    refine a near-converged init — the regime it is built for."""
    rig, colors, gt_disp = scene
    ctx = _context(rig, colors)
    cfg = solver.SolverConfig(
        min_depth=1.0, max_depth=100.0, level=0, num_levels=2,
        num_random_proposals=1, ping_pong_iterations=1, star_axis_only=True,
    )
    rng = np.random.RandomState(1)
    init = gt_disp * (1.0 + 0.1 * rng.randn(*gt_disp.shape).astype(np.float32))
    out = solver.process_level(ctx, cfg, init_disparity=init)
    disp = np.asarray(out["disparity"])
    m = np.zeros(disp.shape, bool)
    m[:, 4:-4, 4:-4] = True
    valid = np.isfinite(disp) & m
    err = np.abs(disp[valid] - gt_disp[valid]) / gt_disp[valid]
    init_err = np.abs(init[valid] - gt_disp[valid]) / gt_disp[valid]
    assert np.median(err) < np.median(init_err)
    assert np.median(err) < 0.05


def test_cost_minimized_at_ground_truth(scene):
    """The matching cost at GT disparity must undercut shifted hypotheses."""
    rig, colors, gt_disp = scene
    ctx = _context(rig, colors)
    cctx = solver._cost_ctx(ctx, 0)
    c_gt, _ = cost.cost_for_disparity(cctx, gt_disp[0])
    c_hi, _ = cost.cost_for_disparity(cctx, gt_disp[0] * 1.5)
    c_lo, _ = cost.cost_for_disparity(cctx, gt_disp[0] * 0.6)
    interior = np.zeros(c_gt.shape, bool)
    interior[8:-8, 8:-8] = True
    gt = np.asarray(c_gt)[interior]
    assert np.mean(gt < np.asarray(c_hi)[interior]) > 0.9
    assert np.mean(gt < np.asarray(c_lo)[interior]) > 0.9


def test_mismatch_handling_runs(scene):
    rig, colors, gt_disp = scene
    ctx = _context(rig, colors)
    cfg = solver.SolverConfig(min_depth=1.0, max_depth=100.0, level=0, num_levels=2,
                              mismatches_start_level=0)
    # corrupt one camera's disparity in a blob; consistency check should pull it back
    bad = gt_disp.copy()
    bad[0, 10:20, 10:20] *= 3.0
    new_disp, mask = solver.handle_mismatches(ctx, cfg, bad)
    new_disp = np.asarray(new_disp)
    mask = np.asarray(mask)
    blob_err_before = np.abs(bad[0, 12:18, 12:18] - gt_disp[0, 12:18, 12:18]).mean()
    blob_err_after = np.abs(new_disp[0, 12:18, 12:18] - gt_disp[0, 12:18, 12:18]).mean()
    assert blob_err_after < blob_err_before


def test_mismatch_pallas_path_matches_gather_path(scene):
    """The Pallas disparity-sampling branch of handle_mismatches must agree
    with the XLA gather branch (regression: the sampled stack is
    channel-planar (N, C, H, W); indexing it NHWC-style silently broke the
    branch until exercised at bench scale)."""
    rig, colors, gt_disp = scene
    nrig = cam.normalize_rig(rig)
    fov = pipeline.generate_fov_masks(nrig, colors.shape[1:3])
    ctx_g = solver.make_level_context(nrig, nrig, colors, fov)
    ctx_p = solver.make_level_context(nrig, nrig, colors, fov, use_pallas_sampler=True)
    cfg = solver.SolverConfig(min_depth=1.0, max_depth=100.0, level=0, num_levels=2,
                              mismatches_start_level=0)
    bad = gt_disp.copy()
    bad[0, 10:20, 10:20] *= 3.0
    d_g, m_g = solver.handle_mismatches(ctx_g, cfg, bad)
    d_p, m_p = solver.handle_mismatches(ctx_p, cfg, bad)
    d_g, d_p = np.asarray(d_g), np.asarray(d_p)
    m_g, m_p = np.asarray(m_g), np.asarray(m_p)
    # the paths differ only at src-FOV-edge pixels (windowed sampler flags
    # them invalid); interior replacements must match
    inner = np.zeros(m_g.shape, bool)
    inner[:, 4:-4, 4:-4] = True
    assert (m_g == m_p)[inner].mean() > 0.98
    agree = inner & (m_g == m_p)
    np.testing.assert_allclose(d_p[agree], d_g[agree], rtol=2e-2, atol=1e-4)


def test_fov_masks_shape(scene):
    rig, colors, _ = scene
    nrig = cam.normalize_rig(rig)
    fov = pipeline.generate_fov_masks(nrig, colors.shape[1:3])
    assert fov.shape == (4, 48, 64)
    # rectilinear default fov -> everything inside
    assert bool(np.all(np.asarray(fov)))
