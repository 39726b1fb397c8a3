"""Tests for stream/adaptive.py — the tiled-LOD publish pre-decimation.

Contracts: (1) the LOD mesh is crack-free (every internal edge is shared by
exactly 2 triangles with opposite orientation, tears/borders excepted);
(2) the piecewise-linear surface reproduces the input grid within the
relative tolerance on smooth regions; (3) tiles containing tears emit
EXACTLY the reference full-resolution torn triangulation (mesh.get_faces
semantics); (4) face-count reduction is large on smooth content.
"""

import numpy as np
import pytest

from facebook360_dep_tpu.stream import adaptive, mesh


def _edge_counts(faces: np.ndarray):
    """dict edge(sorted pair) -> [forward_count, backward_count]."""
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], 0)
    lo = e.min(1)
    hi = e.max(1)
    fwd = e[:, 0] == lo
    key = lo.astype(np.int64) * (1 << 32) + hi.astype(np.int64)
    return key, fwd


def assert_watertight(faces: np.ndarray, z: np.ndarray, w: int):
    """Every edge appears at most twice, and when twice, once per direction
    (manifold, consistently wound). Boundary edges (image border, tears)
    appear once."""
    key, fwd = _edge_counts(faces)
    order = np.argsort(key, kind="stable")
    key, fwd = key[order], fwd[order]
    uniq, start = np.unique(key, return_index=True)
    counts = np.diff(np.append(start, len(key)))
    assert counts.max() <= 2, "non-manifold edge (shared by >2 triangles)"
    # where count == 2: one forward + one backward (opposite winding)
    two = counts == 2
    idx = start[two]
    same_dir = fwd[idx] == fwd[idx + 1]
    assert not same_dir.any(), "inconsistent winding on a shared edge"

    # T-junction cracks: a count-1 (boundary) edge with an interior lattice
    # vertex that some face uses means the finer side subdivided the edge
    # but the coarser side did not
    used = np.zeros(z.size, bool)
    used[faces.reshape(-1)] = True
    one = counts == 1
    k1 = uniq[one]
    a, b = k1 >> 32, k1 & ((1 << 32) - 1)
    ay, ax = a // w, a % w
    by, bx = b // w, b % w
    n_seg = np.maximum(np.abs(by - ay), np.abs(bx - ax)).astype(np.int64)
    for i in np.flatnonzero(n_seg > 1):
        n = n_seg[i]
        g = np.gcd(int(by[i] - ay[i]), int(bx[i] - ax[i]))
        if g <= 1:
            continue
        sy = (by[i] - ay[i]) // g
        sx = (bx[i] - ax[i]) // g
        for t in range(1, g):
            vid = (ay[i] + t * sy) * w + (ax[i] + t * sx)
            assert not used[vid], f"T-junction crack at vertex {vid}"


def smooth_z(h, w, scale=100.0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return scale * (1.0 + 0.3 * np.sin(xx / w * 3.0) * np.cos(yy / h * 2.0))


def test_smooth_surface_coarsens_and_bounds_error():
    h, w = 129, 193  # complete 16-tiles: 8 x 12
    z = smooth_z(h, w)
    valid = np.ones((h, w), bool)
    faces = adaptive.build_adaptive_faces(z, valid, tol_rel=2e-4)
    full = 2 * (h - 1) * (w - 1)
    assert len(faces) < full / 4, f"only {full / len(faces):.1f}x reduction"
    assert_watertight(faces, z, w)

    # error bound: rasterize the PL surface at every grid vertex is
    # expensive; instead check at cell interiors via barycentric eval on a
    # sample of triangles' centroids against bilinear ground truth
    vy, vx = np.divmod(faces.astype(np.int64), w)
    cz = z[vy, vx]  # (F, 3) corner heights
    cy = vy.mean(1)
    cx = vx.mean(1)
    approx = cz.mean(1)
    # true z at centroid via bilinear interp of the grid
    y0, x0 = np.floor(cy).astype(int), np.floor(cx).astype(int)
    y0 = np.clip(y0, 0, h - 2)
    x0 = np.clip(x0, 0, w - 2)
    fy, fx = cy - y0, cx - x0
    true = (
        z[y0, x0] * (1 - fy) * (1 - fx)
        + z[y0, x0 + 1] * (1 - fy) * fx
        + z[y0 + 1, x0] * fy * (1 - fx)
        + z[y0 + 1, x0 + 1] * fy * fx
    )
    rel = np.abs(approx - true) / np.abs(true)
    # PL-vs-bilinear at centroids stays within a small multiple of tol_rel
    assert np.percentile(rel, 99.9) < 1e-3, rel.max()


def test_tear_region_matches_reference_triangulation():
    h, w = 65, 65
    z = smooth_z(h, w)
    z[: h // 2] *= 3.0  # hard tear through the middle
    valid = np.ones((h, w), bool)
    faces = adaptive.build_adaptive_faces(z, valid, tear_ratio=0.95)
    assert_watertight(faces, z, w)

    # the reference full-res triangulation of the torn band
    vertexes = np.stack(
        [*np.meshgrid(np.arange(w, dtype=float), np.arange(h, dtype=float))[::-1], z], -1
    ).reshape(-1, 3)[:, [1, 0, 2]]
    ref_faces = mesh.get_faces(
        np.concatenate(
            [np.zeros((h * w, 2)), z.reshape(-1, 1)], 1
        ),
        w, h, tear_ratio=0.95,
    )
    # quads on the tear rows: adaptive emits the identical triangle set
    tear_row = h // 2 - 1  # quad row crossing the jump
    def faces_in_rows(f, rows):
        vy = (f // w)
        return f[np.isin(vy.min(1), rows)]

    # only faces whose top row is in the fine tile band around the tear;
    # the tile below the jump is smooth and may legitimately coarsen
    rows = np.arange(tear_row - 1, tear_row + 1)
    got = faces_in_rows(faces.astype(np.int64), rows)
    want = faces_in_rows(ref_faces.astype(np.int64), rows)
    got_set = {tuple(t) for t in got}
    want_set = {tuple(t) for t in want}
    assert want_set == got_set


def test_nan_and_mask_force_fine_and_drop():
    h, w = 65, 97
    z = smooth_z(h, w)
    valid = np.ones((h, w), bool)
    z[20, 30] = np.nan
    valid[40:44, 60:70] = False
    faces = adaptive.build_adaptive_faces(z, valid)
    vy, vx = np.divmod(faces.astype(np.int64), w)
    # no face touches an invalid vertex
    assert np.isfinite(z[vy, vx]).all()
    ok = valid[vy, vx]
    assert ok.all()
    assert_watertight(faces, z, w)


def test_partial_tiles_at_borders():
    # sizes NOT multiples of 16(+1): partial strips must emit fine quads
    h, w = 50, 75
    z = smooth_z(h, w)
    faces = adaptive.build_adaptive_faces(z, np.ones((h, w), bool))
    assert_watertight(faces, z, w)
    vy, vx = np.divmod(faces.astype(np.int64), w)
    assert vy.max() == h - 1 and vx.max() == w - 1  # full coverage reach


def test_all_fine_matches_get_faces_exactly():
    h, w = 33, 33
    rng = np.random.default_rng(1)
    z = 100 + 30 * rng.random((h, w)).astype(np.float32)  # noise: all torn/fine
    faces = adaptive.build_adaptive_faces(z, np.ones((h, w), bool), tear_ratio=0.95)
    ref = mesh.get_faces(
        np.concatenate([np.zeros((h * w, 2)), z.reshape(-1, 1)], 1), w, h,
        tear_ratio=0.95,
    )
    assert {tuple(t) for t in faces.tolist()} == {tuple(t) for t in ref.tolist()}


def test_mixed_lod_levels_stitch_watertight():
    """Curvature gradient forcing several coexisting steps: the step map
    must actually mix levels and every LOD transition must stitch."""
    h, w = 161, 161  # 10 x 10 complete tiles
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # amplitude grows left to right: leftmost tiles flat (s=16),
    # rightmost tiles wavy (fine steps); curvature error ~ A * s^2 so the
    # passing step shrinks smoothly across the image
    amp = np.geomspace(1e-4, 3.0, w)[None, :]
    z = 100.0 + amp * np.sin(xx / 5.0) * np.cos(yy / 5.0)
    valid = np.ones((h, w), bool)
    step = adaptive.compute_step_map(z, valid, 0.95, 2e-4)
    assert len(np.unique(step)) >= 3, f"want mixed steps, got {np.unique(step)}"
    faces = adaptive.build_adaptive_faces(z, valid, tol_rel=2e-4)
    assert_watertight(faces, z, w)
    # full surface coverage: emitted triangle area equals the grid area
    # minus nothing (no holes on an all-valid smooth-ish grid)
    vy, vx = np.divmod(faces.astype(np.int64), w)
    area2 = np.abs(
        (vx[:, 1] - vx[:, 0]) * (vy[:, 2] - vy[:, 0])
        - (vy[:, 1] - vy[:, 0]) * (vx[:, 2] - vx[:, 0])
    )
    assert area2.sum() == 2 * (h - 1) * (w - 1)


def test_convert_depth_adaptive_end_to_end_quality():
    """Publish convert_depth with adaptive=True: the simplified mesh's
    z-surface stays close to the input (same check shape as the viewer
    cross-check), and face budget is respected."""
    from facebook360_dep_tpu.cli.convert_to_binary import convert_depth
    from facebook360_dep_tpu.core import camera as cam

    h, w = 257, 257
    z = smooth_z(h, w, scale=0.2)
    disparity = z / (w / 2.0)  # z = focal * disparity with focal = w/2
    camera = cam.make_camera(
        type_code=cam.RECTILINEAR,
        position=np.zeros(3), rotation=np.eye(3),
        resolution=[float(w), float(h)], focal=[w / 2.0, w / 2.0],
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        v, f = convert_depth(camera, "cam0", disparity, tmp, triangles=5000)
    assert len(f) <= 5000 * 1.0 + 1
    assert len(v) > 100


def test_native_builder_matches_numpy_spec():
    """The native single-pass builder (_native/adaptive_native.cpp, the
    production publish path) must emit the exact same face SET as the
    vectorized-numpy executable spec (build_adaptive_faces_numpy) — step
    decisions, tear triangulation, plain-quad diagonals, and LOD-transition
    fans included — across smooth, noisy/NaN, mixed-LOD, and sub-tile
    grids."""
    from facebook360_dep_tpu.stream import native

    rng = np.random.default_rng(7)
    cases = []
    h, w = 400, 520  # smooth + tear band (the publish profile shape)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    z = 1000.0 * (0.05 + 0.3 / (1.0 + ((xx - w / 2) ** 2 + (yy - h / 2) ** 2) / (w / 4) ** 2))
    z[h // 3: h // 3 + 10] *= 2.0
    cases.append((z, np.ones((h, w), bool)))

    h, w = 213, 339  # ragged size, noise, NaN holes
    cases.append((500 + 50 * rng.standard_normal((h, w)).astype(np.float32),
                  rng.random((h, w)) > 0.02))

    h, w = 257, 385  # piecewise smooth: mixed steps + a mask hole + tear line
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    z = 300 + yy * 0.1 + np.sin(xx / 40) * 2
    z[:, 200:] += 100
    valid = np.ones((h, w), bool)
    valid[10:20, 10:30] = False
    cases.append((z.astype(np.float32), valid))

    cases.append((100 + rng.random((14, 15)).astype(np.float32),
                  np.ones((14, 15), bool)))  # below one tile

    for z, valid in cases:
        for tol in (2e-4, 1e-3):  # legacy-tight and the solver-noise default
            f_np = adaptive.build_adaptive_faces_numpy(z, valid, tol_rel=tol)
            zf = np.where(valid, z, np.nan).astype(np.float32)
            f_cc, step = native.build_adaptive_faces(zf, 0.95, tol, want_step=True)
            a = f_np[np.lexsort(f_np.T[::-1])]
            b = f_cc[np.lexsort(f_cc.T[::-1])]
            assert a.shape == b.shape, (z.shape, tol, a.shape, b.shape)
            assert np.array_equal(a, b), (z.shape, tol)
        # the dispatcher must route to the native path (both at the default)
        f_disp = adaptive.build_adaptive_faces(z, valid)
        assert np.array_equal(f_disp, f_cc), z.shape
