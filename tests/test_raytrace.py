"""BVH raytracer: traversal vs brute force, Perlin noise, mesh scenes
(reference: render/BoundingVolumeHierarchy.h, RaytracingPrimitives.h,
PerlinNoise.h, rig/RigSimulator.cpp)."""

import numpy as np
import pytest

import jax.numpy as jnp

from facebook360_dep_tpu.render import raytrace, synthetic


def _random_soup(n=200, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-5, 5, (n, 1, 3))
    verts = centers + rng.uniform(-0.6, 0.6, (n, 3, 3))
    colors = rng.rand(n, 3).astype(np.float32)
    return raytrace.TriangleMesh(
        vertices=jnp.asarray(verts.astype(np.float32)), colors=jnp.asarray(colors)
    )


def test_bvh_matches_brute_force():
    """Closest hit from the stackless BVH == all-triangles reference, for
    rays from inside a random soup (hits and misses)."""
    mesh = _random_soup(n=300)
    rng = np.random.RandomState(1)
    dirs = rng.randn(500, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.zeros_like(dirs)
    bvh = raytrace.build_bvh(np.asarray(mesh.vertices))
    t_b, tri_b = raytrace.intersect_bvh(bvh, mesh, jnp.asarray(origins), jnp.asarray(dirs))
    t_r, tri_r = raytrace.intersect_brute(mesh, jnp.asarray(origins), jnp.asarray(dirs))
    t_b, t_r = np.asarray(t_b), np.asarray(t_r)
    hit_b, hit_r = np.isfinite(t_b), np.isfinite(t_r)
    assert np.array_equal(hit_b, hit_r)
    assert hit_b.any() and (~hit_b).any()  # exercise both branches
    np.testing.assert_allclose(t_b[hit_b], t_r[hit_r], rtol=1e-5)
    # where two triangles tie exactly, index may differ; distances decide
    same = np.asarray(tri_b)[hit_b] == np.asarray(tri_r)[hit_r]
    assert same.mean() > 0.99


def test_bvh_flat_layout_invariants():
    mesh = _random_soup(n=100)
    bvh = raytrace.build_bvh(np.asarray(mesh.vertices))
    n = int(bvh.escape.shape[0])
    escape = np.asarray(bvh.escape)
    tri_start = np.asarray(bvh.tri_start)
    order = np.asarray(bvh.order)
    assert escape[0] == n  # root escape = done
    assert (escape > np.arange(n)).all()  # escape always advances
    leaf_tris = order[order >= 0]
    assert sorted(leaf_tris.tolist()) == list(range(100))  # every tri in one leaf
    assert ((tri_start >= 0) | (escape > np.arange(n) + 1)).all()  # internals have children


def test_perlin_range_and_determinism():
    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.uniform(-10, 10, (1000, 3)).astype(np.float32))
    n1 = np.asarray(raytrace.perlin(pts))
    n2 = np.asarray(raytrace.perlin(pts))
    assert np.array_equal(n1, n2)
    assert np.abs(n1).max() <= 1.1 and n1.std() > 0.05
    # zero at lattice points (classic Perlin property)
    lattice = jnp.asarray(np.mgrid[0:3, 0:3, 0:3].reshape(3, -1).T.astype(np.float32))
    np.testing.assert_allclose(np.asarray(raytrace.perlin(lattice)), 0.0, atol=1e-6)
    fbm = np.asarray(raytrace.perlin_fbm(pts, octaves=3))
    assert np.abs(fbm).max() <= 1.1


def test_box_room_scene_renders():
    """Rig cameras inside the occluder room: every pixel hits geometry,
    occluders produce nearer depth than the walls behind them."""
    rig = synthetic.make_test_rig(num_cameras=2, resolution=(40, 30), ring_radius=0.2)
    mesh = raytrace.box_room_with_occluders(num_occluders=3)
    colors, disp = raytrace.render_mesh_scene(rig, (40, 30), mesh, row_chunk=16)
    assert colors.shape == (2, 30, 40, 3) and disp.shape == (2, 30, 40)
    assert np.isfinite(disp).all()  # closed room: no escaped rays
    assert colors.min() >= 0 and colors.max() <= 1
    # walls are <= 6*sqrt(3) m away -> disparity above the far bound
    assert disp.min() > 1.0 / 12.0
    # depth range must exceed the empty room's (occluders are closer)
    room_only = raytrace.box_room_with_occluders(num_occluders=0)
    _, disp_room = raytrace.render_mesh_scene(rig, (40, 30), room_only, row_chunk=16)
    assert disp.max() > disp_room.max() * 1.3


def test_equirect_truth_over_mesh():
    mesh = raytrace.box_room_with_occluders(num_occluders=2)
    color, disp = raytrace.ground_truth_equirect_mesh(mesh, 64, 32)
    assert color.shape == (32, 64, 3) and disp.shape == (32, 64)
    assert np.isfinite(disp).all()
