"""Triangle-mesh raytracing with a BVH — ground-truth scenes beyond analytics.

The reference accelerates ray-triangle tests with a randomized sphere-tree
(``render/BoundingVolumeHierarchy.h:24-118``), Möller–Trumbore style
intersection (``render/RaytracingPrimitives.h:57-113``) and Perlin noise
textures (``render/PerlinNoise.h``), feeding RigSimulator's synthetic
ground truth (``rig/RigSimulator.cpp:37-64``).

TPU-first redesign: the BVH is built host-side (numpy median-split AABB tree)
and flattened to arrays in preorder with an *escape pointer* per node, so
traversal is stackless — every ray carries a single node index through one
``lax.while_loop`` (AABB miss -> jump to escape, internal hit -> descend to
i+1, leaf hit -> test its fixed-width triangle block and jump to escape).
That keeps per-ray state O(1) and lets ``vmap`` run millions of rays in
lockstep with no per-ray stacks in HBM.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

LEAF_SIZE = 8  # triangles tested per leaf visit (padded, vectorized)


class TriangleMesh(NamedTuple):
    """Triangle soup: vertices (T, 3, 3) float32, per-triangle RGB (T, 3)."""

    vertices: jnp.ndarray
    colors: jnp.ndarray


class FlatBVH(NamedTuple):
    """Preorder-flattened AABB tree with escape pointers (all (N,) or (N,3)).

    ``tri_start[i] >= 0`` marks a leaf owning triangles
    ``order[tri_start[i] : tri_start[i]+LEAF_SIZE]`` (padded with -1).
    """

    box_min: jnp.ndarray
    box_max: jnp.ndarray
    escape: jnp.ndarray  # next preorder node skipping this subtree (N = done)
    tri_start: jnp.ndarray  # -1 for internal nodes
    order: jnp.ndarray  # leaf-contiguous triangle indices, -1 padding


def build_bvh(vertices: np.ndarray, leaf_size: int = LEAF_SIZE) -> FlatBVH:
    """Host-side median-split AABB build -> flat escape-pointer arrays."""
    v = np.asarray(vertices, np.float32)
    centroids = v.mean(axis=1)
    n = v.shape[0]

    box_min, box_max, escape, tri_start = [], [], [], []
    order: list[int] = []

    def emit(tris: np.ndarray) -> int:
        idx = len(box_min)
        tv = v[tris].reshape(-1, 3)
        box_min.append(tv.min(axis=0))
        box_max.append(tv.max(axis=0))
        escape.append(-1)  # patched after the subtree is emitted
        tri_start.append(-1)
        if len(tris) <= leaf_size:
            tri_start[idx] = len(order)
            order.extend(tris.tolist())
            order.extend([-1] * (leaf_size - len(tris)))
        else:
            c = centroids[tris]
            axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
            half = len(tris) // 2
            part = tris[np.argsort(c[:, axis], kind="stable")]
            emit(part[:half])
            emit(part[half:])
        escape[idx] = len(box_min)
        return idx

    emit(np.arange(n))  # median split: recursion depth is O(log n)

    return FlatBVH(
        box_min=jnp.asarray(np.stack(box_min)),
        box_max=jnp.asarray(np.stack(box_max)),
        escape=jnp.asarray(np.asarray(escape, np.int32)),
        tri_start=jnp.asarray(np.asarray(tri_start, np.int32)),
        order=jnp.asarray(np.asarray(order, np.int32)),
    )


def ray_triangle(origin, direction, v0, e1, e2, eps=1e-9):
    """Möller–Trumbore (RaytracingPrimitives.h:57-83). Batched over triangles:
    v0/e1/e2 (..., 3). Returns t with +inf misses."""
    q = jnp.cross(direction, e2)
    a = jnp.sum(e1 * q, axis=-1)
    s = origin - v0
    r = jnp.cross(s, e1)
    b0 = jnp.sum(s * q, axis=-1)
    b1 = jnp.sum(direction * r, axis=-1)
    inv_a = jnp.where(jnp.abs(a) < eps, 0.0, 1.0 / jnp.where(jnp.abs(a) < eps, 1.0, a))
    u = b0 * inv_a
    w = b1 * inv_a
    t = jnp.sum(e2 * r, axis=-1) * inv_a
    ok = (jnp.abs(a) >= eps) & (u >= 0) & (w >= 0) & (u + w <= 1) & (t > eps)
    return jnp.where(ok, t, jnp.inf)


def _ray_aabb(origin, inv_dir, bmin, bmax, t_best):
    t0 = (bmin - origin) * inv_dir
    t1 = (bmax - origin) * inv_dir
    t_near = jnp.max(jnp.minimum(t0, t1))
    t_far = jnp.min(jnp.maximum(t0, t1))
    return (t_far >= jnp.maximum(t_near, 0.0)) & (t_near < t_best)


def intersect_bvh(bvh: FlatBVH, mesh: TriangleMesh, origins, directions):
    """Closest-hit over (..., 3) ray bundles -> (t, tri_idx) with t=inf miss."""
    v = mesh.vertices
    # pad slot -1 -> degenerate triangle that never hits
    v0 = jnp.concatenate([v[:, 0], jnp.zeros((1, 3), v.dtype)])
    e1 = jnp.concatenate([v[:, 1] - v[:, 0], jnp.zeros((1, 3), v.dtype)])
    e2 = jnp.concatenate([v[:, 2] - v[:, 0], jnp.zeros((1, 3), v.dtype)])
    n_nodes = bvh.escape.shape[0]

    def one(origin, direction):
        safe = jnp.where(jnp.abs(direction) < 1e-12, 1e-12, direction)
        inv_dir = 1.0 / safe

        def cond(state):
            node, _, _ = state
            return node < n_nodes

        def body(state):
            node, t_best, tri_best = state
            hit_box = _ray_aabb(origin, inv_dir, bvh.box_min[node], bvh.box_max[node], t_best)
            start = bvh.tri_start[node]
            is_leaf = start >= 0

            def leaf_test(t_best, tri_best):
                idx = jax.lax.dynamic_slice(bvh.order, (jnp.maximum(start, 0),), (LEAF_SIZE,))
                slot = jnp.where(idx < 0, v0.shape[0] - 1, idx)
                ts = ray_triangle(origin, direction, v0[slot], e1[slot], e2[slot])
                k = jnp.argmin(ts)
                better = ts[k] < t_best
                return (
                    jnp.where(better, ts[k], t_best),
                    jnp.where(better, idx[k], tri_best),
                )

            t_best, tri_best = jax.lax.cond(
                hit_box & is_leaf, leaf_test, lambda t, i: (t, i), t_best, tri_best
            )
            descend = hit_box & ~is_leaf
            node = jnp.where(descend, node + 1, bvh.escape[node])
            return node, t_best, tri_best

        _, t, tri = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.float32(jnp.inf), jnp.int32(-1))
        )
        return t, tri

    flat_o = origins.reshape(-1, 3)
    flat_d = directions.reshape(-1, 3)
    t, tri = jax.vmap(one)(flat_o, flat_d)
    return t.reshape(directions.shape[:-1]), tri.reshape(directions.shape[:-1])


def intersect_brute(mesh: TriangleMesh, origins, directions):
    """All-triangles reference path (validates the BVH; fine for small T)."""
    v = mesh.vertices
    v0, e1, e2 = v[:, 0], v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]

    def one(origin, direction):
        ts = ray_triangle(origin[None], direction[None], v0, e1, e2)
        k = jnp.argmin(ts)
        return ts[k], jnp.where(jnp.isfinite(ts[k]), k.astype(jnp.int32), -1)

    flat_o = origins.reshape(-1, 3)
    flat_d = directions.reshape(-1, 3)
    t, tri = jax.vmap(one)(flat_o, flat_d)
    return t.reshape(directions.shape[:-1]), tri.reshape(directions.shape[:-1])


# ---- Perlin improved noise (PerlinNoise.h; Perlin 2002) ----------------------

_PERLIN_P = np.array(
    [151, 160, 137, 91, 90, 15, 131, 13, 201, 95, 96, 53, 194, 233, 7, 225, 140,
     36, 103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23, 190, 6, 148, 247, 120,
     234, 75, 0, 26, 197, 62, 94, 252, 219, 203, 117, 35, 11, 32, 57, 177, 33,
     88, 237, 149, 56, 87, 174, 20, 125, 136, 171, 168, 68, 175, 74, 165, 71,
     134, 139, 48, 27, 166, 77, 146, 158, 231, 83, 111, 229, 122, 60, 211, 133,
     230, 220, 105, 92, 41, 55, 46, 245, 40, 244, 102, 143, 54, 65, 25, 63, 161,
     1, 216, 80, 73, 209, 76, 132, 187, 208, 89, 18, 169, 200, 196, 135, 130,
     116, 188, 159, 86, 164, 100, 109, 198, 173, 186, 3, 64, 52, 217, 226, 250,
     124, 123, 5, 202, 38, 147, 118, 126, 255, 82, 85, 212, 207, 206, 59, 227,
     47, 16, 58, 17, 182, 189, 28, 42, 223, 183, 170, 213, 119, 248, 152, 2, 44,
     154, 163, 70, 221, 153, 101, 155, 167, 43, 172, 9, 129, 22, 39, 253, 19,
     98, 108, 110, 79, 113, 224, 232, 178, 185, 112, 104, 218, 246, 97, 228,
     251, 34, 242, 193, 238, 210, 144, 12, 191, 179, 162, 241, 81, 51, 145,
     235, 249, 14, 239, 107, 49, 192, 214, 31, 181, 199, 106, 157, 184, 84,
     204, 176, 115, 121, 50, 45, 127, 4, 150, 254, 138, 236, 205, 93, 222, 114,
     67, 29, 24, 72, 243, 141, 128, 195, 78, 66, 215, 61, 156, 180], np.int32)
_PERLIN_TABLE = jnp.asarray(np.concatenate([_PERLIN_P, _PERLIN_P]))


def _fade(t):
    return t * t * t * (t * (t * 6 - 15) + 10)


def _grad(h, x, y, z):
    hh = h & 15
    u = jnp.where(hh < 8, x, y)
    v = jnp.where(hh < 4, y, jnp.where((hh == 12) | (hh == 14), x, z))
    return jnp.where(hh & 1 == 0, u, -u) + jnp.where(hh & 2 == 0, v, -v)


def perlin(points: jnp.ndarray) -> jnp.ndarray:
    """Improved Perlin noise at (..., 3) points -> (...,) in ~[-1, 1]."""
    p = _PERLIN_TABLE
    xi = jnp.floor(points).astype(jnp.int32) & 255
    xf = points - jnp.floor(points)
    x, y, z = xf[..., 0], xf[..., 1], xf[..., 2]
    u, v, w = _fade(x), _fade(y), _fade(z)
    X, Y, Z = xi[..., 0], xi[..., 1], xi[..., 2]
    a = p[X] + Y
    aa, ab = p[a] + Z, p[a + 1] + Z
    b = p[X + 1] + Y
    ba, bb = p[b] + Z, p[b + 1] + Z
    lerp = lambda t, p0, p1: p0 + t * (p1 - p0)  # noqa: E731
    return lerp(
        w,
        lerp(v, lerp(u, _grad(p[aa], x, y, z), _grad(p[ba], x - 1, y, z)),
             lerp(u, _grad(p[ab], x, y - 1, z), _grad(p[bb], x - 1, y - 1, z))),
        lerp(v, lerp(u, _grad(p[aa + 1], x, y, z - 1), _grad(p[ba + 1], x - 1, y, z - 1)),
             lerp(u, _grad(p[ab + 1], x, y - 1, z - 1), _grad(p[bb + 1], x - 1, y - 1, z - 1))),
    )


def perlin_fbm(points, octaves: int = 4, lacunarity: float = 2.0, gain: float = 0.5):
    """Fractal sum of Perlin octaves -> (...,) roughly in [-1, 1]."""
    total = jnp.zeros(points.shape[:-1], points.dtype)
    amp, freq, norm = 1.0, 1.0, 0.0
    for _ in range(octaves):
        total = total + amp * perlin(points * freq)
        norm += amp
        amp *= gain
        freq *= lacunarity
    return total / norm


# ---- scene construction ------------------------------------------------------


def _quad(a, b, c, d, color):
    return [np.asarray([a, b, c], np.float32), np.asarray([a, c, d], np.float32)], [color, color]


def _box_triangles(center, half_extents, color, inward: bool):
    """12 triangles of an axis-aligned box; ``inward`` flips winding (room walls)."""
    cx, cy, cz = center
    hx, hy, hz = half_extents
    p = lambda sx, sy, sz: [cx + sx * hx, cy + sy * hy, cz + sz * hz]  # noqa: E731
    faces = [
        (p(-1, -1, -1), p(1, -1, -1), p(1, 1, -1), p(-1, 1, -1)),  # z-
        (p(-1, -1, 1), p(-1, 1, 1), p(1, 1, 1), p(1, -1, 1)),  # z+
        (p(-1, -1, -1), p(-1, 1, -1), p(-1, 1, 1), p(-1, -1, 1)),  # x-
        (p(1, -1, -1), p(1, -1, 1), p(1, 1, 1), p(1, 1, -1)),  # x+
        (p(-1, -1, -1), p(-1, -1, 1), p(1, -1, 1), p(1, -1, -1)),  # y-
        (p(-1, 1, -1), p(1, 1, -1), p(1, 1, 1), p(-1, 1, 1)),  # y+
    ]
    tris, cols = [], []
    for a, b, c, d in faces:
        if inward:
            a, b, c, d = a, d, c, b
        t, k = _quad(a, b, c, d, color)
        tris += t
        cols += k
    return tris, cols


def box_room_with_occluders(
    room_half_extents=(6.0, 6.0, 3.0), seed: int = 11, num_occluders: int = 4
) -> TriangleMesh:
    """A scene the analytic sphere/box path cannot render: an inward-facing
    textured room plus floating occluder boxes between the rig and the walls
    (depth discontinuities + occlusion, the regime RigSimulator tests)."""
    rng = np.random.RandomState(seed)
    tris, cols = _box_triangles((0.0, 0.0, 0.0), room_half_extents, (0.8, 0.75, 0.7), inward=True)
    he = np.asarray(room_half_extents)
    for i in range(num_occluders):
        # keep occluders out of a 1m rig-clearance bubble at the origin
        while True:
            c = rng.uniform(-0.55, 0.55, 3) * he
            if np.linalg.norm(c) > 1.6:
                break
        size = rng.uniform(0.3, 0.9, 3)
        color = rng.uniform(0.3, 1.0, 3)
        t, k = _box_triangles(c, size, tuple(color), inward=False)
        tris += t
        cols += k
    return TriangleMesh(
        vertices=jnp.asarray(np.stack(tris)), colors=jnp.asarray(np.asarray(cols, np.float32))
    )


def shade(mesh: TriangleMesh, hit_points, tri_idx, texture_scale: float = 1.7):
    """Per-triangle base color modulated by Perlin fbm at the hit point —
    high-frequency texture so patch matching has signal."""
    base = jnp.concatenate([mesh.colors, jnp.ones((1, 3), jnp.float32)])
    color = base[jnp.where(tri_idx < 0, mesh.colors.shape[0], tri_idx)]
    tex = 0.5 + 0.5 * perlin_fbm(hit_points * texture_scale, octaves=5)
    return jnp.clip(color * tex[..., None], 0.0, 1.0)


def render_mesh_scene(rig, size_wh, mesh: TriangleMesh, bvh: FlatBVH | None = None,
                      as_numpy: bool = True, row_chunk: int = 128):
    """Raytrace every rig camera against a triangle mesh.

    Returns (colors (N, H, W, 3), gt_disparity (N, H, W)) — RigSimulator's
    per-camera truth outputs, over arbitrary geometry.
    """
    from ..core import camera as cam
    from ..ops import sampling

    if bvh is None:
        bvh = build_bvh(np.asarray(mesh.vertices))
    w, h = int(size_wh[0]), int(size_wh[1])
    nrig = cam.normalize_rig(rig)
    cams = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float32)
        if np.asarray(a).dtype.kind == "f" else jnp.asarray(np.asarray(a)),
        nrig.cameras,
    )

    @partial(jax.jit, static_argnames=("w", "h"))
    def ray_dirs(c, w, h):
        grid = sampling.pixel_center_grid(h, w) / jnp.asarray([w, h], jnp.float32)
        return cam.ray_dir(c, grid)  # (H, W, 3)

    # TPU-first dispatch: the serial while_loop BVH traversal is the right
    # structure for CPU but hostile to the TPU's lockstep lanes (minutes for
    # a 2K x 16-cam fixture). Below a few hundred triangles, dense all-pairs
    # intersection vectorizes onto the VPU and wins by orders of magnitude.
    small = mesh.vertices.shape[0] <= 512

    @jax.jit
    def render_chunk(pos, d_chunk, bvh, mesh):
        o = jnp.broadcast_to(pos, d_chunk.shape)
        if small:
            t, tri = intersect_brute(mesh, o, d_chunk)
        else:
            t, tri = intersect_bvh(bvh, mesh, o, d_chunk)
        hit = pos + d_chunk * t[..., None]
        col = shade(mesh, hit, tri)
        return col, jnp.where(jnp.isfinite(t), 1.0 / t, jnp.nan)

    # cameras AND row chunks iterate on the host (one jit, many short device
    # calls): vmapping the camera axis batched >25 GB of traversal
    # intermediates at 2K x 16 cams, and folding all chunks into one device
    # program made it long enough to trip the TPU worker watchdog
    outs = []
    for i in range(len(nrig.ids)):
        c = jax.tree.map(lambda a: a[i], cams)
        dirs = ray_dirs(c, w, h)
        cols, disps = [], []
        for r0 in range(0, h, row_chunk):
            col, disp = render_chunk(c.position, dirs[r0:r0 + row_chunk], bvh, mesh)
            cols.append(col)
            disps.append(disp)
        outs.append((jnp.concatenate(cols, axis=0), jnp.concatenate(disps, axis=0)))
    colors = jnp.stack([o[0] for o in outs])
    disparity = jnp.stack([o[1] for o in outs])
    if as_numpy:
        return np.asarray(colors), np.asarray(disparity)
    return colors, disparity


def ground_truth_equirect_mesh(mesh: TriangleMesh, width: int, height: int,
                               bvh: FlatBVH | None = None, origin=(0.0, 0.0, 0.0)):
    """True (color, disparity) equirect from ``origin`` over a triangle mesh
    (RigSimulator's equirect truth outputs, arbitrary geometry)."""
    from . import dibr

    if bvh is None:
        bvh = build_bvh(np.asarray(mesh.vertices))
    dirs = dibr.equirect_dirs(width, height)
    o = jnp.broadcast_to(jnp.asarray(origin, jnp.float32), dirs.shape)
    t, tri = intersect_bvh(bvh, mesh, o, dirs)
    hit = o + dirs * t[..., None]
    color = shade(mesh, hit, tri)
    return np.asarray(color), np.asarray(jnp.where(jnp.isfinite(t), 1.0 / t, np.nan))
