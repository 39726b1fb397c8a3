"""Disparity-to-mesh conversion and the .vtx/.idx binary contract.

Reference: ``render/MeshUtil.h`` — equi-error vertex grids
(getVertexesEquiError, :317-341), depth-tear triangle masks
(getTriangleMask/getFaces, :170-296), masked vertex/face removal, and the
row-major float32/uint32 .vtx/.idx files (writeDepth, :72-88) the 6DoF
streaming viewers read. The per-quad scalar loops become vectorized numpy
over all quads at once.
"""

from __future__ import annotations

import numpy as np

from ..core import camera as cam

FLT_MIN = np.float32(np.finfo(np.float32).tiny)

# addTriangle vertex patterns (MeshUtil.h:224-247), counterclockwise;
# offsets are (0, 1, width, width+1) indexed as 0=tl, 1=tr, 2=bl, 3=br
_TRIANGLES = {
    0: ("bl", "tr", "tl"),  # top-left
    1: ("tl", "br", "tr"),  # top-right
    2: ("br", "tl", "bl"),  # bottom-left
    3: ("tr", "bl", "br"),  # bottom-right
}


def get_vertexes_equi_error(depth: np.ndarray, camera: cam.Camera) -> np.ndarray:
    """(H*W, 3) equi-error vertices: (x, y) in full-camera pixel units and
    z = focal / depth, so quadric simplification treats depth and image-plane
    errors equally (MeshUtil.h:317-341; derivation RigScene.cpp:160-186)."""
    h, w = depth.shape
    res = np.asarray(camera.resolution, np.float64)
    focal = float(np.asarray(camera.focal)[0])
    ys, xs = np.mgrid[0:h, 0:w]
    vx = res[0] / w * (xs + 0.5)
    vy = res[1] / h * (ys + 0.5)
    vz = focal / depth.astype(np.float64)
    return np.stack([vx, vy, vz], axis=-1).reshape(-1, 3)


def get_triangle_masks(
    corner_depths: np.ndarray, tear_ratio: float
) -> np.ndarray:
    """Vectorized getTriangleMask (MeshUtil.h:170-216).

    corner_depths: (Q, 4) depth proxies in order (tl, tr, bl, br).
    Returns (Q, 4) bool: which of the 4 corner triangles each quad emits.
    """
    q = corner_depths.shape[0]
    order = np.argsort(corner_depths, axis=1, kind="stable")
    v = np.take_along_axis(corner_depths, order, axis=1)  # sorted ascending

    out = np.zeros((q, 4), bool)
    with np.errstate(divide="ignore", invalid="ignore"):
        all_close = v[:, 0] / v[:, 3] > tear_ratio
        lo = v[:, 0] / v[:, 2]
        hi = v[:, 1] / v[:, 3]

    tl, tr, bl, br = (corner_depths[:, i] for i in range(4))
    diag_tlbr = np.abs(tl - br) < np.abs(tr - bl)
    # both triangles along the shallowest diagonal
    out[all_close & diag_tlbr] |= np.asarray([False, True, True, False])
    out[all_close & ~diag_tlbr] |= np.asarray([True, False, False, True])

    three_low = ~all_close & (lo >= tear_ratio) & (lo > hi)
    idx_low = order[:, 3] ^ 0x3  # triangle not touching the farthest corner
    rows = np.nonzero(three_low)[0]
    out[rows, idx_low[rows]] = True

    three_high = ~all_close & ~three_low & (hi >= tear_ratio)
    idx_high = order[:, 0] ^ 0x3  # triangle not touching the nearest corner
    rows = np.nonzero(three_high)[0]
    out[rows, idx_high[rows]] = True
    return out


def get_faces(
    vertexes: np.ndarray,
    width: int,
    height: int,
    wrap_horizontally: bool = False,
    is_rig_coordinates: bool = False,
    tear_ratio: float = 0.0,
) -> np.ndarray:
    """(F, 3) uint32 faces with depth-discontinuity tears (MeshUtil.h:264-296).
    Face order matches the reference's row-major quad scan with per-quad
    triangle order 0..3."""
    v = vertexes.reshape(height, width, 3)
    proxy = np.linalg.norm(v, axis=-1) if is_rig_coordinates else v[..., 2]
    tl = proxy[:-1, :-1]
    tr = proxy[:-1, 1:]
    bl = proxy[1:, :-1]
    br = proxy[1:, 1:]
    corners = np.stack([tl, tr, bl, br], axis=-1).reshape(-1, 4)
    masks = get_triangle_masks(corners, tear_ratio)  # (Q, 4)

    ys, xs = np.mgrid[0 : height - 1, 0 : width - 1]
    base = (ys * width + xs).reshape(-1)
    offsets = {"tl": 0, "tr": 1, "bl": width, "br": width + 1}

    faces_per_tri = []
    order_keys = []
    for t in range(4):
        rows = np.nonzero(masks[:, t])[0]
        pat = _TRIANGLES[t]
        f = np.stack([base[rows] + offsets[p] for p in pat], axis=-1)
        faces_per_tri.append(f)
        order_keys.append(rows * 4 + t)
    faces = np.concatenate(faces_per_tri)
    keys = np.concatenate(order_keys)
    faces = faces[np.argsort(keys, kind="stable")]

    if wrap_horizontally:
        extra = []
        for y in range(height - 1):
            b = y * width
            extra.append([b + width, b, b + width - 1])
            extra.append([b + width - 1, b + 2 * width - 1, b + width])
        faces = np.concatenate([faces, np.asarray(extra)])
    return faces.astype(np.uint32)


def get_vertexes_equirect(disparity: np.ndarray, max_depth: float) -> np.ndarray:
    """Equirect disparity -> rig-coordinate vertex grid (MeshUtil.h:298-315)."""
    h, w = disparity.shape
    ys, xs = np.mgrid[0:h, 0:w]
    u = (xs + 0.5) / w
    v = (ys + 0.5) / h
    theta = u * 2.0 * np.pi
    phi = v * np.pi
    depth = np.minimum(max_depth, 1.0 / disparity)
    d = np.stack(
        [np.sin(phi) * np.cos(theta), np.cos(phi), np.sin(phi) * np.sin(theta)], axis=-1
    )
    return (depth[..., None] * d).reshape(-1, 3)


def apply_mask(vertexes: np.ndarray, faces: np.ndarray, vertex_mask: np.ndarray):
    """Drop masked vertices and the faces touching them, compacting indices
    (applyMaskToVertexesAndFaces, MeshUtil.h:345+)."""
    flat = vertex_mask.reshape(-1)
    keep_face = flat[faces].all(axis=1)
    faces = faces[keep_face]
    used = np.zeros(len(vertexes), bool)
    used[faces.reshape(-1)] = True
    remap = -np.ones(len(vertexes), np.int64)
    remap[used] = np.arange(used.sum())
    return vertexes[used], remap[faces].astype(np.uint32)


def write_vtx_idx(path_vtx, path_idx, vertexes: np.ndarray, faces: np.ndarray) -> None:
    """Row-major float32 / uint32 blobs (writeDepth, MeshUtil.h:72-88)."""
    np.ascontiguousarray(vertexes, np.float32).tofile(path_vtx)
    np.ascontiguousarray(faces, np.uint32).tofile(path_idx)


def read_vtx(path) -> np.ndarray:
    return np.fromfile(path, np.float32).reshape(-1, 3)


def read_idx(path) -> np.ndarray:
    return np.fromfile(path, np.uint32).reshape(-1, 3)


def write_obj(path, vertexes: np.ndarray, faces: np.ndarray, mtl_path: str = "") -> None:
    """OBJ export (writeObj, MeshUtil.h:91-129; 1-based indices)."""
    with open(path, "w") as f:
        if mtl_path:
            f.write(f"mtllib {mtl_path}\n")
        for v in vertexes:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in faces + 1:
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")
