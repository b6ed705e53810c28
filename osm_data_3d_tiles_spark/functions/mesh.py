"""Mesh-buffer kernels shared by the 3D construction operators.

All functions operate on plain numpy arrays; they run inside Arrow `applyInPandas`
batches (per-building loops stay in Python over tiny vertex counts, bulk math is
numpy). Parity sources (/root/reference/):

- src/building/roof/type.ts:48-125          (Vert + clipRange: Sutherland–Hodgman
  clip in UV space with pos/norm lerp)
- src/building/roof/utils.ts:36-95          (calculateNormal / calculateRoofNormals /
  calculateSplitsNormals)
- src/utils/geometry.ts:34-67               (flipTriangleWindingNonIndexed — swaps
  vertex 0 and 2 of each triangle, positions + uvs only)
- three.js BufferGeometry.computeVertexNormals (non-indexed: face normal copied to
  each of the 3 vertices) — used by build3dBuilding.ts:115
- src/building/building-builder.ts:418-459  (addAndPaintGeometry: color/textureId
  fan-out per vertex, uint8 wrap at buffer creation :491-492)
"""

from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------------------
# Vert soup: each vert is (u, v, px, py, pz, nx, ny, nz) — one ndarray row.
# ---------------------------------------------------------------------------

U, V, PX, PY, PZ, NX, NY, NZ = range(8)


def make_verts(uv: np.ndarray, pos: np.ndarray, norm: np.ndarray) -> np.ndarray:
    return np.hstack([
        np.asarray(uv, dtype=np.float64).reshape(-1, 2),
        np.asarray(pos, dtype=np.float64).reshape(-1, 3),
        np.asarray(norm, dtype=np.float64).reshape(-1, 3),
    ])


def clip_range(
    poly: np.ndarray, axis: str, edge: float, keep_greater: bool, strict: bool
) -> np.ndarray:
    """Sutherland–Hodgman half-plane clip of a Vert polygon in UV space; position
    and normal are lerped with the same t (roof/type.ts:48-125)."""
    if len(poly) == 0:
        return poly
    ax = U if axis == "x" else V
    out = []
    n = len(poly)
    for i in range(n):
        A = poly[i]
        B = poly[(i + 1) % n]
        a, b = A[ax], B[ax]
        if keep_greater:
            inside_a = a > edge if strict else a >= edge
            inside_b = b > edge if strict else b >= edge
        else:
            inside_a = a < edge if strict else a <= edge
            inside_b = b < edge if strict else b <= edge
        if inside_a and inside_b:
            out.append(B.copy())
        elif inside_a and not inside_b:
            t = (edge - a) / (b - a)
            out.append(A + t * (B - A))
        elif not inside_a and inside_b:
            t = (edge - a) / (b - a)
            out.append(A + t * (B - A))
            out.append(B.copy())
    if not out:
        return np.empty((0, 8), dtype=np.float64)
    return np.vstack(out)


def _earcut_2d(flat_xy: np.ndarray) -> list[int]:
    """Index triangulation of a small convex-ish cell polygon (fan with ear checks
    handled upstream; clip cells of a triangle are always convex, so a fan is
    exact — the same result earcut produces for convex input)."""
    n = len(flat_xy) // 2
    tris: list[int] = []
    for i in range(1, n - 1):
        tris.extend((0, i, i + 1))
    return tris


def uv_cell_subdivide(
    tri: np.ndarray,
    atlas: tuple[float, float, float, float],
    clamp_uv: bool = True,
    reverse: bool = False,
) -> np.ndarray:
    """Split one Vert triangle along integer UV-cell boundaries, re-triangulate each
    cell and map local UVs through the atlas transform. Returns Vert rows whose
    (u, v) are final atlas UVs. This is the shared loop of flat-roof-builders.ts:
    123-176, skillion-roof-builder.ts:130-175, hipped-roof-builder.ts (triangulate
    Polygon tail) and curved-roof-builder.ts subdivideAndPush.

    reverse=True replicates the `.reverse()` the flat builder applies to the earcut
    output (flat-roof-builders.ts:150 uses reversed indices); cell fans of convex
    polygons are winding-symmetric, so reversing the fan order flips winding.
    """
    off_x, off_y, sc_x, sc_y = atlas
    u_min = tri[:, U].min()
    u_max = tri[:, U].max()
    v_min = tri[:, V].min()
    v_max = tri[:, V].max()
    cu0, cu1 = math.floor(u_min), math.ceil(u_max)
    cv0, cv1 = math.floor(v_min), math.ceil(v_max)

    out_rows = []
    for iu in range(cu0, cu1):
        for iv in range(cv0, cv1):
            cell = tri
            cell = clip_range(cell, "x", iu, True, False)
            cell = clip_range(cell, "x", iu + 1, False, True)
            cell = clip_range(cell, "y", iv, True, False)
            cell = clip_range(cell, "y", iv + 1, False, True)
            if len(cell) < 3:
                continue
            local = cell.copy()
            local[:, U] -= iu
            local[:, V] -= iv
            idx = _earcut_2d(local[:, [U, V]].ravel())
            if reverse:
                idx = idx[::-1]
            if not idx:
                continue
            emitted = local[idx].copy()
            lu = emitted[:, U]
            lv = emitted[:, V]
            if clamp_uv:
                lu = np.clip(lu, 0.0, 1.0)
                lv = np.clip(lv, 0.0, 1.0)
            emitted[:, U] = off_x + lu * sc_x
            emitted[:, V] = off_y + lv * sc_y
            out_rows.append(emitted)
    if not out_rows:
        return np.empty((0, 8), dtype=np.float64)
    return np.vstack(out_rows)


def verts_to_buffers(verts: np.ndarray) -> dict[str, np.ndarray]:
    return {
        "position": verts[:, [PX, PY, PZ]].ravel(),
        "uv": verts[:, [U, V]].ravel(),
        "normal": verts[:, [NX, NY, NZ]].ravel(),
    }


# ---------------------------------------------------------------------------
# normals
# ---------------------------------------------------------------------------


def calculate_normal(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """cross(b - a, c - a), normalized (roof/utils.ts:36-41)."""
    n = np.cross(b - a, c - a)
    ln = np.linalg.norm(n)
    return n / ln if ln > 0 else n


def calculate_roof_normals(positions: np.ndarray, flip: bool = False) -> np.ndarray:
    """Per-face normal copied to each vertex (roof/utils.ts:43-62), vectorized."""
    p = np.asarray(positions, dtype=np.float64).reshape(-1, 3, 3)
    a, b, c = p[:, 0], p[:, 1], p[:, 2]
    n = np.cross(c - a, b - a) if flip else np.cross(b - a, c - a)
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    ln[ln == 0] = 1.0
    n = n / ln
    return np.repeat(n, 3, axis=0).ravel()


def calculate_splits_normals(splits: np.ndarray) -> np.ndarray:
    """Per-split-point 2D normals of a roof profile polyline (roof/utils.ts:64-95).
    rotateLeft((x, y)) = (-y, x)."""
    splits = np.asarray(splits, dtype=np.float64)
    edges = splits[1:] - splits[:-1]
    edge_normals = np.column_stack([-edges[:, 1], edges[:, 0]])
    out = np.zeros_like(splits)
    for i in range(len(splits)):
        e0 = edge_normals[i - 1] if i - 1 >= 0 else None
        e1 = edge_normals[i] if i < len(edge_normals) else None
        if e0 is None:
            v = e1
        elif e1 is None:
            v = e0
        else:
            v = e0 + e1
        out[i] = v / np.linalg.norm(v)
    return out


def compute_vertex_normals(positions: np.ndarray) -> np.ndarray:
    """three.js computeVertexNormals for non-indexed geometry: flat per-face
    normals, normalized, copied to all 3 vertices (build3dBuilding.ts:115)."""
    p = np.asarray(positions, dtype=np.float64).reshape(-1, 3, 3)
    a, b, c = p[:, 0], p[:, 1], p[:, 2]
    n = np.cross(c - b, a - b)
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    ln[ln == 0] = 1.0
    n = n / ln
    return np.repeat(n, 3, axis=0).astype(np.float32).ravel()


def flip_triangle_winding(positions: np.ndarray, uvs: np.ndarray | None) -> tuple[np.ndarray, np.ndarray | None]:
    """Swap vertex 0 and vertex 2 of every triangle, positions + uvs only —
    normals/colors/textureIds are deliberately NOT flipped, matching
    utils/geometry.ts:34-67 exactly."""
    pos = np.asarray(positions, dtype=np.float64).reshape(-1, 3, 3).copy()
    pos[:, [0, 2]] = pos[:, [2, 0]]
    out_uv = None
    if uvs is not None:
        uv = np.asarray(uvs, dtype=np.float64).reshape(-1, 3, 2).copy()
        uv[:, [0, 2]] = uv[:, [2, 0]]
        out_uv = uv.ravel()
    return pos.ravel(), out_uv


# ---------------------------------------------------------------------------
# buffer assembly (BuildingBuilder.addAndPaintGeometry / getGeometry)
# ---------------------------------------------------------------------------


class GeometryAccumulator:
    """Accumulates roof/wall buffers for one building and finalizes typed buffers
    with the reference's dtype downcasts (building-builder.ts:83-95, 484-495)."""

    def __init__(self) -> None:
        self.position: list[np.ndarray] = []
        self.uv: list[np.ndarray] = []
        self.normal: list[np.ndarray] = []
        self.texture_id: list[np.ndarray] = []
        self.color: list[np.ndarray] = []
        self.terrain_mask: list[np.ndarray] = []

    def add(
        self,
        position: np.ndarray,
        normal: np.ndarray,
        uv: np.ndarray,
        color: int,
        texture_id,
        height_offset: float = 0.0,
    ) -> None:
        pos = np.asarray(position, dtype=np.float64).copy()
        if height_offset:
            # reference applies the offset to Y-index-1 of interleaved xyz
            pos = pos.reshape(-1, 3)
            pos[:, 1] += height_offset
            pos = pos.ravel()
        n_verts = len(pos) // 3
        self.position.append(pos)
        self.normal.append(np.asarray(normal, dtype=np.float64))
        self.uv.append(np.asarray(uv, dtype=np.float64))
        from .colors import color_to_components

        comps = color_to_components(int(color)) if color is not None else (255, 255, 255)
        self.color.append(np.tile(np.array(comps, dtype=np.int64), n_verts))
        if np.isscalar(texture_id) or texture_id is None:
            tid = 0 if texture_id is None else int(texture_id)
            self.texture_id.append(np.full(n_verts, tid, dtype=np.int64))
        else:
            self.texture_id.append(np.asarray(texture_id, dtype=np.int64))

    def add_mask(self, position: np.ndarray) -> None:
        pos = np.asarray(position, dtype=np.float64).reshape(-1, 3)
        self.terrain_mask.append(pos[:, [0, 2]].ravel())

    def geometry(self) -> dict[str, np.ndarray]:
        pos = np.concatenate(self.position) if self.position else np.empty(0)
        out = {
            "position": pos.astype(np.float32),
            "normal": (np.concatenate(self.normal) if self.normal else np.empty(0)).astype(np.float32),
            "uv": (np.concatenate(self.uv) if self.uv else np.empty(0)).astype(np.float32),
            # uint8 casts wrap exactly like JS Uint8Array stores (incl. the
            # negative r component of colors above 2^24, colors.py)
            "texture_id": (np.concatenate(self.texture_id) if self.texture_id else np.empty(0, dtype=np.int64)).astype(np.uint8),
            "color": (np.concatenate(self.color) if self.color else np.empty(0, dtype=np.int64)).astype(np.uint8),
            "terrain_mask": (np.concatenate(self.terrain_mask) if self.terrain_mask else np.empty(0)).astype(np.float32),
        }
        p = out["position"].reshape(-1, 3)
        out["bbox"] = (
            np.array([p.min(axis=0), p.max(axis=0)]).ravel()
            if len(p)
            else np.zeros(6, dtype=np.float32)
        )
        return out
