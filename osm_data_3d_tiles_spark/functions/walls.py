"""Walls construction kernel — faithful port of the reference WallsBuilder.

Parity source: /root/reference/src/building/walls-builder.ts:10-183 (the active
`build` path: closed-ring detection, edge smoothness at 30°, rotation to the first
non-smooth corner, per-wall window segmentation, integer-U sub-segmentation, level
repetition with the fractional-level quirk) plus :213-234 (getEdgeSmoothness),
:266-340 (getWalls), :238-264 (getWallsUVSegments), :342-366 (getSegmentsNormals).

Quirks replicated deliberately:
- the level loop `for (iy = 0; iy < levels; iy++)` runs ceil(levels) times for
  fractional levels, and the top slice exceeds the wall top (v1 = (iy+1)/levels);
- `if (levels < 1) v1 = 1` only inside the loop body;
- `f1 = ((u1 % 1) + 1) % 1; if (f1 === 0) f1 = 1`;
- segment normals scale with segment length before final normalize;
- heightPoints interpolation subtracts minHeight from raw skirt heights.
"""

from __future__ import annotations

import math

import numpy as np

from .atlas import atlas_transform_for_texture

SMOOTH_THRESHOLD_DEG = 30.0  # walls-builder.ts:8


def _next_vertex(i: int, n: int, is_closed: bool) -> int | None:
    j = i + 1
    if j > n - 1:
        return 0 if is_closed else None
    return j


def _edge_smoothness(vertices: np.ndarray, is_closed: bool) -> list[bool]:
    n = len(vertices)
    cos_thr = math.cos(math.radians(SMOOTH_THRESHOLD_DEG))
    out = []
    for i in range(n):
        nxt = _next_vertex(i, n, is_closed)
        prv = (i - 1) % n if (is_closed or i > 0) else None
        if nxt is None or prv is None:
            out.append(False)
            continue
        seg = vertices[nxt] - vertices[i]
        prev_seg = vertices[i] - vertices[prv]
        ls, lp = np.linalg.norm(seg), np.linalg.norm(prev_seg)
        if ls == 0 or lp == 0:
            out.append(False)
            continue
        out.append(float(np.dot(seg / ls, prev_seg / lp)) > cos_thr)
    return out


def _get_walls(
    vertices: np.ndarray, is_closed: bool, smooth: list[bool], window_width: float
) -> list[list]:
    """[(u0, u1, has_window)] per segment (walls-builder.ts:266-340)."""
    n = len(vertices)
    seg_count = n if is_closed else n - 1
    uv_progress: list[list[float]] = []
    progress = 0.0
    for i in range(seg_count):
        nxt = _next_vertex(i, n, is_closed)
        if nxt is None:
            break
        seg_len = float(np.linalg.norm(vertices[nxt] - vertices[i]))
        next_smooth = smooth[i + 1] if i + 1 < len(smooth) else smooth[0]
        uv_progress.append([progress, progress + seg_len])
        progress = 0.0 if not next_smooth else progress + seg_len

    processed: list[list] = []
    current: list[list] = []
    windows_progress = 0.0
    for i in range(len(uv_progress)):
        seg = uv_progress[i]
        nxt = uv_progress[i + 1] if i + 1 < len(uv_progress) else None
        current.append([seg[0], seg[1], False])
        if nxt is None or nxt[0] == 0:
            wall_len = current[-1][1]
            window_count = math.floor(wall_len / window_width + 0.5)  # JS round
            if window_count > 0:
                actual = wall_len / window_count
                for s in current:
                    s[0] /= actual
                    s[1] /= actual
                    s[2] = True
            else:
                for s in current:
                    s[0] /= window_width
                    s[1] /= window_width
                    s[2] = False
            for s in current:
                s[0] += windows_progress
                s[1] += windows_progress
            processed.extend(current)
            current = []
            windows_progress = math.floor(windows_progress + window_count)
    return processed


def _uv_segments(raw: list[list]) -> list[tuple[int, float, float, bool]]:
    """Split each wall segment at integer U boundaries (walls-builder.ts:238-264)."""
    out: list[tuple[int, float, float, bool]] = []
    for seg_idx, (u0, u1, has_window) in enumerate(raw):
        cuts = [u0]
        b = math.ceil(u0)
        while b <= math.floor(u1):
            cuts.append(float(b))
            b += 1
        if cuts[-1] != u1:
            cuts.append(u1)
        for k in range(len(cuts) - 1):
            out.append((seg_idx, cuts[k], cuts[k + 1], has_window))
    return out


def _segment_normals(vertices: np.ndarray, is_closed: bool) -> np.ndarray:
    """Length-weighted outward 3D normals per segment (walls-builder.ts:342-366).
    calculateNormal((vx,0,vy), (nx,0,ny), (vx,1,vy)) with the reference's (x, y=up,
    z=y2d) triple, then scaled by segment length."""
    n = len(vertices)
    seg_count = n if is_closed else n - 1
    out = np.zeros((seg_count, 3))
    for i in range(seg_count):
        nxt = _next_vertex(i, n, is_closed)
        a2, b2 = vertices[i], vertices[nxt]
        seg_len = float(np.linalg.norm(b2 - a2))
        va = np.array([a2[0], 0.0, a2[1]])
        vb = np.array([b2[0], 0.0, b2[1]])
        vc = np.array([a2[0], 1.0, a2[1]])
        nrm = np.cross(vb - va, vc - va)
        ln = np.linalg.norm(nrm)
        if ln > 0:
            nrm = nrm / ln
        out[i] = nrm * seg_len
    return out


def build_walls(
    vertices: np.ndarray,
    min_height: float,
    height: float,
    levels: float,
    window_width: float,
    texture_id_wall: int,
    texture_id_window: int,
    height_points: np.ndarray | None = None,
    uv_offset: tuple[float, float] = (0.0, 0.0),
) -> dict[str, np.ndarray]:
    """Returns dict(position, uv, normal, texture_id) flat buffers; coordinates are
    (x, y, z=height) like the reference's roof output."""
    vertices = np.asarray(vertices, dtype=np.float64).reshape(-1, 2)
    hp = None if height_points is None else np.asarray(height_points, dtype=np.float64).copy()
    is_closed = False
    if len(vertices) > 1 and np.array_equal(vertices[0], vertices[-1]):
        vertices = vertices[1:]
        if hp is not None:
            hp = hp[1:]
        is_closed = True

    smooth = _edge_smoothness(vertices, is_closed)
    first_sharp = next((i for i, s in enumerate(smooth) if not s), -1)
    if first_sharp > 0:
        smooth = smooth[first_sharp:] + smooth[:first_sharp]
        vertices = np.roll(vertices, -first_sharp, axis=0)
        if hp is not None:
            hp = np.roll(hp, -first_sharp)

    seg_normals = _segment_normals(vertices, is_closed)
    raw_walls = _get_walls(vertices, is_closed, smooth, window_width)
    segments = _uv_segments(raw_walls)

    positions: list[float] = []
    uvs: list[float] = []
    normals: list[float] = []
    texture_ids: list[int] = []
    n = len(vertices)

    for seg_idx, u0, u1, has_window in segments:
        nxt = _next_vertex(seg_idx, n, is_closed)
        if nxt is None:
            continue
        A = vertices[seg_idx]
        B = vertices[nxt]
        tex_id = texture_id_window if has_window else texture_id_wall
        off_x, off_y, sc_x, sc_y = atlas_transform_for_texture(tex_id)

        seg_vec = B - A
        seg_len = float(np.linalg.norm(seg_vec))
        if seg_len == 0:
            continue
        direction = seg_vec / seg_len

        raw_start, raw_end, _w = raw_walls[seg_idx]
        total_u = raw_end - raw_start
        uv_to_ws = seg_len / total_u if total_u != 0 else 0.0
        offset_ws = (u0 - raw_start) * uv_to_ws
        width_ws = (u1 - u0) * uv_to_ws

        if hp is not None:
            za_raw = hp[seg_idx] - min_height
            zb_raw = (hp[seg_idx + 1] if seg_idx + 1 < len(hp) else hp[0]) - min_height
        else:
            za_raw = height - min_height
            zb_raw = height - min_height
        z_base = min_height

        P0 = A + direction * offset_ws
        P1 = A + direction * (offset_ws + width_ws)
        a0 = offset_ws / seg_len
        a1 = (offset_ws + width_ws) / seg_len
        h0 = za_raw + (zb_raw - za_raw) * a0
        h1 = za_raw + (zb_raw - za_raw) * a1

        f0 = ((u0 % 1) + 1) % 1
        f1 = ((u1 % 1) + 1) % 1
        if f1 == 0:
            f1 = 1
        U0 = uv_offset[0] + off_x + f0 * sc_x
        U1 = uv_offset[0] + off_x + f1 * sc_x

        nrm = seg_normals[seg_idx]
        ln = np.linalg.norm(nrm)
        nrm = nrm / ln if ln > 0 else nrm

        iy = 0
        while iy < levels:
            v0 = iy / levels
            v1 = (iy + 1) / levels
            if levels < 1:
                v1 = 1.0
            uv_v0 = uv_offset[1] + off_y + 0 * sc_y
            uv_v1 = uv_offset[1] + off_y + 1 * sc_y

            y0b = z_base + h0 * v0
            y1b = z_base + h1 * v0
            y0t = z_base + h0 * v1
            y1t = z_base + h1 * v1

            positions.extend([
                P1[0], P1[1], y1b,
                P0[0], P0[1], y0b,
                P0[0], P0[1], y0t,
                P1[0], P1[1], y1b,
                P0[0], P0[1], y0t,
                P1[0], P1[1], y1t,
            ])
            uvs.extend([
                U1, uv_v0, U0, uv_v0, U0, uv_v1,
                U1, uv_v0, U0, uv_v1, U1, uv_v1,
            ])
            for _ in range(6):
                normals.extend([nrm[0], nrm[1], nrm[2]])
                texture_ids.append(tex_id)
            iy += 1

    return {
        "position": np.array(positions, dtype=np.float64),
        "uv": np.array(uvs, dtype=np.float64),
        "normal": np.array(normals, dtype=np.float64),
        "texture_id": np.array(texture_ids, dtype=np.int64),
    }
