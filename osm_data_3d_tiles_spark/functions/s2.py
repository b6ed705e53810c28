"""From-scratch S2 cell index — Hilbert curve on the unit-cube faces.

The north-star brief indexes page geotags with "H3/S2" cells.  The engine's
workhorse grid is the web-mercator XYZ tiling (`functions/mercator.py` —
z16 prefilter cells, z20 PIP refinement, z-order layout).  This module adds
a genuine S2 cell id as a second, pole-safe scheme: the sphere is projected
onto 6 cube faces, each face carries a Hilbert space-filling curve, and a
level-L cell id encodes (face, curve position) in one uint64 whose prefix
structure makes parent/child containment a bit operation — exactly the
property a distributed join/rollup wants in a single sortable key.

Implemented from the public S2 geometry spec (s2geometry.io; Google
s2geometry, Apache-2.0): the face layout, the quadratic u→s projection
(S2_QUADRATIC_PROJECTION, the library default), the 64-bit id layout
(3 face bits ∥ 2·level Hilbert bits ∥ sentinel 1 ∥ zeros), and the
orientation-table Hilbert traversal (kIJtoPos / kPosToOrientation with
swap/invert masks).  No S2 library exists in this sandbox to diff exact ids
against, so correctness rides structural property tests (face anchors,
per-level bijectivity, Hilbert adjacency of consecutive curve positions,
parent/child prefix containment) — see tests/test_s2.py.

Everything is vectorized numpy over flat arrays (30 table-lookup rounds,
each O(n) fancy indexing) wrapped in an Arrow `pandas_udf` for the Spark
surface — no per-row Python.  Ids are exposed to Spark as int64 (the uint64
bit pattern two's-complemented): equality joins / groupBy keys are
bit-pattern-exact; note face ≥ 4 ids sort negative, so ORDER BY on the raw
int64 is not curve order — order by `F.conv`-style unsigned key or keep
face-local sorts, as the layout sink does with the z-order key.

Scope: point→cell assignment at any level, parent rollup, id→(face,i,j)
inversion.  Neighbor/k-ring topology across face edges is NOT implemented —
kNN rides the mercator k-ring (`operators/knn.py`); this index serves
assignment, hierarchy rollups, and equality-join prefilters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

MAX_LEVEL = 30

_SWAP = 1
_INVERT = 2
# child traversal position -> orientation change of that child's sub-curve
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _SWAP | _INVERT], dtype=np.int64)
# curve position -> (i<<1 | j) quadrant, per current orientation
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical order
        [0, 2, 3, 1],  # swap
        [3, 2, 0, 1],  # invert
        [3, 1, 0, 2],  # swap + invert
    ],
    dtype=np.int64,
)
_IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    _IJ_TO_POS[_o, _POS_TO_IJ[_o]] = np.arange(4)


# ---------------------------------------------------------------------------
# sphere -> cube face -> leaf (i, j)
# ---------------------------------------------------------------------------

def _xyz(lon_deg: np.ndarray, lat_deg: np.ndarray):
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lon), cos_lat * np.sin(lon), np.sin(lat)


def _face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Largest-|component| face (0..5 = +x +y +z -x -y -z) and its (u, v)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(axis, [x, y, z])
    face = np.where(major >= 0, axis, axis + 3)
    # public face->(u,v) table (s2coords): one row per face. np.choose
    # evaluates every branch, so unselected rows divide by (possibly zero)
    # minor components — harmless values discarded by the selection.
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.choose(face, [y / x, -x / y, -x / z, z / x, z / y, -y / z])
        v = np.choose(face, [z / x, z / y, -y / z, y / x, -x / y, -x / z])
    return face.astype(np.int64), u, v


def _st_from_uv(u: np.ndarray) -> np.ndarray:
    """S2 quadratic projection: equalizes cell areas across a face."""
    with np.errstate(invalid="ignore"):  # unselected np.where branch
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _uv_from_st(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def face_ij(lon_deg: np.ndarray, lat_deg: np.ndarray):
    """(face, i, j) at leaf resolution (level 30) for lon/lat degrees."""
    x, y, z = _xyz(lon_deg, lat_deg)
    face, u, v = _face_uv(x, y, z)
    n = np.int64(1) << MAX_LEVEL
    i = np.clip((_st_from_uv(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip((_st_from_uv(v) * n).astype(np.int64), 0, n - 1)
    return face, i, j


# ---------------------------------------------------------------------------
# Hilbert curve <-> cell id
# ---------------------------------------------------------------------------

def cell_id_from_face_ij(
    face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int
) -> np.ndarray:
    """64-bit S2 cell id at `level` from leaf (face, i, j). Returns int64
    (the uint64 bit pattern, two's complement)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")
    face = np.asarray(face, dtype=np.int64)
    pos = np.zeros(face.shape, dtype=np.uint64)
    orient = face & _SWAP  # per-face starting orientation
    for k in range(MAX_LEVEL - 1, MAX_LEVEL - 1 - level, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << np.uint64(2)) | p.astype(np.uint64)
        orient = orient ^ _POS_TO_ORIENT[p]
    shift = 2 * (MAX_LEVEL - level)
    out = (
        (face.astype(np.uint64) << np.uint64(61))
        | (pos << np.uint64(shift + 1))
        | np.uint64(1 << shift)
    )
    return out.view(np.int64)


def cell_id(lon_deg: np.ndarray, lat_deg: np.ndarray, level: int) -> np.ndarray:
    face, i, j = face_ij(lon_deg, lat_deg)
    return cell_id_from_face_ij(face, i, j, level)


def level_of(ids: np.ndarray) -> np.ndarray:
    """Cell level from the sentinel bit (position of the lowest set bit)."""
    u = np.asarray(ids, dtype=np.int64).view(np.uint64)
    lsb = u & (~u + np.uint64(1))
    # log2 of a power of two; exact for 2^0..2^62
    tz = np.round(np.log2(lsb.astype(np.float64))).astype(np.int64)
    return MAX_LEVEL - tz // 2


def parent(ids: np.ndarray, level: int) -> np.ndarray:
    """Ancestor id at `level` (must be <= each id's own level): zero the
    sub-level bits and move the sentinel — pure bit math, the property that
    makes hierarchy rollups a shuffle-free map."""
    u = np.asarray(ids, dtype=np.int64).view(np.uint64)
    new_lsb = np.uint64(1 << (2 * (MAX_LEVEL - level)))
    return (((u & (~new_lsb + np.uint64(1))) | new_lsb)).view(np.int64)


def face_ij_from_cell(ids: np.ndarray, level: int):
    """Invert a level-`level` cell id back to (face, i, j) on that level's
    2^level grid (used by tests and coverings)."""
    u = np.asarray(ids, dtype=np.int64).view(np.uint64)
    face = (u >> np.uint64(61)).astype(np.int64)
    pos = (u >> np.uint64(2 * (MAX_LEVEL - level) + 1)).astype(np.uint64)
    i = np.zeros(face.shape, dtype=np.int64)
    j = np.zeros(face.shape, dtype=np.int64)
    orient = face & _SWAP
    for k in range(level - 1, -1, -1):
        p = ((pos >> np.uint64(2 * k)) & np.uint64(3)).astype(np.int64)
        ij = _POS_TO_IJ[orient, p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orient = orient ^ _POS_TO_ORIENT[p]
    return face, i, j


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def s2_cell_col(lon: Column, lat: Column, level: int) -> Column:
    """Arrow-vectorized s2 cell id column (int64 bit pattern)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")

    @pandas_udf(LongType())
    def _s2(lon_s: pd.Series, lat_s: pd.Series) -> pd.Series:
        return pd.Series(cell_id(lon_s.to_numpy(), lat_s.to_numpy(), level))

    return _s2(lon, lat)


def s2_parent_col(cell: Column, level: int) -> Column:
    """Arrow-vectorized ancestor id at `level` — the rollup key."""

    @pandas_udf(LongType())
    def _par(ids: pd.Series) -> pd.Series:
        return pd.Series(parent(ids.to_numpy(), level))

    return _par(cell)
