"""WGS84 ECEF / ENU math for region-mode tilesets.

The reference carries *two slightly different* eccentricity-squared constants and both
are load-bearing (SURVEY.md §2.2):

- `lonLatToECEF` (src/math/utils.ts:47-66): e2 = 0.00669437999014, degree inputs.
- `lonLatHeightToECEF` (src/tileset/utils.ts:31-48): e2 = f(2-f), f = 1/298.257223563,
  radian inputs.

Both are replicated per call-site. All kernels are numpy-vectorized.
"""

from __future__ import annotations

import math

import numpy as np

A = 6378137.0
E2_MATH_UTILS = 0.00669437999014
F_WGS84 = 1.0 / 298.257223563
E2_TILESET = F_WGS84 * (2.0 - F_WGS84)

TILE_HEIGHT = 300.0  # reference src/tileset/utils.ts:3


def to_rad(deg):
    return np.asarray(deg, dtype=np.float64) * math.pi / 180.0


def lonlat_to_ecef_deg(lon_deg, lat_deg, height=0.0):
    """Degree-input variant, e2 = 0.00669437999014 (src/math/utils.ts:47-66)."""
    lam = to_rad(lon_deg)
    phi = to_rad(lat_deg)
    n = A / np.sqrt(1.0 - E2_MATH_UTILS * np.sin(phi) ** 2)
    x = (n + height) * np.cos(phi) * np.cos(lam)
    y = (n + height) * np.cos(phi) * np.sin(lam)
    z = (n * (1.0 - E2_MATH_UTILS) + height) * np.sin(phi)
    return x, y, z


def lonlat_to_ecef_rad(lon_rad, lat_rad, h=0.0):
    """Radian-input variant, e2 = f(2-f) (src/tileset/utils.ts:31-48)."""
    lon_rad = np.asarray(lon_rad, dtype=np.float64)
    lat_rad = np.asarray(lat_rad, dtype=np.float64)
    sin_lat, cos_lat = np.sin(lat_rad), np.cos(lat_rad)
    n = A / np.sqrt(1.0 - E2_TILESET * sin_lat * sin_lat)
    x = (n + h) * cos_lat * np.cos(lon_rad)
    y = (n + h) * cos_lat * np.sin(lon_rad)
    z = (n * (1.0 - E2_TILESET) + h) * sin_lat
    return x, y, z


def enu_basis(lon_rad: float, lat_rad: float) -> np.ndarray:
    """Columns E, N, U as a 3×3 matrix (mat3FromBasis of enuBasisECEF,
    src/tileset/utils.ts:6-29): M = [E | N | U]."""
    sl, cl = math.sin(lon_rad), math.cos(lon_rad)
    sp, cp = math.sin(lat_rad), math.cos(lat_rad)
    e = np.array([-sl, cl, 0.0])
    n = np.array([-sp * cl, -sp * sl, cp])
    u = np.array([cp * cl, cp * sl, sp])
    return np.column_stack([e, n, u])


def ecef_to_enu_delta(d_ecef: np.ndarray, lon_rad: float, lat_rad: float) -> np.ndarray:
    """Project an ECEF delta onto the local ENU basis (src/tileset/region.ts:98-111)."""
    return enu_basis(lon_rad, lat_rad).T @ np.asarray(d_ecef, dtype=np.float64)


def jacobian_3857_to_enu(x0: float, y0: float, h0: float):
    """Finite-difference linearization of EPSG:3857 → local ENU at (x0, y0) using
    +1 m probes, exactly as buildA_3857_to_ENU (src/tileset/region.ts:113-140).

    Returns (A3x3, C0) where A3x3 maps (dx3857, dy3857, dz) → ENU and C0 is the ECEF
    center at height h0. A3x3 = [[vx.x, vy.x, 0], [vx.y, vy.y, 0], [vx.z, vy.z, 1]].
    """
    from .mercator import merc_to_lonlat

    lon0_deg, lat0_deg = merc_to_lonlat(np.array([x0]), np.array([y0]))
    lon0, lat0 = float(to_rad(lon0_deg[0])), float(to_rad(lat0_deg[0]))
    c0 = np.array(lonlat_to_ecef_rad(lon0, lat0, h0), dtype=np.float64)

    lon_x, lat_x = merc_to_lonlat(np.array([x0 + 1.0]), np.array([y0]))
    cx = np.array(
        lonlat_to_ecef_rad(float(to_rad(lon_x[0])), float(to_rad(lat_x[0])), h0), dtype=np.float64
    )
    lon_y, lat_y = merc_to_lonlat(np.array([x0]), np.array([y0 + 1.0]))
    cy = np.array(
        lonlat_to_ecef_rad(float(to_rad(lon_y[0])), float(to_rad(lat_y[0])), h0), dtype=np.float64
    )

    vx = ecef_to_enu_delta(cx - c0, lon0, lat0)
    vy = ecef_to_enu_delta(cy - c0, lon0, lat0)
    a = np.array(
        [
            [vx[0], vy[0], 0.0],
            [vx[1], vy[1], 0.0],
            [vx[2], vy[2], 1.0],
        ]
    )
    return a, c0
