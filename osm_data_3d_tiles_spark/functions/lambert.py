"""EPSG:2154 (RGF93 / Lambert-93) forward projection — Lambert Conformal Conic
2SP on GRS80, the target projection of the reference's customBox tileset mode
(/root/reference/src/tileset/customBox.ts:10-16 registers the public proj4
definition "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +x_0=700000
+y_0=6600000 +ellps=GRS80"). Formulas are the standard EPSG guidance-note
9802 (Lambert Conic Conformal 2SP) series; vectorized numpy throughout.
"""

from __future__ import annotations

import numpy as np

from . import mercator as m

# GRS80 ellipsoid
A = 6378137.0
F_INV = 298.257222101
_F = 1.0 / F_INV
E2 = 2.0 * _F - _F * _F
E = np.sqrt(E2)

# Lambert-93 parameters (EPSG:2154)
LAT1 = np.radians(49.0)
LAT2 = np.radians(44.0)
LAT0 = np.radians(46.5)
LON0 = np.radians(3.0)
X0 = 700000.0
Y0 = 6600000.0


def _m_of(phi):
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - E2 * s * s)


def _t_of(phi):
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - E * s) / (1.0 + E * s)) ** (E / 2.0)


_M1, _M2 = _m_of(LAT1), _m_of(LAT2)
_T0, _T1, _T2 = _t_of(LAT0), _t_of(LAT1), _t_of(LAT2)
N = (np.log(_M1) - np.log(_M2)) / (np.log(_T1) - np.log(_T2))
F_CONST = _M1 / (N * _T1**N)
RHO0 = A * F_CONST * _T0**N


def lonlat_to_lambert93(lon_deg, lat_deg):
    """(lon, lat) degrees → EPSG:2154 (easting, northing) meters."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    rho = A * F_CONST * _t_of(lat) ** N
    theta = N * (lon - LON0)
    return X0 + rho * np.sin(theta), Y0 + RHO0 - rho * np.cos(theta)


def merc_to_lambert93(x, y):
    """EPSG:3857 → EPSG:2154, matching OpenLayers' transform(..., 'EPSG:3857',
    'EPSG:2154') chain (3857 → geographic → LCC; RGF93↔WGS84 is a zero
    transform per the +towgs84=0,... definition)."""
    lon, lat = m.merc_to_lonlat(np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64))
    return lonlat_to_lambert93(lon, lat)


def transform_extent_to_lambert93(extent) -> tuple[float, float, float, float]:
    """Axis-aligned 3857 extent → bounding 2154 extent via its four corners
    (OpenLayers transformExtent semantics)."""
    min_x, min_y, max_x, max_y = extent
    xs = np.array([min_x, max_x, min_x, max_x])
    ys = np.array([min_y, min_y, max_y, max_y])
    ex, ny = merc_to_lambert93(xs, ys)
    return float(ex.min()), float(ny.min()), float(ex.max()), float(ny.max())


def jacobian_3857_to_lambert93(x0: float, y0: float):
    """Finite-difference linearization of 3857 → 2154 at (x0, y0) with +1 m
    probes — buildA_3857_to_target_projection_at (customBox.ts:107-119).
    Returns (P0, vx, vy) with P0 the projected center, vx/vy the image of the
    3857 unit steps."""
    ex, ny = merc_to_lambert93(np.array([x0, x0 + 1.0, x0]), np.array([y0, y0, y0 + 1.0]))
    p0 = (float(ex[0]), float(ny[0]))
    vx = (float(ex[1] - ex[0]), float(ny[1] - ny[0]))
    vy = (float(ex[2] - ex[0]), float(ny[2] - ny[0]))
    return p0, vx, vy
