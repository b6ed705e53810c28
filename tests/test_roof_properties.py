"""Property-based tests (hypothesis) for the roof/skeleton stack: on random
convex polygons every builder must conserve footprint area in XY projection and
stay inside the [min_height, min_height+height] band (onion may exceed the
footprint laterally by its >1 profile radius but not the height band)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_data_3d_tiles_spark.functions import roofs
from osm_data_3d_tiles_spark.functions.skeleton import straight_skeleton


def convex_polygon(seed: int, k: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    ang = np.sort(rng.rand(k) * 2 * np.pi)
    # strictly-positive radii, distinct angles -> star-shaped; use the convex
    # hull of the points so every generated polygon is convex and simple
    r = 5 + rng.rand(k) * 15
    pts = np.column_stack([r * np.cos(ang), r * np.sin(ang)]) + rng.rand(2) * 50
    from osm_data_3d_tiles_spark.functions.geometry import convex_hull

    hull = convex_hull(pts)
    return np.vstack([hull, hull[:1]])


def shoelace(ring: np.ndarray) -> float:
    p = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    x, y = p[:, 0], p[:, 1]
    return abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2


def tri_area_xy(position: np.ndarray) -> float:
    t = np.asarray(position, dtype=np.float64).reshape(-1, 3, 3)
    return float(np.abs(np.cross(t[:, 1, :2] - t[:, 0, :2], t[:, 2, :2] - t[:, 0, :2]) / 2).sum())


ALL_TYPES = ["flat", "skillion", "pyramidal", "dome", "onion", "hipped", "gabled",
             "gambrel", "mansard", "quadrupleSaltbox", "round", "saltbox"]


class TestRoofProperties:
    @settings(max_examples=25, deadline=None)
    @given(seed=st.integers(0, 10_000), k=st.integers(4, 12),
           rtype=st.sampled_from(ALL_TYPES))
    def test_area_and_height_band(self, seed, k, rtype):
        ring = convex_polygon(seed, k)
        if len(ring) < 4 or shoelace(ring) < 1.0:
            return
        p = dict(rings=[ring], ring_types=["outer"], min_height=10.0, height=4.0,
                 scale_x=3.0, scale_y=3.0, is_stretched=False, texture_id=1,
                 direction=None, orientation=None, angle=None,
                 building_height=14.0, type=rtype)
        r = roofs.build_roof(p)
        pos = r["position"].reshape(-1, 3)
        assert len(pos) > 0
        if rtype == "onion":
            # the onion profile's radius tops at 1.176 -> the surface legitimately
            # bulges outside the footprint; projected area can only grow
            assert tri_area_xy(r["position"]) >= shoelace(ring) * (1 - 1e-5)
        else:
            assert tri_area_xy(r["position"]) == pytest.approx(shoelace(ring), rel=1e-5)
        # height band: the profile height fraction tops at 1.0 for every type
        assert pos[:, 2].min() >= 10.0 - 1e-6
        assert pos[:, 2].max() <= 14.0 + 1e-6

    @settings(max_examples=40, deadline=None)
    @given(seed=st.integers(0, 10_000))
    def test_skeleton_star_no_silent_wrong_tiling(self, seed):
        """Adversarial random stars: a success must tile the footprint exactly
        (the area-conservation gate); a failure is allowed ONLY for non-simple
        rings (this generator does not guarantee simplicity across large
        angular gaps — measured round 3: all 11/1000 failures were
        self-intersecting, 0 failures on the 989 simple polygons)."""
        from osm_data_3d_tiles_spark.functions.skeleton import _ring_self_intersects

        rng = np.random.RandomState(seed)
        k = rng.randint(5, 20)
        ang = np.sort(rng.rand(k) * 2 * np.pi)
        if np.min(np.diff(ang)) < 1e-3:
            ang = ang + np.linspace(0, 1e-2, k)
        rad = 5 + 45 * rng.rand(k)
        ring = np.column_stack([rad * np.cos(ang), rad * np.sin(ang)])
        faces = straight_skeleton(ring)
        if faces is None:
            # flat fallback must mean the input was invalid, never a miss on a
            # simple polygon
            assert _ring_self_intersects(ring), (
                f"skeleton failed on a SIMPLE polygon (seed {seed})"
            )
            return
        total = 0.0
        for face in faces:
            xy = np.array([(v[0], v[1]) for v in face])
            total += shoelace(np.vstack([xy, xy[:1]]))
        assert total == pytest.approx(shoelace(ring), rel=1e-5)

    @settings(max_examples=30, deadline=None)
    @given(seed=st.integers(0, 10_000), k=st.integers(4, 16))
    def test_skeleton_tiles_convex_polygon(self, seed, k):
        ring = convex_polygon(seed, k)
        if len(ring) < 4 or shoelace(ring) < 1.0:
            return
        faces = straight_skeleton(ring)
        assert faces is not None, "skeleton must succeed on convex polygons"
        total = 0.0
        for face in faces:
            xy = np.array([(v[0], v[1]) for v in face])
            total += shoelace(np.vstack([xy, xy[:1]]))
        assert total == pytest.approx(shoelace(ring), rel=1e-6)
        # interior vertices carry positive wavefront heights
        hs = [v[2] for face in faces for v in face]
        assert max(hs) > 0
        assert min(hs) >= 0
