"""Hypothesis property tests for the round-3 kernels — all driver-side
(pure Python / DuckDB expression evaluation), no Spark session needed, so
hundreds of examples run in seconds."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _trunc_div(a: int, b: int) -> int:
    """Spark's `div`: truncation toward zero (Python // floors)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


class TestIntervalBucketProperty:
    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(-10**9, 10**9),
        st.integers(1, 10**9),
        st.integers(0, 10**5),
        st.integers(1, 10**4),
    )
    def test_window_bucket_range_covers_every_member_ts(self, start, length, ts_off, b):
        """The operator's soundness invariant: for ANY window [start, end)
        and any ts inside it, ts's bucket lies in [start_bucket, end-1
        bucket] under TRUNCATING div (Spark semantics), negatives included."""
        end = start + length
        ts = start + (ts_off % (end - start))
        assert start <= ts < end
        lo, hi = _trunc_div(start, b), _trunc_div(end - 1, b)
        assert lo <= _trunc_div(ts, b) <= hi


class TestMortonProperty:
    @settings(max_examples=200, deadline=None)
    @given(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1))
    def test_roundtrip_and_sign(self, x, y):
        from osm_data_3d_tiles_spark.functions.morton import morton_decode, morton_sql

        k = duckdb.connect().execute(
            f"SELECT {morton_sql(str(x), str(y))}"
        ).fetchone()[0]
        assert k >= 0
        assert morton_decode(k) == (x, y)

    @settings(max_examples=100, deadline=None)
    @given(st.integers(0, 2**20 - 2), st.integers(0, 2**20 - 1))
    def test_x_order_preserved_within_same_y(self, x, y):
        """Monotone in x for fixed y (interleave preserves per-axis order)."""
        from osm_data_3d_tiles_spark.functions.morton import morton_sql

        con = duckdb.connect()
        k1 = con.execute(f"SELECT {morton_sql(str(x), str(y))}").fetchone()[0]
        k2 = con.execute(f"SELECT {morton_sql(str(x + 1), str(y))}").fetchone()[0]
        assert k1 < k2


def _clip_len_ref(x0, y0, x1, y1, zx0, zy0, zx1, zy1):
    """Reference Liang-Barsky clip length (plain Python floats)."""
    dx, dy = x1 - x0, y1 - y0
    t0, t1 = 0.0, 1.0
    for d, a0, lo, hi in ((dx, x0, zx0, zx1), (dy, y0, zy0, zy1)):
        if d == 0:
            if not (lo <= a0 <= hi):
                return 0.0
        else:
            ta, tb = (lo - a0) / d, (hi - a0) / d
            if ta > tb:
                ta, tb = tb, ta
            t0, t1 = max(t0, ta), min(t1, tb)
    if t1 <= t0:
        return 0.0
    return (t1 - t0) * math.hypot(dx, dy)


class TestLiangBarskyProperty:
    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.integers(-1000, 1000), min_size=8, max_size=8))
    def test_sql_fragment_matches_reference(self, vals):
        from osm_data_3d_tiles_spark.operators.zonal import SEG_T0_SQL, SEG_T1_SQL

        x0, y0, x1, y1, ax, ay, bx, by = (float(v) for v in vals)
        zx0, zx1 = sorted((ax, bx))
        zy0, zy1 = sorted((ay, by))
        con = duckdb.connect()
        t0, t1 = con.execute(
            f"SELECT {SEG_T0_SQL}, {SEG_T1_SQL} FROM (SELECT "
            f"{x0} AS x0, {y0} AS y0, {x1} AS x1, {y1} AS y1, "
            f"{zx0} AS zx0, {zy0} AS zy0, {zx1} AS zx1, {zy1} AS zy1)"
        ).fetchone()
        got = max(0.0, t1 - t0) * math.hypot(x1 - x0, y1 - y0) if t1 > t0 else 0.0
        want = _clip_len_ref(x0, y0, x1, y1, zx0, zy0, zx1, zy1)
        assert got == pytest.approx(want, abs=1e-9)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(-1000, 1000), min_size=8, max_size=8))
    def test_clip_never_exceeds_segment_length(self, vals):
        x0, y0, x1, y1, ax, ay, bx, by = (float(v) for v in vals)
        zx0, zx1 = sorted((ax, bx))
        zy0, zy1 = sorted((ay, by))
        got = _clip_len_ref(x0, y0, x1, y1, zx0, zy0, zx1, zy1)
        assert 0.0 <= got <= math.hypot(x1 - x0, y1 - y0) + 1e-9


class TestMisraGriesProperty:
    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(st.integers(0, 30), min_size=1, max_size=400),
        st.integers(1, 16),
        st.integers(1, 5),
    )
    def test_undercount_bounded_by_decrement_mass(self, items, capacity, n_batches):
        """After any batch split, every surviving counter undercounts its
        true frequency by at most the accumulated decrement mass, and any
        MISSING item's true frequency is also <= that mass — the exactness
        certificate heavy_hitters relies on."""
        from osm_data_3d_tiles_spark.operators.sketches import mg_merge

        import collections
        truth = collections.Counter(items)
        counters: dict = {}
        dec = 0
        step = max(1, len(items) // n_batches)
        for i in range(0, len(items), step):
            batch = pd.Series(items[i:i + step])
            dec += mg_merge(counters, batch.value_counts(), capacity)
        assert len(counters) <= capacity
        for item, true_n in truth.items():
            est = counters.get(item, 0)
            assert est <= true_n
            assert true_n - est <= dec
