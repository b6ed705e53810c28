"""As-of join semantics."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_data_3d_tiles_spark.operators.asof import asof_join


def _ts(m):
    return pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=m)


@pytest.fixture()
def frames(spark):
    facts = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [0, 1, 2, 3, 4],
                "k": [1, 1, 1, 2, 2],
                "ts": [_ts(0), _ts(10), _ts(20), _ts(5), _ts(30)],
            }
        )
    )
    snaps = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2],
                "ts": [_ts(10), _ts(15), _ts(25)],
                "rate": [100.0, 200.0, 300.0],
            }
        )
    )
    return facts, snaps


class TestAsofJoin:
    def test_semantics(self, spark, frames):
        facts, snaps = frames
        out = (
            asof_join(facts, snaps, key="k", value_cols=("rate",))
            .toPandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        # event 0 (t0): no snapshot yet -> NULL
        # event 1 (t10): snapshot AT t10 applies (<= semantics)
        # event 2 (t20): latest is t15
        # event 3 (k2, t5): k2's first snapshot is t25 -> NULL
        # event 4 (k2, t30): t25 applies
        assert out.asof_rate.isna().tolist() == [True, False, False, True, False]
        assert out.asof_rate.dropna().tolist() == [100.0, 200.0, 300.0]

    def test_fact_columns_and_order_preserved(self, spark, frames):
        facts, snaps = frames
        out = asof_join(facts, snaps, key="k", value_cols=("rate",))
        assert out.columns == ["event_id", "k", "ts", "asof_rate"]

    def test_missing_value_col_raises(self, spark, frames):
        facts, snaps = frames
        with pytest.raises(ValueError, match="lacks value column"):
            asof_join(facts, snaps, key="k", value_cols=("nope",))

    def test_matches_pandas_merge_asof(self, spark):
        """Cross-check against pandas' independent merge_asof on a random
        interleaving (backward direction == our <= semantics)."""
        import numpy as np

        rng = np.random.default_rng(5)
        f = pd.DataFrame(
            {
                "event_id": range(300),
                "k": rng.integers(0, 5, 300),
                "ts": [_ts(int(m)) for m in rng.integers(0, 500, 300)],
            }
        )
        s = (
            pd.DataFrame(
                {
                    "k": rng.integers(0, 5, 40),
                    "ts": [_ts(int(m)) for m in rng.integers(0, 500, 40)],
                    "rate": rng.uniform(0, 1, 40).round(6),
                }
            )
            .groupby(["k", "ts"], as_index=False)
            .rate.max()  # unique per (key, ts), as the operator requires
        )
        got = (
            asof_join(spark.createDataFrame(f), spark.createDataFrame(s), key="k", value_cols=("rate",))
            .toPandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            f.sort_values("ts"), s.sort_values("ts"), on="ts", by="k", direction="backward"
        ).sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_series_equal(
            got["asof_rate"], want["rate"], check_names=False
        )
