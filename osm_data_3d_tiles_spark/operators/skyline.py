"""Distributed skyline (Pareto frontier) query.

Multi-criteria curation keeps documents no other document beats on EVERY
axis at once — "longest AND highest-quality AND freshest" has no single
ordering, the answer is the non-dominated set. Dominance here: a dominates
b iff a >= b on all criteria and a > b on at least one (all criteria
maximized; negate a column to minimize it). Duplicated criterion vectors do
not dominate each other — all copies survive.

Two-phase distributed plan (the classic partitioned skyline, e.g.
Börzsönyi et al.'s block-nested-loop generalized to partitions):

  1. LOCAL skyline per partition via a vectorized numpy dominance test in
     mapInPandas. Soundness: a globally non-dominated row is trivially
     non-dominated within its own partition, so the global skyline is a
     subset of the union of local skylines — phase 1 can only over-keep.
  2. GLOBAL skyline over the (small) candidate union on one partition.
     The candidate count is bounded by the data's intrinsic skyline width,
     not by N — for correlated criteria it collapses to a handful; the
     adversarial case (anti-correlated criteria, skyline ~ N) is a
     property of the QUESTION, not the plan, and no algorithm shrinks it.

Exact, so the oracle is the textbook NOT EXISTS dominance anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _skyline_pdf(pdf, cols):
    import numpy as np

    m = pdf[list(cols)].to_numpy()
    n = len(m)
    if n == 0:
        return pdf
    keep = np.ones(n, dtype=bool)
    # vectorized block test: for each row, does ANY other row weakly beat
    # it everywhere and strictly somewhere?
    for i in range(n):
        if not keep[i]:
            continue
        ge = (m >= m[i]).all(axis=1)
        gt = (m > m[i]).any(axis=1)
        if (ge & gt).any():
            keep[i] = False
    return pdf.loc[keep]


def skyline(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows of `df` not dominated on the (all-maximized) criterion columns
    `cols`. NULL criteria are refused — NULL is incomparable under
    dominance and would silently drop from numpy comparisons."""
    if not cols:
        raise ValueError("skyline needs at least one criterion column")

    import pandas as pd  # noqa: F401  (mapInPandas workers need it)

    # the NULL guard lives INSIDE each criterion column (a separate checked
    # column would be dead code Catalyst prunes away before it ever runs)
    guarded = [
        F.when(
            F.col(c).isNull(),
            F.expr(f"raise_error('skyline: NULL criterion value in {c}')"),
        )
        .otherwise(F.col(c))
        .alias(c)
        if c in cols
        else F.col(c)
        for c in df.columns
    ]
    df = df.select(*guarded)

    schema = df.schema

    def local(batches):
        import pandas as pd

        chunks = [pdf for pdf in batches]
        if not chunks:
            return
        yield _skyline_pdf(pd.concat(chunks, ignore_index=True), cols)

    candidates = df.mapInPandas(local, schema=schema)
    # phase 2: one task sees every candidate — the union is skyline-width
    # sized, not data-sized
    return candidates.repartition(1).mapInPandas(local, schema=schema)
