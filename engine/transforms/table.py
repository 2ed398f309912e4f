"""table family — relational aggregations per parent key (DFS 2015 "rfeat").

``agg_features`` is the cutoff-aware groupBy: the temporal cutoff filter (P3)
is applied BEFORE aggregation so no aggregate ever reads past the as-of time —
and, being a plain predicate on the scan side, it pushes down to Parquet row
groups. Skewed keys route through ``engine.skew.two_level_agg``.

``grouped_map`` / ``grouped_zscore`` are the Arrow-vectorized per-group
transforms (G5); ``make_grouped_agg_udaf`` builds custom vectorized UDAFs (G6).
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine.skew import two_level_agg

_AGG_FNS = {
    "count": F.count,
    "sum": F.sum,
    "avg": F.avg,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "stddev": F.stddev,
    "countd": F.countDistinct,
    "approx_countd": F.approx_count_distinct,
    "first": F.first,
    "last": F.last,
}


def _as_list(x: str | Sequence[str]) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def agg_features(
    child: DataFrame,
    key: str | Sequence[str],
    agg_specs: dict[str, Sequence[str]],
    cutoff=None,
    ts_col: str = "ts",
    skew_buckets: int | None = None,
) -> DataFrame:
    """Per-key aggregate features with optional temporal cutoff.

    ``agg_specs``: {column: [fn, ...]} with fns from count/sum/avg/min/max/
    stddev/countd/approx_countd. Output columns ``{col}_{fn}``.
    ``cutoff``: literal timestamp — only rows with ts <= cutoff contribute
    (leakage guard; per-probe cutoffs use asof_join instead).
    ``skew_buckets``: route through the salted two-level aggregation.
    """
    if cutoff is not None:
        child = child.where(F.col(ts_col) <= F.lit(cutoff))
    keys = _as_list(key)
    if skew_buckets:
        supported = {"count", "sum", "avg", "min", "max", "stddev"}
        bad = {f for fns in agg_specs.values() for f in fns} - supported
        if bad:
            raise ValueError(f"two_level_agg does not support: {sorted(bad)}")
        return two_level_agg(child, keys, agg_specs, buckets=skew_buckets)
    exprs = [
        _AGG_FNS[fn](F.col(c)).alias(f"{c}_{fn}")
        for c, fns in agg_specs.items()
        for fn in fns
    ]
    return child.groupBy(*keys).agg(*exprs)


def grouped_map(
    df: DataFrame,
    key: str | Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
    prune: Sequence[str] | None = None,
) -> DataFrame:
    """G5: arbitrary per-group pandas transform, Arrow-batched.

    ``prune``: explicit column list selected before the Python stage (Catalyst
    cannot prune through applyInPandas — SURVEY.md §4).
    """
    if prune is not None:
        df = df.select(*prune)
    return df.groupBy(*_as_list(key)).applyInPandas(fn, schema=schema)


def grouped_zscore(
    df: DataFrame, key: str | Sequence[str], col: str, out: str | None = None
) -> DataFrame:
    """Per-group z-normalization — JVM-only implementation (no Python stage):
    group stats via window aggregates, not applyInPandas, because it's
    expressible. Kept in the table family as the canonical 'fit within group,
    transform rows' example."""
    from pyspark.sql import Window

    keys = _as_list(key)
    w = Window.partitionBy(*keys)
    mu = F.avg(col).over(w)
    sd = F.stddev(col).over(w)
    return df.withColumn(out or f"{col}_gz", (F.col(col) - mu) / sd)


def make_grouped_agg_udaf(fn: Callable[[pd.Series], float], return_type: str = "double"):
    """G6: vectorized custom aggregate usable in groupBy().agg() and windows."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(fn, return_type)


def quantile_sketch_gate(
    df: DataFrame,
    key: str | Sequence[str],
    col: str,
    qs: Sequence[float] = (0.5, 0.9),
    accuracy: int = 100,
) -> DataFrame:
    """G9: per-key EXACT positional quantiles plus an in-query error-bound
    gate on the ``percentile_approx`` sketch (Greenwald-Khanna) — the same
    verification pattern as ``approx_distinct``'s 5×rsd bound: the exact
    values are hash-checked against the oracle, and a sketch that ever
    drifts outside its published guarantee flips ``approx_ok`` and breaks
    the value hash.

    Semantics: ``col`` must be an exact integer column (e.g. cents).
    For each q, the exact quantile is the element at 1-based rank
    ``floor(q·(n−1)) + 1`` of the sorted multiset (lower / type-1 quantile
    — interpolation-free, so engine float-quantile differences cannot
    appear). GK with ``accuracy`` a guarantees rank error ≤ n/a; the gate
    asserts the sketch value lies between the exact values at ranks
    rank ∓ (⌊n/a⌋+1), clamped to [1, n].

    Scale: one window shuffle keyed on ``key`` (rank assignment) + one
    hash agg — the value at a rank is well-defined under ties, so
    row_number tie order is irrelevant. The sketch side is a separate
    per-key agg joined back on the tiny key frame.
    """
    keys = _as_list(key)
    from pyspark.sql import Window

    # r4 ADVICE: drop null values BEFORE ranking/counting. row_number
    # orders nulls first and the window count included them — every rank
    # shifted while percentile_approx silently ignored nulls, so exact and
    # sketch would disagree on any null-bearing column. Both sides now see
    # the same non-null multiset (a key that is all nulls drops out of the
    # result rather than reporting ranks over nothing).
    vals = df.select(*keys, col).where(F.col(col).isNotNull())
    w = Window.partitionBy(*keys).orderBy(F.col(col).asc())
    n = F.count(F.lit(1)).over(Window.partitionBy(*keys))
    r = vals.withColumn("_rn", F.row_number().over(w)).withColumn("_n", n)
    err = F.floor(F.col("_n") / accuracy) + 1
    picks = []
    for q in qs:
        tag = str(q).replace("0.", "p")
        rq = F.floor(F.lit(q) * (F.col("_n") - 1)) + 1
        for nm, rank in (
            (f"{tag}_exact", rq),
            (f"{tag}_lo", F.greatest(F.lit(1).cast("long"), rq - err)),
            (f"{tag}_hi", F.least(F.col("_n").cast("long"), rq + err)),
        ):
            picks.append(F.max(F.when(F.col("_rn") == rank, F.col(col))).alias(nm))
    exact = r.groupBy(*keys).agg(F.max("_n").alias("n"), *picks)
    sketch = df.groupBy(*keys).agg(
        *[
            F.percentile_approx(col, q, accuracy).alias(
                f"{str(q).replace('0.', 'p')}_approx"
            )
            for q in qs
        ]
    )
    ok = F.lit(True)
    for q in qs:
        tag = str(q).replace("0.", "p")
        ok = ok & F.col(f"{tag}_approx").between(F.col(f"{tag}_lo"), F.col(f"{tag}_hi"))
    out = exact.join(sketch, keys)
    return out.select(
        *keys,
        "n",
        *[F.col(f"{str(q).replace('0.', 'p')}_exact") for q in qs],
        ok.alias("approx_ok"),
    )
