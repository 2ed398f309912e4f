"""column family — direct (parent-entity) features and whole-column transforms.

Direct features (DFS 2015 "dfeat"): pull parent columns onto child rows via the
FK. Small parents are broadcast (A5: no shuffle of the 10^12-row child side);
large parents use a regular shuffled equi-join (A4) or ``salted_join`` when the
FK is skewed.

Whole-column normalizations avoid the single-partition global-window trap:
``standardize``/``minmax_normalize`` compute a 1-row stats aggregate and
broadcast-join it back (two scans, zero wide shuffles) instead of
``Window.orderBy(col)`` over the whole table. ``rank_normalize`` (percent rank)
genuinely needs a global sort — Spark's range-partitioned sort, not one task —
documented as the expensive one.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_list(x: str | Sequence[str]) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def direct_features(
    child: DataFrame,
    parent: DataFrame,
    fk: str | Sequence[str],
    cols: Iterable[str],
    parent_key: str | Sequence[str] | None = None,
    prefix: str = "",
    use_broadcast: bool = True,
    how: str = "left",
) -> DataFrame:
    """Attach parent columns to child rows: child.fk == parent.parent_key."""
    fk_list = _as_list(fk)
    pk_list = _as_list(parent_key) if parent_key else fk_list
    sel = parent.select(
        *[F.col(k) for k in pk_list],
        *[F.col(c).alias(prefix + c) for c in cols],
    )
    right = F.broadcast(sel) if use_broadcast else sel
    cond = [child[f] == sel[k] for f, k in zip(fk_list, pk_list)]
    out = child.join(right, on=cond, how=how)
    for k in pk_list:
        out = out.drop(sel[k])
    return out


def standardize(df: DataFrame, cols: Iterable[str], suffix: str = "_z") -> DataFrame:
    """(x - mean) / stddev per column — global stats via broadcast, no global sort."""
    cols = list(cols)
    stats = df.agg(
        *[F.avg(c).alias(f"__mu_{c}") for c in cols],
        *[F.stddev(c).alias(f"__sd_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        out = out.withColumn(
            c + suffix, (F.col(c) - F.col(f"__mu_{c}")) / F.col(f"__sd_{c}")
        )
    return out.drop(*[f"__mu_{c}" for c in cols], *[f"__sd_{c}" for c in cols])


def minmax_normalize(df: DataFrame, cols: Iterable[str], suffix: str = "_mm") -> DataFrame:
    """(x - min) / (max - min) per column via broadcast stats."""
    cols = list(cols)
    stats = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in cols],
        *[F.max(c).alias(f"__hi_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        rng = F.col(f"__hi_{c}") - F.col(f"__lo_{c}")
        out = out.withColumn(
            c + suffix,
            F.when(rng == 0, F.lit(0.5)).otherwise((F.col(c) - F.col(f"__lo_{c}")) / rng),
        )
    return out.drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])


def rank_normalize(
    df: DataFrame, col: str, out: str | None = None, partition_by: str | Sequence[str] | None = None
) -> DataFrame:
    """percent_rank of ``col``. Without ``partition_by`` this is a GLOBAL sort —
    range-partitioned by Spark but still the most expensive normalization;
    prefer passing a partition key at scale."""
    w = (
        Window.partitionBy(*_as_list(partition_by)) if partition_by else Window.partitionBy()
    ).orderBy(F.col(col).asc())
    return df.withColumn(out or f"{col}_pctrank", F.percent_rank().over(w))
