"""Windowed feature operators (SURVEY.md §2.4 W1-W7).

All pure-JVM window expressions — no Python workers, whole-stage codegen stays
intact. Each operator shuffles once on the entity key; composing several
operators over the SAME (entity, ts) window reuses the single sort (Catalyst
collapses adjacent Window nodes with identical specs into one exchange+sort).

Leakage discipline: forward_fill / lag / sessionize / rolling / cumulative look
strictly backward (frame upper bound = current row). ``backward_fill`` and
``lead`` read the future BY DEFINITION — they are provided for label/target
construction only and are excluded from leakage-safe feature sets
(tests/test_leakage.py asserts the safe set never changes when future rows are
mutated).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from engine.tstools import epoch_micros

_GAP_UNITS = {
    "second": 1, "seconds": 1, "s": 1,
    "minute": 60, "minutes": 60, "m": 60,
    "hour": 3600, "hours": 3600, "h": 3600,
    "day": 86400, "days": 86400, "d": 86400,
}


def _as_list(x: str | Sequence[str]) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def _entity_window(entity: str | Sequence[str], ts: str) -> WindowSpec:
    return Window.partitionBy(*_as_list(entity)).orderBy(F.col(ts).asc())


def parse_duration_seconds(d: str | int | float) -> float:
    """'30 minutes' / '1 hour' / 90 → seconds."""
    if isinstance(d, (int, float)):
        return float(d)
    parts = d.strip().split()
    if len(parts) == 2 and parts[1].lower() in _GAP_UNITS:
        return float(parts[0]) * _GAP_UNITS[parts[1].lower()]
    raise ValueError(f"cannot parse duration: {d!r}")


def forward_fill(
    df: DataFrame,
    entity: str | Sequence[str],
    ts: str,
    cols: Iterable[str],
    out_suffix: str = "_ffill",
) -> DataFrame:
    """W1: per entity ordered by ts, nulls replaced by the last earlier non-null."""
    w = _entity_window(entity, ts).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for c in cols:
        df = df.withColumn(c + out_suffix, F.last(c, ignorenulls=True).over(w))
    return df


def backward_fill(
    df: DataFrame,
    entity: str | Sequence[str],
    ts: str,
    cols: Iterable[str],
    out_suffix: str = "_bfill",
) -> DataFrame:
    """W2: nulls replaced by the first LATER non-null. Leakage-unsafe; labels only."""
    w = _entity_window(entity, ts).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    for c in cols:
        df = df.withColumn(c + out_suffix, F.first(c, ignorenulls=True).over(w))
    return df


def lag_features(
    df: DataFrame,
    entity: str | Sequence[str],
    ts: str,
    cols: Iterable[str],
    lags: Sequence[int] = (1,),
    leads: Sequence[int] = (),
) -> DataFrame:
    """W3: c_lag{k} / c_lead{k} per entity ordered by ts (leads = labels only)."""
    w = _entity_window(entity, ts)
    exprs = []
    for c in cols:
        for k in lags:
            exprs.append(F.lag(c, k).over(w).alias(f"{c}_lag{k}"))
        for k in leads:
            exprs.append(F.lead(c, k).over(w).alias(f"{c}_lead{k}"))
    return df.select("*", *exprs)


def sessionize(
    df: DataFrame,
    entity: str | Sequence[str],
    ts: str,
    gap: str | int | float = "30 minutes",
    session_col: str = "session_id",
) -> DataFrame:
    """W4: new session when the gap since the previous event exceeds ``gap``.

    ``session_col`` is a per-entity ordinal starting at 1 (first event of the
    first session = 1). Timestamp math goes through epoch_micros (TIMESTAMP_NTZ
    rule, SURVEY.md §0.1).
    """
    gap_us = int(parse_duration_seconds(gap) * 1_000_000)
    w = _entity_window(entity, ts)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts_us = epoch_micros(ts)
    prev_us = F.lag(ts_us).over(w)
    is_new = F.when(prev_us.isNull() | ((ts_us - prev_us) > gap_us), 1).otherwise(0)
    return df.withColumn(session_col, F.sum(is_new).over(wsum))


def rolling_aggregates(
    df: DataFrame,
    entity: str | Sequence[str],
    ts: str,
    aggs: dict[str, Sequence[str]],
    window: str | int | float = "1 hour",
    method: str = "frame",
) -> DataFrame:
    """W5: trailing time-range aggregates per entity — events in [t-W, t].

    ``aggs`` maps column → aggregate names among {count,sum,avg,min,max,stddev}.
    Output columns ``{col}_{fn}_{suffix}`` where suffix is the window spec with
    spaces stripped (e.g. value_sum_1hour). Inclusive both ends, matching SQL
    ``RANGE BETWEEN INTERVAL W PRECEDING AND CURRENT ROW``.

    Two physical methods, identical semantics (allclose; tests compare both):

    * ``method="frame"`` (default): one window with a sliding RANGE frame.
      Bit-for-bit the SQL answer (used by the DuckDB-oracle queries). Caveat
      at scale: Spark re-evaluates sliding-frame aggregates per row — O(rows
      × frame) per entity, serial per entity — so a hot key with n rows and
      wide frames costs n·w in ONE task.
    * ``method="prefix"``: decomposable aggregates (count/sum/avg/stddev)
      as running cumulative sums (incremental expanding frame, O(n)) minus
      their value at the window cutoff, fetched via the engine's own as-of
      join (strategy U) at ``t − W − 1µs``. Turns the hot-key cost from
      O(n·w) serial into O(n) — the scalable path for skewed corpora (used
      by the flagship job). Float results are allclose-but-not-bitwise vs
      "frame" (subtraction of prefix sums). min/max do not decompose and
      are rejected under this method.
    """
    win_us = int(parse_duration_seconds(window) * 1_000_000)
    suffix = (
        window.replace(" ", "") if isinstance(window, str) else f"{int(window)}s"
    )
    ents = _as_list(entity)
    if method == "frame":
        order = epoch_micros(ts)
        w = (
            Window.partitionBy(*ents)
            .orderBy(order)
            .rangeBetween(-win_us, 0)
        )
        fns = {
            "count": F.count, "sum": F.sum, "avg": F.avg, "mean": F.avg,
            "min": F.min, "max": F.max, "stddev": F.stddev,
        }
        exprs = [
            fns[n](F.col(c)).over(w).alias(f"{c}_{n}_{suffix}")
            for c, names in aggs.items()
            for n in names
        ]
        return df.select("*", *exprs)
    if method != "prefix":
        raise ValueError(f"unknown rolling method: {method!r}")

    decomposable = {"count", "sum", "avg", "mean", "stddev"}
    bad = [n for ns in aggs.values() for n in ns if n not in decomposable]
    if bad:
        raise ValueError(f"method='prefix' cannot compute {bad}; use method='frame'")

    from engine.asof import asof_join  # local import: asof.py imports this module

    wcum = (
        Window.partitionBy(*ents)
        .orderBy(epoch_micros(ts))
        .rangeBetween(Window.unboundedPreceding, 0)  # peer-inclusive, incremental
    )
    d = df
    partials: list[str] = []

    def add(name, col):
        nonlocal d
        if name not in partials:
            d = d.withColumn(name, col)
            partials.append(name)

    for c, names in aggs.items():
        need = set(names)
        # count partial always needed: it gates the empty-window → NULL rule
        add(f"__cn_{c}", F.count(c).over(wcum))
        if need & {"sum", "avg", "mean", "stddev"}:
            add(f"__cs_{c}", F.sum(c).over(wcum))
        if "stddev" in need:
            add(f"__cq_{c}", F.sum(F.col(c) * F.col(c)).over(wcum))

    cut = "__afg_cutoff_ts"
    state_ts = "__afg_prefix_ts"
    d = d.withColumn(cut, F.timestamp_micros(epoch_micros(ts) - F.lit(win_us + 1)))
    # State rows at tied timestamps carry identical range-frame cums, so the
    # as-of's arbitrary pick among exact ties cannot change the result.
    state = d.select(*ents, F.col(ts).alias(state_ts), *partials)
    joined = asof_join(
        d, state, on=ents, probe_ts=cut, state_ts=state_ts,
        values=partials, suffix="_b", strategy="union",
    )

    def minus(cur, base):
        return F.col(cur) - F.coalesce(F.col(base), F.lit(0))

    out = joined
    for c, names in aggs.items():
        n_w = minus(f"__cn_{c}", f"__cn_{c}_b")
        s_w = minus(f"__cs_{c}", f"__cs_{c}_b") if f"__cs_{c}" in partials else None
        for n in names:
            o = f"{c}_{n}_{suffix}"
            if n == "count":
                out = out.withColumn(o, n_w.cast("long"))
            elif n == "sum":
                out = out.withColumn(o, F.when(n_w > 0, s_w))
            elif n in ("avg", "mean"):
                out = out.withColumn(o, F.when(n_w > 0, s_w / n_w))
            elif n == "stddev":
                q_w = minus(f"__cq_{c}", f"__cq_{c}_b")
                var = (q_w - s_w * s_w / n_w) / (n_w - F.lit(1))
                out = out.withColumn(
                    o,
                    F.when(n_w > 1, F.sqrt(F.greatest(var, F.lit(0.0)))),
                )
    drop = [cut, *partials, *[p + "_b" for p in partials]]
    return out.drop(*drop)


def cumulative_stats(
    df: DataFrame,
    entity: str | Sequence[str],
    ts: str,
    aggs: dict[str, Sequence[str]],
) -> DataFrame:
    """W7: running aggregates per entity since the start of its history."""
    w = _entity_window(entity, ts).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fns = {"count": F.count, "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}
    exprs = [
        fns[n](F.col(c)).over(w).alias(f"{c}_cum{n}")
        for c, names in aggs.items()
        for n in names
    ]
    return df.select("*", *exprs)


def top_k_per_group(
    df: DataFrame,
    keys: str | Sequence[str],
    order_by: str | Column,
    k: int = 1,
    desc: bool = True,
    tiebreak: str | None = None,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """W6/O3: k top rows per group by ``order_by`` (deterministic with tiebreak)."""
    oc = F.col(order_by) if isinstance(order_by, str) else order_by
    order = [oc.desc() if desc else oc.asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*_as_list(keys)).orderBy(*order)
    out = df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def dedup_latest(
    df: DataFrame,
    keys: str | Sequence[str],
    ts: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Latest row per key — the A1 state-dedup step."""
    return top_k_per_group(df, keys, ts, k=1, desc=True, tiebreak=tiebreak)
