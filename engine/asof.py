"""Point-in-time (as-of) join — the engine's core operator.

Requirement: BASELINE.json:6 — "sorted-partition as-of merge (range-partition by
entity hash, secondary sort by event timestamp, merge-join with last-known-value
semantics)" with zero temporal leakage (BASELINE.json:14). SURVEY.md §2.3 A1/A2.

Two physical strategies, identical semantics (tests assert equality):

* ``strategy="union"`` (default, pure JVM): tag the two sides, ``unionByName``,
  one window ``last(payload, ignorenulls).over(partitionBy(entity).orderBy(ts,
  tie))``, keep probe rows. ONE shuffle, whole-stage-codegen friendly, no
  Python worker — the fast path at 10^12 rows.

* ``strategy="merge"`` (the spec-named sorted-partition merge): hash-partition
  both sides by entity (cogroup), secondary-sort by event time inside each
  group, ``pd.merge_asof`` per group in an Arrow-batched Python stage. Kept as
  the named-by-spec physical plan and as an independent implementation for the
  equivalence test; also the extension point for merge kernels pandas has but
  SQL windows don't.

Last-known-value semantics match ``pd.merge_asof(direction='backward')``: the
probe receives the values of the most recent state ROW (which may itself hold
nulls) — not the most recent non-null per column (that is ``forward_fill``).
``strict=True`` excludes state rows at exactly the probe timestamp
(``allow_exact_matches=False``), the label-safe tie policy.

Temporal-leakage proof sketch: a probe row's window frame is
``rowsBetween(unboundedPreceding, 0)`` over ordering ``(ts, tie)`` — no state
row with ``ts > probe.ts`` (or ``>=`` when strict) can enter the frame, so no
feature reads data past its as-of timestamp. The property test in
tests/test_leakage.py verifies this by mutating/deleting future rows.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from engine.tstools import epoch_micros

_TAG = "__afg_is_probe"
_PAYLOAD = "__afg_payload"
_TS_KEY = "__afg_ts_key"


def _as_list(x: str | Sequence[str]) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def asof_join(
    probes: DataFrame,
    state: DataFrame,
    on: str | Sequence[str],
    probe_ts: str = "ts",
    state_ts: str | None = None,
    values: Iterable[str] | None = None,
    strict: bool = False,
    strategy: str = "union",
    suffix: str = "",
    include_state_ts: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Backward as-of join: each probe row gains the latest state values.

    Args:
        probes: left side — (entity, probe_ts, any payload columns).
        state: right side — (entity, state_ts, value columns).
        on: entity key column(s), present on both sides.
        probe_ts / state_ts: event-time columns (state_ts defaults to probe_ts).
        values: state columns to fetch (default: all but key + ts).
        strict: True → only state with ts strictly < probe ts (no exact ties).
        strategy: "union" (JVM window) or "merge" (cogrouped pd.merge_asof).
        suffix: appended to fetched value column names (collision control).
        include_state_ts: if set, also emit the matched state timestamp under
            this name (null when no match).
        num_partitions: explicit shuffle width for the merge strategy.
    """
    keys = _as_list(on)
    state_ts = state_ts or probe_ts
    if values is None:
        values = [c for c in state.columns if c not in set(keys) | {state_ts}]
    values = list(values)
    out_names = [v + suffix for v in values]

    if strategy == "union":
        return _asof_union(
            probes, state, keys, probe_ts, state_ts, values, out_names,
            strict, include_state_ts,
        )
    if strategy == "merge":
        return _asof_merge(
            probes, state, keys, probe_ts, state_ts, values, out_names,
            strict, include_state_ts, num_partitions,
        )
    raise ValueError(f"unknown asof strategy: {strategy!r}")


def _asof_union(
    probes: DataFrame,
    state: DataFrame,
    keys: list[str],
    probe_ts: str,
    state_ts: str,
    values: list[str],
    out_names: list[str],
    strict: bool,
    include_state_ts: str | None,
) -> DataFrame:
    probe_cols = probes.columns
    # State rows carry their values inside ONE struct so "last state ROW" is
    # well-defined even when individual value columns are null (merge_asof
    # parity); the struct itself is null on probe rows, so ignorenulls skips
    # probes but never skips a state row.
    payload = F.struct(
        *[F.col(v).alias(n) for v, n in zip(values, out_names)],
        F.col(state_ts).cast("timestamp").alias("__state_ts"),
    )
    state_side = state.select(
        *[F.col(k) for k in keys],
        epoch_micros(state_ts).alias(_TS_KEY),
        F.lit(0).alias(_TAG),
        payload.alias(_PAYLOAD),
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c)
          for c in probe_cols if c not in keys],
    )
    probe_side = probes.select(
        *[F.col(k) for k in keys],
        epoch_micros(probe_ts).alias(_TS_KEY),
        F.lit(1).alias(_TAG),
        F.lit(None).cast(state_side.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[F.col(c) for c in probe_cols if c not in keys],
    )
    unioned = state_side.unionByName(probe_side)

    # Tie policy via the secondary sort key: inclusive → state (0) sorts before
    # probe (1) at equal ts, so an exact-tie state row is inside the probe's
    # frame; strict → probe first, exact ties excluded.
    tie = F.col(_TAG).asc() if not strict else F.col(_TAG).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_TS_KEY).asc(), tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))

    out = matched.where(F.col(_TAG) == 1).select(
        *keys,
        *[c for c in probe_cols if c not in keys],
        *[F.col(f"{_PAYLOAD}.{n}").alias(n) for n in out_names],
        *( [F.col(f"{_PAYLOAD}.__state_ts").alias(include_state_ts)]
           if include_state_ts else [] ),
    )
    return out


def _asof_merge(
    probes: DataFrame,
    state: DataFrame,
    keys: list[str],
    probe_ts: str,
    state_ts: str,
    values: list[str],
    out_names: list[str],
    strict: bool,
    include_state_ts: str | None,
    num_partitions: int | None,
) -> DataFrame:
    import pyspark.sql.types as T

    probe_cols = probes.columns
    ts_alias = "__mstate_ts"
    # Explicit pruning before the Python stage (SURVEY.md §4: Catalyst cannot
    # prune through applyInPandas). Rename state columns to be disjoint from
    # probe columns FIRST: cogroup drops right-side columns that collide with
    # left-side names (observed on Spark 4.1).
    state_sel = state.select(
        *keys,
        F.col(state_ts).alias(ts_alias),
        *[F.col(v).alias(n) for v, n in zip(values, out_names)],
    )
    probe_sel = probes.select(*probe_cols)

    out_fields = list(probes.schema.fields) + [
        T.StructField(n, state.schema[v].dataType, True)
        for v, n in zip(values, out_names)
    ]
    if include_state_ts:
        out_fields.append(T.StructField(include_state_ts, T.TimestampNTZType(), True))
    out_schema = T.StructType(out_fields)
    out_cols = [f.name for f in out_fields]
    if set(out_names) & set(probe_cols):
        raise ValueError(
            f"merge strategy needs disjoint output names; pass a suffix "
            f"(collisions: {sorted(set(out_names) & set(probe_cols))})"
        )
    allow_exact = not strict

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=out_cols)
        if right.empty:
            # Spark may pass an empty, even column-less, frame when this key
            # has no state rows: all fetched values are null.
            out = left.copy()
            for n in out_names:
                out[n] = None
            if include_state_ts:
                out[include_state_ts] = pd.NaT
            return out[out_cols]
        left = left.sort_values(probe_ts, kind="mergesort")
        if include_state_ts:
            right[include_state_ts] = right[ts_alias]
        right = right.drop(columns=keys).sort_values(ts_alias, kind="mergesort")
        merged = pd.merge_asof(
            left,
            right,
            left_on=probe_ts,
            right_on=ts_alias,
            direction="backward",
            allow_exact_matches=allow_exact,
        )
        return merged[out_cols]

    lg = probe_sel.groupBy(*keys)
    rg = state_sel.groupBy(*keys)
    result = lg.cogroup(rg).applyInPandas(merge, schema=out_schema)
    return result
