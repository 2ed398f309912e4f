"""Structured Streaming analogues of the batch window family
(SURVEY.md §2.8). The north_rule workload is batch; these keep the
engine streaming-portable with the same entity/event-time semantics:

| batch op (window_ops)        | streaming op here                         |
|------------------------------|-------------------------------------------|
| temporal cutoff / late data  | ``with_watermark``                        |
| rolling_aggregates (W5)      | ``windowed_agg`` (tumbling/sliding)       |
| sessionize (W4)              | ``session_window_agg`` (works in batch too)|
| forward_fill / as-of state   | ``stateful_ffill`` (applyInPandasWithState)|
| exact dedup (C1) / replay    | ``streaming_exact_dedup`` (watermark state) |

Scale notes: streaming state is keyed by entity — the same hash
partitioning as the batch windows, so the shuffle profile is identical;
watermarks bound state size (late rows beyond the delay are dropped
instead of growing state forever).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def _as_event_time(df: DataFrame, ts: str) -> DataFrame:
    """Watermarks require TIMESTAMP; driver testdata is TIMESTAMP_NTZ
    (SURVEY.md §0.1). With the session TZ pinned to UTC the cast is a
    wall-clock no-op."""
    if dict(df.dtypes).get(ts) == "timestamp_ntz":
        return df.withColumn(ts, F.col(ts).cast("timestamp"))
    return df


def with_watermark(df: DataFrame, ts: str, delay: str = "1 hour") -> DataFrame:
    """Late-data cutoff: rows later than ``delay`` behind the max seen
    event time are dropped from stateful operators — the streaming form
    of the temporal cutoff filter (P3)."""
    return _as_event_time(df, ts).withWatermark(ts, delay)


def windowed_agg(
    df: DataFrame, entity: str, ts: str, aggs: dict[str, list[str]],
    window: str, slide: str | None = None, watermark: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, if ``slide``) windowed aggregate per entity —
    the discrete-time analogue of rolling_aggregates. Works identically on
    batch and streaming DataFrames."""
    if watermark is not None:
        df = with_watermark(df, ts, watermark)
    win = F.window(ts, window, slide) if slide else F.window(ts, window)
    exprs = [
        getattr(F, fn)(c).alias(f"{c}_{fn}")
        for c, fns in aggs.items()
        for fn in fns
    ]
    return df.groupBy(win.alias("win"), F.col(entity)).agg(*exprs).select(
        entity, F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"), *
        [f"{c}_{fn}" for c, fns in aggs.items() for fn in fns]
    )


def session_window_agg(
    df: DataFrame, entity: str, ts: str, gap: str,
    aggs: dict[str, list[str]] | None = None, watermark: str | None = None,
) -> DataFrame:
    """Gap-based session aggregation via ``F.session_window`` — the native
    streaming form of W4 sessionize (also valid in batch: a new session
    starts when the gap since the previous event is ≥ gap; window end =
    last event + gap). Emits one row per (entity, session)."""
    if watermark is not None:
        df = with_watermark(df, ts, watermark)
    exprs = [F.count(F.lit(1)).alias("n_events")]
    for c, fns in (aggs or {}).items():
        exprs += [getattr(F, fn)(c).alias(f"{c}_{fn}") for fn in fns]
    return (
        df.groupBy(F.session_window(F.col(ts), gap).alias("sw"), F.col(entity))
        .agg(*exprs)
        .select(
            entity,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            *[e for e in ["n_events"]],
            *[f"{c}_{fn}" for c, fns in (aggs or {}).items() for fn in fns],
        )
    )


def streaming_exact_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts: str | None = None,
    watermark: str = "24 hours",
) -> DataFrame:
    """Streaming analogue of C1 exact dedup (and of exactly-once event
    replay protection): keep the first occurrence of each key across
    micro-batches. For content dedup pass a hash key column (e.g.
    ``md5(text)``), exactly like the batch operator.

    With ``ts`` set, uses ``dropDuplicatesWithinWatermark`` — dedup state
    is EVICTED once the watermark passes a key's event time, so state size
    is bounded by the key arrival rate × delay instead of growing with the
    corpus (the only viable mode on an unbounded stream; a duplicate
    arriving later than ``watermark`` after its first occurrence re-emits,
    which is the documented trade). Without ``ts``, plain ``dropDuplicates``
    keeps exact all-time state (bounded key domains only). Works on batch
    DataFrames too, where both forms reduce to DISTINCT-by-key."""
    if ts is not None:
        return with_watermark(df, ts, watermark).dropDuplicatesWithinWatermark(key_cols)
    return df.dropDuplicates(key_cols)


def stateful_ffill(
    df: DataFrame, entity: str, ts: str, cols: list[str],
    out_schema: StructType, watermark: str = "1 hour",
):
    """Custom stateful operator: last-known-value carry-forward across
    micro-batches via ``applyInPandasWithState`` keyed by entity — the
    streaming analogue of forward_fill / the as-of state side.

    State = the last (ts, values) seen per entity; each batch's rows are
    sorted by event time, nulls filled from state, state updated to the
    batch's final row. Output mode: update."""

    fields = [f.name for f in out_schema.fields]

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last = dict(zip(cols, state.get)) if state.exists else {c: None for c in cols}
        for pdf in pdfs:
            pdf = pdf.sort_values(ts).reset_index(drop=True)
            for c in cols:
                # vectorized carry-forward seeded with the cross-batch state.
                # The working column is coerced to float64 first: seeding an
                # int-dtyped batch column (a long column with no nulls in
                # this micro-batch) with a None/NaN state would otherwise
                # raise while constructing the int-dtyped seed Series and
                # crash the streaming query (round-1 advice fix). The state
                # struct is double-typed, so float64 is the native carrier.
                seeded = pd.concat(
                    [pd.Series([last[c]], dtype="float64"),
                     pdf[c].astype("float64")],
                    ignore_index=True,
                )
                filled = seeded.ffill().iloc[1:].reset_index(drop=True)
                pdf[c + "_f"] = filled
                last[c] = filled.iloc[-1] if len(filled) else last[c]
            yield pdf[fields]
        state.update(tuple(last[c] for c in cols))

    return df.groupBy(entity).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=", ".join(f"{c} double" for c in cols),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def file_stream(spark, path: str, schema: StructType, fmt: str = "parquet") -> DataFrame:
    """File-source stream (one file per micro-batch) — the sandbox stand-in
    for a Kafka/Iceberg-CDC source."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "update"
) -> DataFrame:
    """Drain a stream with trigger(availableNow) into an in-memory sink and
    return the sink table (test/driver harness helper). Aggregations want
    ``output_mode='complete'`` so unclosed windows still emit."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.sql(f"SELECT * FROM {query_name}")
