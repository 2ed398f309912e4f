"""Deterministic synthetic corpus generator (SURVEY.md §2.1 S4, FIXTURES.md §B).

Fully distributed: ``spark.range(n)`` + JVM ``xxhash64`` counter hashing — no
wall clock, no ``rand()``, no driver-side loops, so the same ``(n, seed)``
always produces byte-identical tables at any parallelism (determinism test
§5.7) and generation itself scales linearly with executors.

Tables (shape binding per BASELINE.json:15):
  sequences(doc_id string, tokens array<int32> not-null-elements, n_tok int32,
            source string)   — source is Zipf-skewed: src0 ≈ 50% of rows.
  seq_events(doc_id, ts, fvalue double ~10% null, fcat string) — ~EVENTS_PER_DOC
            per doc plus one hot entity holding ~20% of all events.
  probes(doc_id, asof_ts) — entity×timestamp requests: exact ties, between
            events, before-first, after-last.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS = "2024-01-01 00:00:00"
BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch micros
DAY_US = 86_400_000_000
EVENTS_PER_DOC = 8
MAX_TOKENS = 512
VOCAB = 32768


def _h(seed: int, *cols) -> F.Column:
    """Non-negative deterministic 64-bit counter hash."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def doc_id_for(idx_col) -> F.Column:
    return F.format_string("doc%012d", idx_col.cast("long"))


def _default_parts(spark: SparkSession, n_rows: int) -> int:
    """Scale with the cluster (defaultParallelism), bounded by sensible
    per-task row counts so tiny inputs don't pay 100 empty tasks."""
    return max(2, min(spark.sparkContext.defaultParallelism * 2, max(1, n_rows // 10_000)))


def gen_sequences(
    spark: SparkSession, n_rows: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    df = spark.range(0, n_rows, numPartitions=partitions or _default_parts(spark, n_rows))
    i = F.col("id")
    length = (F.lit(1) + _h(seed, i, F.lit("len")) % MAX_TOKENS).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), length),
        lambda j: (_h(seed, i, j) % VOCAB).cast("int"),
    )
    src_u = _h(seed, i, F.lit("src")) % 100
    source = F.when(src_u < 50, F.lit("src0")).otherwise(
        F.concat(F.lit("src"), (F.lit(1) + src_u % 9).cast("string"))
    )
    return df.select(
        doc_id_for(i).alias("doc_id"),
        tokens.alias("tokens"),
        F.size(tokens).cast("int").alias("n_tok"),
        source.alias("source"),
    )


def gen_seq_events(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    events_per_doc: int = EVENTS_PER_DOC,
    hot_frac_pct: int = 20,
    null_frac_pct: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    n_rows = n_docs * events_per_doc
    df = spark.range(0, n_rows, numPartitions=partitions or _default_parts(spark, n_rows))
    i = F.col("id")
    hot = _h(seed, i, F.lit("hot")) % 100 < hot_frac_pct
    doc_idx = F.when(hot, F.lit(0)).otherwise(_h(seed, i, F.lit("docpick")) % n_docs)
    # Event times: spread over 30 days; quantized to whole seconds so probe ties
    # are constructible; per-doc bursts (gap > session gap) via a day-level and
    # an in-day component.
    off_us = (
        (_h(seed, i, F.lit("day")) % 30) * DAY_US
        + (_h(seed, i, F.lit("sec")) % 86_400) * 1_000_000
    )
    ts = F.timestamp_micros(F.lit(BASE_US) + off_us).cast("timestamp_ntz")
    fvalue = F.when(
        _h(seed, i, F.lit("fnull")) % 100 < null_frac_pct, F.lit(None).cast("double")
    ).otherwise((_h(seed, i, F.lit("fv")) % 1_000_000).cast("double") / 1000.0)
    fcat = F.concat(F.lit("cat"), (_h(seed, i, F.lit("fcat")) % 5).cast("string"))
    return df.select(
        doc_id_for(doc_idx).alias("doc_id"),
        ts.alias("ts"),
        fvalue.alias("fvalue"),
        fcat.alias("fcat"),
    )


def gen_probes(
    spark: SparkSession,
    n_docs: int,
    n_probes: int,
    seed: int = 42,
    events_per_doc: int = EVENTS_PER_DOC,
    hot_frac_pct: int = 20,
) -> DataFrame:
    """Probe set reconstructing event timestamps arithmetically (no join needed):
    each probe picks a source event index and derives its exact ts the same way
    gen_seq_events does — giving exact-tie cases — or perturbs it.
    """
    df = spark.range(0, n_probes)
    p = F.col("id")
    src_i = _h(seed, p, F.lit("pick")) % F.lit(n_docs * events_per_doc)
    hot = _h(seed, src_i, F.lit("hot")) % 100 < hot_frac_pct
    doc_idx = F.when(hot, F.lit(0)).otherwise(_h(seed, src_i, F.lit("docpick")) % n_docs)
    ev_us = F.lit(BASE_US) + (
        (_h(seed, src_i, F.lit("day")) % 30) * DAY_US
        + (_h(seed, src_i, F.lit("sec")) % 86_400) * 1_000_000
    )
    kind = _h(seed, p, F.lit("kind")) % 4
    asof_us = (
        F.when(kind == 0, ev_us)                            # exact tie
        .when(kind == 1, ev_us + 1_000_000)                 # just after
        .when(kind == 2, F.lit(BASE_US - 3_600_000_000))    # before first
        .otherwise(F.lit(BASE_US + 40 * DAY_US))            # after last
    )
    return df.select(
        doc_id_for(doc_idx).alias("doc_id"),
        F.timestamp_micros(asof_us).cast("timestamp_ntz").alias("asof_ts"),
    )
