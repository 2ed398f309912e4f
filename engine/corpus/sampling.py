"""Corpus sampling + source mixing (SURVEY.md §2.10 C16-C18): the stage a
training-data pipeline runs between dedup/quality-filter and training —
subsample the corpus and re-weight sources to a target mixture.

Requirement source: task brief "add the operations a large-scale
training-data pipeline would need"; the reference repo is empty at v0
(/root/reference/README.md:1), so the semantics are defined here and
pinned by the DuckDB oracles in __spark_entry__.py.

Everything is DETERMINISTIC HASH sampling, never ``rand()``:

  * same sample on re-run / retry / resume — a killed featuregen-style job
    resumes into the identical subset (the checkpoint path requires this);
  * independent of partitioning — repartitioning, AQE re-planning, or a
    different executor count cannot change membership (``rand()`` with a
    seed is per-partition state and breaks on any re-split);
  * portable — md5 hex is identical in Spark and DuckDB, so every
    operator here is hash-exact oracle-checkable.

The per-row coin is the first 16 bits of ``md5(salt|key)`` as an int in
[0, 65536); a rate r keeps rows with coin < floor(r*65536), so rates are
quantized to 1/65536 (documented, exact in both engines).

Scale notes (10^12 rows): membership is a pure per-row JVM expression
pipelined into the scan — no shuffle, no Python. ``weighted_mix``'s only
aggregation is the per-source size total (map-side partial agg to
|sources| rows) joined back by broadcast; fact rows never shuffle.
``exact_k_sample`` is the one windowed op (per-stratum top-k by hash) —
bounded output k·|strata|, same shape as W6 top-k.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

COIN_BITS = 16
COIN_SPACE = 1 << COIN_BITS  # 65536


def _key(key_cols: Sequence[str], salt: str) -> Column:
    """'salt|k1|k2|…' — concat_ws casts numerics to their decimal string
    form exactly like DuckDB's || operator, keeping md5 inputs identical."""
    return F.concat_ws("|", F.lit(salt), *[F.col(c) for c in key_cols])


def sample_coin(key_cols: Sequence[str], salt: str = "afg") -> Column:
    """Deterministic uniform coin in [0, 65536): first 4 hex digits of
    md5(salt|keys) parsed base-16 (conv handles lowercase hex)."""
    return F.conv(F.substring(F.md5(_key(key_cols, salt)), 1, 4), 16, 10).cast("int")


def rate_threshold(rate: float) -> int:
    """floor(rate * 65536), clamped — the integer the coin is compared to.
    Computed driver-side so Spark and the SQL oracle share one literal."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return min(COIN_SPACE, int(rate * COIN_SPACE))


def hash_sample(
    df: DataFrame,
    rate: float,
    key_cols: Sequence[str] = ("doc_id",),
    salt: str = "afg",
) -> DataFrame:
    """Bernoulli(rate) sample, deterministic in the row key. rate is
    quantized to 1/65536."""
    return df.where(sample_coin(key_cols, salt) < F.lit(rate_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    key_cols: Sequence[str] = ("doc_id",),
    salt: str = "afg",
) -> DataFrame:
    """Per-stratum Bernoulli rates (e.g. keep 100% of wiki, 10% of web).
    The threshold CASE is over |rates| literals — whole-stage-codegen'd,
    no join, no shuffle."""
    thr = F.lit(rate_threshold(default_rate))
    for stratum, r in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == stratum, F.lit(rate_threshold(r))).otherwise(thr)
    return df.where(sample_coin(key_cols, salt) < thr)


def exact_k_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    key_cols: Sequence[str] = ("doc_id",),
    salt: str = "afg",
    out: str = "sample_rank",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum: uniform-without-
    replacement via rank by the hash coin (full md5, key tie-break —
    total order, so the set is unique). The fixed-size counterpart of
    ``stratified_sample`` for eval/holdout sets. One window shuffle keyed
    on the stratum; output bounded by k·|strata|."""
    order = [F.md5(_key(key_cols, salt))] + [F.col(c) for c in key_cols]
    w = Window.partitionBy(strata_col).orderBy(*order)
    return (
        df.withColumn(out, F.row_number().over(w))
        .where(F.col(out) <= k)
    )


def weighted_mix(
    df: DataFrame,
    weights: Mapping[str, float],
    source_col: str = "source",
    size_col: str = "n_chars",
    key_cols: Sequence[str] = ("doc_id",),
    salt: str = "afg",
) -> DataFrame:
    """Downsample sources to a target mixture: given target share
    ``weights[s]`` (by ``size_col`` mass, e.g. chars/tokens) and observed
    per-source totals T_s, the largest achievable corpus without
    upsampling is C = min_s(T_s / w_s); each source keeps
    rate_s = least(1, (w_s * C) / T_s) — the binding source keeps
    everything, the rest downsample to proportion. Sources absent from
    ``weights`` are dropped.

    The rate arithmetic is a fixed tree of IEEE-double ops (divide, min,
    multiply, least, floor — each correctly rounded), mirrored verbatim in
    the DuckDB oracle, so membership is bit-reproducible cross-engine.

    Emits the sampled rows plus ``mix_rate`` (the per-source keep rate).
    Scale: totals = partial agg to |sources| rows; the per-source rate
    table is broadcast back; membership is a per-row JVM expression — fact
    rows never shuffle.
    """
    wmap = F.create_map(*[F.lit(x) for kv in sorted(weights.items()) for x in kv])
    totals = (
        df.groupBy(source_col)
        .agg(F.sum(F.col(size_col)).cast("double").alias("_T"))
        .withColumn("_w", wmap[F.col(source_col)])
        .where(F.col("_w").isNotNull())
    )
    # C = min_s(T_s / w_s) over the tiny totals frame (|sources| rows)
    c_min = F.min(F.col("_T") / F.col("_w")).over(Window.partitionBy())
    rates = totals.withColumn(
        "mix_rate", F.least(F.lit(1.0), (F.col("_w") * c_min) / F.col("_T"))
    ).select(source_col, "mix_rate")
    return (
        df.join(F.broadcast(rates), source_col)
        .where(
            sample_coin(key_cols, salt)
            < F.floor(F.col("mix_rate") * F.lit(float(COIN_SPACE))).cast("int")
        )
    )
