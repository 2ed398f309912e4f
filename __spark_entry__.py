"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-time feature pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL the driver compares against at
sf0.01 (row-count + schema + order-insensitive value-hash).

Float discipline for hash-exact comparison: aggregate sums go through
DECIMAL(18,2) (exact in both engines, cast to double at the end); copied
values (as-of / lag / ffill) are bit-exact by construction; per-row arithmetic
on identical operands (min-max normalize) is IEEE-deterministic. Sum-order-
dependent float aggregates (stddev and friends) are covered by the pytest
allclose suite instead (tests/, SURVEY.md §5.1).

Dialect notes: Spark ``dayofweek`` = DuckDB ``dayofweek + 1`` (Sunday base 1 vs
0); timestamps are TIMESTAMP_NTZ in Spark, naive TIMESTAMP in DuckDB —
identical wall-clock values with session TZ pinned to UTC.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.asof import asof_join
from engine.io import read_table
from engine.skew import dim_grouped_agg, salted_join, two_level_agg
from engine.transforms.column import direct_features, minmax_normalize
from engine.transforms.row import apply_row_features
from engine.transforms.table import agg_features
from engine.tstools import epoch_micros
from engine.window_ops import (
    backward_fill,
    cumulative_stats,
    forward_fill,
    lag_features,
    rolling_aggregates,
    sessionize,
    top_k_per_group,
)

SF0001 = "/root/testdata/sf0.001"


def _events(spark, sf_dir):
    return read_table(spark, sf_dir, "events")


def _probe_state(spark, sf_dir):
    """Split events into probes (clicks) and state (everything else)."""
    e = _events(spark, sf_dir)
    probes = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    state = e.where(F.col("event_type") != "click").select(
        "user_id", "ts", "value", F.col("event_type").alias("etype")
    )
    return probes, state


_PROBE_STATE_SQL = """
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
s AS (SELECT user_id, ts, value, event_type AS etype FROM events WHERE event_type <> 'click')
"""

# events with deterministic nulls injected (ffill/bfill fixture: errors lose value)
_NULLS_SQL = """
e AS (SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_n
      FROM events)
"""


def _events_with_nulls(spark, sf_dir):
    return _events(spark, sf_dir).select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_type") == "error", None).otherwise(F.col("value")).alias("value_n"),
    )


# ---------------------------------------------------------------- queries ----

def q_asof_union(spark, sf_dir):
    probes, state = _probe_state(spark, sf_dir)
    return asof_join(
        probes, state, on="user_id", probe_ts="ts", state_ts="ts",
        values=["value", "etype"], suffix="_last", strategy="union",
    )


def q_asof_merge(spark, sf_dir):
    probes, state = _probe_state(spark, sf_dir)
    return asof_join(
        probes, state, on="user_id", probe_ts="ts", state_ts="ts",
        values=["value", "etype"], suffix="_last", strategy="merge",
    )


def q_asof_bucketed(spark, sf_dir):
    """A1b: skew-proof as-of (window over (entity, time bucket) + cross-bucket
    carry) — identical semantics to asof_union, hot keys parallelized."""
    probes, state = _probe_state(spark, sf_dir)
    return asof_join(
        probes, state, on="user_id", probe_ts="ts", state_ts="ts",
        values=["value", "etype"], suffix="_last", strategy="bucketed",
        bucket="6 hours",
    )


def q_asof_strict(spark, sf_dir):
    probes, state = _probe_state(spark, sf_dir)
    return asof_join(
        probes, state, on="user_id", probe_ts="ts", state_ts="ts",
        values=["value", "etype"], suffix="_last", strict=True, strategy="union",
    )


def q_ffill(spark, sf_dir):
    e = _events_with_nulls(spark, sf_dir)
    return forward_fill(e, "user_id", "ts", ["value_n"], out_suffix="_f")


def q_bfill(spark, sf_dir):
    e = _events_with_nulls(spark, sf_dir)
    return backward_fill(e, "user_id", "ts", ["value_n"], out_suffix="_b")


def q_lag_lead(spark, sf_dir):
    e = _events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    return lag_features(e, "user_id", "ts", ["value"], lags=[1, 2], leads=[1])


def q_sessionize(spark, sf_dir):
    e = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    return sessionize(e, "user_id", "ts", gap="30 minutes")


def q_session_agg(spark, sf_dir):
    e = _events(spark, sf_dir).select("user_id", "ts", "value")
    s = sessionize(e, "user_id", "ts", gap="30 minutes")
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(epoch_micros("ts")) - F.min(epoch_micros("ts"))).alias("span_us"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
    )


def q_rolling_1h(spark, sf_dir):
    e = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts", F.col("value").cast("decimal(18,2)").alias("vdec")
    )
    r = rolling_aggregates(e, "user_id", "ts", {"vdec": ["count", "sum"]}, window="1 hour")
    return r.select(
        "event_id", "user_id", "ts",
        F.col("vdec_count_1hour").alias("n_1h"),
        F.col("vdec_sum_1hour").cast("double").alias("sum_1h"),
    )


def q_cumulative(spark, sf_dir):
    e = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts", F.col("value").cast("decimal(18,2)").alias("vdec")
    )
    c = cumulative_stats(e, "user_id", "ts", {"vdec": ["sum", "count"]})
    return c.select(
        "event_id", "user_id", "ts",
        F.col("vdec_cumsum").cast("double").alias("cum_sum"),
        F.col("vdec_cumcount").alias("cum_n"),
    )


def q_topk_latest(spark, sf_dir):
    e = _events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    return top_k_per_group(e, "user_id", "ts", k=3, desc=True, tiebreak="event_id")


def q_direct_features(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    return direct_features(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        customer, fk="o_custkey", parent_key="c_custkey",
        cols=["c_mktsegment", "c_acctbal"], prefix="cust_",
    )


def q_agg_features(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").withColumn(
        "pdec", F.col("o_totalprice").cast("decimal(18,2)")
    )
    a = agg_features(orders, "o_custkey", {"o_orderkey": ["count"], "pdec": ["sum", "min", "max"]})
    return a.select(
        "o_custkey",
        F.col("o_orderkey_count").alias("n_orders"),
        F.col("pdec_sum").cast("double").alias("total_spend"),
        F.col("pdec_min").cast("double").alias("min_price"),
        F.col("pdec_max").cast("double").alias("max_price"),
    )


def q_two_level_agg(spark, sf_dir):
    e = _events(spark, sf_dir).withColumn("vdec", F.col("value").cast("decimal(18,2)"))
    a = two_level_agg(e, "event_type", {"vdec": ["count", "sum"]}, buckets=8, unique_col="event_id")
    return a.select(
        "event_type",
        F.col("vdec_count").alias("n"),
        F.col("vdec_sum").cast("double").alias("value_sum"),
    )


def q_dim_grouped_agg(spark, sf_dir):
    """G2b (engine/skew.py::dim_grouped_agg): group fact rows by a DIMENSION
    attribute without shuffling the fact rows through the join — the fact is
    pre-aggregated at the join key's grain (map-side combine collapses a hot
    custkey to one row per input partition), the ~|dim|-row partial frame
    joins the dim, and the final merge runs on the attribute. This is the
    flagship's per-source-stats plan (bench.py): the round-2 version
    shuffled every feature row through a hot/cold-split join + salted agg
    and scaled at ~0.6 eff 4→16 cores; this shape shuffles ~|keys| narrow
    partial rows instead. DECIMAL sums keep the cross-engine hash exact."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    a = dim_grouped_agg(
        orders, cust, on="o_custkey", group_keys="c_mktsegment",
        agg_specs={"price": ["count", "sum", "min", "max"]},
    )
    return a.select(
        "c_mktsegment",
        F.col("price_count").alias("n_orders"),
        F.col("price_sum").cast("double").alias("revenue"),
        F.col("price_min").cast("double").alias("min_price"),
        F.col("price_max").cast("double").alias("max_price"),
    )


def q_salted_join(spark, sf_dir):
    e = _events(spark, sf_dir)
    dim = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("type_count"))
    j = salted_join(
        e.select("event_id", "event_type"), dim, on="event_type",
        buckets=8, fact_unique_col="event_id",
    )
    return j.select("event_id", "event_type", "type_count")


def q_minmax(spark, sf_dir):
    e = _events(spark, sf_dir).select("event_id", "value")
    return minmax_normalize(e, ["value"], suffix="_mm")


def q_row_features_text(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    out = apply_row_features(
        d.select("doc_id", "text", "n_chars"),
        [
            ("text_len", "length", "text"),
            ("n_words", "n_words", "text"),
            ("n_digits", "n_digits", "text"),
        ],
    )
    return out.withColumn(
        "n_unique_words", F.size(F.array_distinct(F.split(F.col("text"), " ")))
    ).drop("text")


def q_row_features_time(spark, sf_dir):
    e = _events(spark, sf_dir)
    return apply_row_features(
        e.select("event_id", "ts", "value"),
        [
            ("h", "hour", "ts"),
            ("dw", "dayofweek", "ts"),
            ("mo", "month", "ts"),
            ("wknd", "is_weekend", "ts"),
        ],
    ).withColumn("v_log1p", F.round(F.log1p(F.col("value")), 6))


def q_json_extract(spark, sf_dir):
    e = _events(spark, sf_dir)
    return apply_row_features(e.select("event_id", "props"), [("k", "json_k", "props")])


def q_distinct_users(spark, sf_dir):
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_rollup_events(spark, sf_dir):
    e = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    return (
        e.rollup("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", F.date_format("day", "yyyy-MM-dd").alias("day"), "n")
    )


def q_semi_anti(spark, sf_dir):
    """Parts that ever shipped (left_semi) vs never shipped (left_anti)."""
    part = read_table(spark, sf_dir, "part").select("p_partkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    cond = part["p_partkey"] == li["l_partkey"]
    shipped = part.join(li, cond, "left_semi").withColumn("shipped", F.lit(1))
    never = part.join(li, cond, "left_anti").withColumn("shipped", F.lit(0))
    return shipped.unionByName(never)


_FLAGSHIP_ORACLE_ROOT = "/tmp/afg_flagship_oracle_n2000_s42"


def _flagship_corpus(spark) -> str:
    """Materialize the deterministic synthetic corpus ONCE so the Spark query
    and the DuckDB oracle read byte-identical parquet files (datagen is pure
    counter-hashing — engine/datagen.py — but shared files remove even the
    regeneration step from the trust base)."""
    import os

    root = _FLAGSHIP_ORACLE_ROOT
    done = os.path.join(root, "_DONE")
    if not os.path.exists(done):
        from engine.datagen import gen_probes, gen_seq_events, gen_sequences

        n_docs = 2000
        gen_sequences(spark, n_docs, seed=42, partitions=8).select(
            "doc_id", "n_tok", "source"
        ).write.mode("overwrite").parquet(os.path.join(root, "sequences"))
        gen_seq_events(spark, n_docs, seed=42, partitions=8).write.mode(
            "overwrite"
        ).parquet(os.path.join(root, "seq_events"))
        gen_probes(spark, n_docs, 4000, seed=42).write.mode("overwrite").parquet(
            os.path.join(root, "probes")
        )
        with open(done, "w") as fh:
            fh.write("ok\n")
    return root


def q_flagship_sequences(spark, sf_dir):
    """Flagship pipeline over the synthetic tokenized corpus — hash-exact vs
    DuckDB (r3 verdict #5; was rows-only). Both engines read the byte-
    identical parquet from ``_flagship_corpus``. State is deduped to one row
    per (doc_id, ts) with a deterministic max tie-break and probes to
    DISTINCT, so as-of/lag tie ordering is well-defined (the raw fixture
    plants duplicate ties deliberately — those stay covered by asof_union's
    tie oracle). The 1-day trailing sum goes through DECIMAL(18,3) (fvalue
    has exactly 3 decimals) so it is exact in both engines."""
    import os

    root = _flagship_corpus(spark)
    seqs = spark.read.parquet(os.path.join(root, "sequences"))
    ev0 = spark.read.parquet(os.path.join(root, "seq_events"))
    probes = spark.read.parquet(os.path.join(root, "probes")).distinct()
    w = Window.partitionBy("doc_id", "ts").orderBy(
        F.coalesce(F.col("fvalue"), F.lit(-1.0)).desc(), F.col("fcat").desc()
    )
    ev = (
        ev0.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "doc_id", "ts", "fvalue",
            F.col("fvalue").cast("decimal(18,3)").alias("fvdec"), "fcat",
        )
    )
    feat = asof_join(
        probes, ev, on="doc_id", probe_ts="asof_ts", state_ts="ts",
        values=["fvalue", "fvdec", "fcat"], suffix="_last",
    )
    feat = lag_features(feat, "doc_id", "asof_ts", ["fvalue_last"], lags=[1])
    feat = sessionize(feat, "doc_id", "asof_ts", gap="1 hour")
    feat = rolling_aggregates(
        feat, "doc_id", "asof_ts", {"fvdec_last": ["count", "sum"]},
        window="1 day", method="frame",
    )
    out = feat.join(seqs, "doc_id", "left")
    return out.select(
        "doc_id", "asof_ts", "fvalue_last", "fcat_last",
        F.col("fvalue_last_lag1").alias("fvalue_lag1"),
        "session_id",
        F.col("fvdec_last_count_1day").alias("n_1d"),
        F.col("fvdec_last_sum_1day").cast("double").alias("sum_1d"),
        "n_tok", "source",
    )


_FLAGSHIP_SQL = f"""
WITH ev0 AS (SELECT * FROM read_parquet('{_FLAGSHIP_ORACLE_ROOT}/seq_events/*.parquet')),
evr AS (
  SELECT doc_id, ts, fvalue, CAST(fvalue AS DECIMAL(18,3)) AS fvdec, fcat,
         row_number() OVER (PARTITION BY doc_id, ts
                            ORDER BY coalesce(fvalue, -1) DESC, fcat DESC) AS rn
  FROM ev0),
ev AS (SELECT doc_id, ts, fvalue, fvdec, fcat FROM evr WHERE rn = 1),
p AS (SELECT DISTINCT doc_id, asof_ts
      FROM read_parquet('{_FLAGSHIP_ORACLE_ROOT}/probes/*.parquet')),
a AS (
  SELECT p.doc_id, p.asof_ts, e.fvalue AS fvalue_last, e.fvdec AS fvdec_last,
         e.fcat AS fcat_last
  FROM p ASOF LEFT JOIN ev e ON p.doc_id = e.doc_id AND e.ts <= p.asof_ts),
l AS (
  SELECT *, lag(fvalue_last, 1) OVER (PARTITION BY doc_id ORDER BY asof_ts)
              AS fvalue_lag1
  FROM a),
d AS (
  SELECT *, CASE WHEN lag(asof_ts) OVER w IS NULL
                      OR epoch_us(asof_ts) - epoch_us(lag(asof_ts) OVER w) > 3600000000
                 THEN 1 ELSE 0 END AS is_new
  FROM l WINDOW w AS (PARTITION BY doc_id ORDER BY asof_ts)),
se AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY doc_id ORDER BY asof_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS session_id
  FROM d),
r AS (
  SELECT *, COUNT(fvdec_last) OVER w2 AS n_1d,
         CAST(SUM(fvdec_last) OVER w2 AS DOUBLE) AS sum_1d
  FROM se WINDOW w2 AS (PARTITION BY doc_id ORDER BY asof_ts
                        RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW))
SELECT r.doc_id, r.asof_ts, fvalue_last, fcat_last, fvalue_lag1, session_id,
       n_1d, sum_1d, q.n_tok, q.source
FROM r LEFT JOIN read_parquet('{_FLAGSHIP_ORACLE_ROOT}/sequences/*.parquet') q
  USING (doc_id)
"""


def q_session_window_agg(spark, sf_dir):
    """Native session_window sessionization (§2.8 — batch form of the
    streaming operator; new session when gap since previous event ≥ 30min,
    session_end = last ts + gap)."""
    from engine.streaming import session_window_agg

    e = _events(spark, sf_dir).select(
        "user_id", "ts", F.col("value").cast("decimal(18,2)").alias("vdec")
    )
    s = session_window_agg(e, "user_id", "ts", "30 minutes", aggs={"vdec": ["sum"]})
    return s.select(
        "user_id", "session_start", "session_end", "n_events",
        F.col("vdec_sum").cast("double").alias("value_sum"),
    )


def q_plan_pipeline(spark, sf_dir):
    """FeaturePlan IR + fluent facade (§3.1/§3.3): same semantics as the
    composed operators — lowered from the declarative plan instead."""
    from engine.plan import FeatureEngine

    probes, state = _probe_state(spark, sf_dir)
    return (
        FeatureEngine(probes, entity="user_id", ts="ts")
        .asof(state, values=["value", "etype"], suffix="_last")
        .lag(["value_last"], lags=[1])
        .sessionize("30 minutes")
        .to_df()
    )


def q_range_join(spark, sf_dir):
    """Interval/range join (A7): count click events inside each user's
    sessions-with-padding window [start, start+1h)."""
    e = _events(spark, sf_dir)
    s = (
        sessionize(e.select("user_id", "ts"), "user_id", "ts", gap="30 minutes")
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_start"))
    )
    clicks = e.where(F.col("event_type") == "click").select("user_id", F.col("ts").alias("c_ts"))
    j = s.join(
        clicks,
        (s["user_id"] == clicks["user_id"])
        & (clicks["c_ts"] >= s["s_start"])
        & (clicks["c_ts"] < s["s_start"] + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return j.groupBy(s["user_id"].alias("user_id"), "session_id").agg(
        F.count("c_ts").alias("n_clicks_1h")
    )


def q_cube_events(spark, sf_dir):
    """Grouping-sets cube (G4): counts at (type×day, type, day, total)."""
    e = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    return (
        e.cube("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"),
             F.countDistinct("user_id").alias("n_users"))
        .select("event_type", F.date_format("day", "yyyy-MM-dd").alias("day"), "n", "n_users")
    )


# ------------------------------------------------- corpus ops (§2.10) ----
# Deduplication / similarity / text-analysis / multimodal queries with
# DuckDB oracles built from the same md5-hex + ordered-double arithmetic
# (verified bit-exact cross-engine this session).

def q_exact_dedup(spark, sf_dir):
    from engine.corpus.dedup import exact_dedup

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return exact_dedup(d).select("doc_id", "content_hash", "keeper_id", "n_copies", "is_dup")


def q_minhash_lsh_pairs(spark, sf_dir):
    from engine.corpus.dedup import lsh_candidate_pairs

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return lsh_candidate_pairs(d)


def q_near_dup_jaccard(spark, sf_dir):
    from engine.corpus.dedup import (
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
        shingle_table,
    )

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    # shingling is the dominant per-row cost — one persisted pass feeds both
    # the MinHash signatures and the Jaccard verification
    sh = shingle_table(d)
    pairs = lsh_candidate_pairs(d, shingle_df=sh)
    return ngram_jaccard_pairs(d, pairs, threshold=0.8, shingle_df=sh)


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs (rows-only: xxhash64 has no DuckDB analogue;
    covered by the pandas oracle in tests/test_corpus.py instead)."""
    from engine.corpus.dedup import simhash, simhash_near_pairs

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_near_pairs(simhash(d), max_hamming=8)


def q_simhash_pairs_md5(spark, sf_dir):
    """SimHash near-dup pairs over the ENGINE-PORTABLE word hash (60-bit
    md5 prefix): same Charikar kernel and pigeonhole blocking as
    `simhash_pairs`, but the per-word hash is reproducible in ANSI SQL, so
    this variant IS hash-exact against DuckDB (upgrades C5 from rows-only:
    the oracle recomputes signatures bit-by-bit, the block keys, the
    blocked self-join, and the Hamming verify)."""
    from engine.corpus.dedup import simhash, simhash_md5_word_hash, simhash_near_pairs

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    s = simhash(d, bits=60, word_hash=simhash_md5_word_hash(60))
    p = simhash_near_pairs(s, max_hamming=4, bits=60)
    return p.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def _simhash_md5_sql(bits: int = 60, max_hamming: int = 4) -> str:
    """DuckDB oracle for q_simhash_pairs_md5 — generated, mirroring
    engine/corpus/dedup.py exactly: 60-bit md5-prefix word hash (15-nibble
    polynomial), per-bit majority votes, pigeonhole blocks
    (blocks = max_hamming + 1, equal widths), blocked self-join, exact
    bit_count(xor) verify."""
    nibbles = bits // 4
    poly = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(w), {i}, 1)) - 1) * {16 ** (nibbles - i)}"
        for i in range(1, nibbles + 1)
    )
    blocks = max_hamming + 1
    width = bits // blocks
    assert bits % blocks == 0, (bits, blocks)
    mask = (1 << width) - 1
    return f"""
WITH words AS (
  -- explicit class = Java \\s ([ \\t\\n\\x0B\\f\\r]): DuckDB's RE2 \\s lacks
  -- vertical tab, so text containing \\x0B would split differently
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\v\f\r]+')) AS w
  FROM documents
),
hashed AS (SELECT doc_id, ({poly}) AS h FROM words),
votes AS (
  SELECT doc_id, t.j,
         SUM(CASE WHEN ((h >> t.j) & 1) = 1 THEN 1 ELSE -1 END) AS s
  FROM hashed, range({bits}) t(j)
  GROUP BY doc_id, t.j
),
sig AS (
  SELECT doc_id,
         SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS sim
  FROM votes GROUP BY doc_id
),
blocks AS (
  SELECT doc_id, sim, t.block_id,
         (sim >> ({width} * t.block_id)) & {mask} AS block_val
  FROM sig, range({blocks}) t(block_id)
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
FROM blocks a
JOIN blocks b ON a.block_id = b.block_id AND a.block_val = b.block_val
            AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}
"""


def q_embedding_near_dup(spark, sf_dir):
    from engine.corpus.similarity import embedding_near_dup_pairs

    e = read_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(e, threshold=0.3, exact=True)


def q_embedding_near_dup_lsh(spark, sf_dir):
    """The SCALE path of embedding near-dup: candidate pairs blocked by
    random-hyperplane LSH bucket (each task bucket-bounded), exact cosine
    verify within buckets — oracle reproduces the md5-derived hyperplanes
    in SQL, so the bucket assignment itself is driver-checked."""
    from engine.corpus.similarity import embedding_near_dup_pairs

    e = read_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(e, threshold=0.3, exact=False)


def _emb_queries(e):
    return e.where(F.col("vec_id") < 10).select(F.col("vec_id").alias("q_id"), "embedding")


def q_ann_topk(spark, sf_dir):
    from engine.corpus.similarity import brute_force_topk

    e = read_table(spark, sf_dir, "embeddings")
    return brute_force_topk(e, _emb_queries(e), k=5)


def q_label_agreement(spark, sf_dir):
    """Leave-one-out k-NN label agreement (engine/corpus/similarity.py::
    label_agreement, SURVEY.md §2.10 C29): neighbourhood majority vote as a
    label-noise screen. Oracle: full cross join + the identical
    (score desc, id asc) neighbour ranking and (votes desc, label asc)
    majority tie-break."""
    from engine.corpus.similarity import label_agreement

    e = read_table(spark, sf_dir, "embeddings")
    return label_agreement(e, k=5)


def q_ann_lsh_topk(spark, sf_dir):
    from engine.corpus.similarity import lsh_topk

    e = read_table(spark, sf_dir, "embeddings")
    return lsh_topk(e, _emb_queries(e), k=5)


def q_ann_lsh_multitable(spark, sf_dir):
    """Multi-table LSH ANN (the recall lever): candidates = union of bucket
    matches across 2 independent hyperplane tables, deduped before the exact
    cosine re-score. Oracle reproduces both tables' buckets in SQL."""
    from engine.corpus.similarity import lsh_topk

    e = read_table(spark, sf_dir, "embeddings")
    return lsh_topk(e, _emb_queries(e), k=5, tables=2)


def q_lang_id(spark, sf_dir):
    from engine.corpus.text import lang_id

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return lang_id(d).drop("text")


def q_quality_score(spark, sf_dir):
    from engine.corpus.text import quality_score

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_score(d).drop("text")


def q_token_counts(spark, sf_dir):
    from engine.corpus.text import token_counts

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return token_counts(d).drop("text")


def q_doc_fingerprint(spark, sf_dir):
    from engine.corpus.text import fingerprint

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return fingerprint(d).drop("text")


def q_multimodal_decode(spark, sf_dir):
    """Binary-asset decode plumbing (engine/corpus/multimodal.py): the
    Arrow mapInPandas stage parses REAL payload bytes (header + sha256
    body). Hash-exact since r3 (round-2 verdict #8): every output field —
    dims, frame count, byte length, body checksum — is reconstructed
    independently by the DuckDB oracle from asset_id arithmetic + sha256,
    so a corrupted byte anywhere in the generate→decode path breaks the
    value hash."""
    from engine.corpus.multimodal import decode_features, gen_assets

    return decode_features(gen_assets(spark, 2000))


def q_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing (engine/corpus/multimodal.py::frame_sample,
    SURVEY.md §2.10 C14): decode video assets, explode every-8th frame
    index against the decoded frame count. Hash-exact since r4: the DuckDB
    oracle reconstructs the video subset (asset_id % 3 = 2), the frame
    count (1 + id*31 % 64) and the sampled index list (generate_series
    step 8, inclusive stop — same semantics as Spark F.sequence)
    independently from asset_id arithmetic."""
    from engine.corpus.multimodal import frame_sample, gen_assets

    return frame_sample(gen_assets(spark, 2000), every=8)


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified corpus sampling (engine/corpus/sampling.py,
    SURVEY.md §2.10 C16): per-source Bernoulli rates via the 16-bit md5
    coin — same membership on any re-run/partitioning, which is what makes
    the sample resumable at scale. Hash-exact: the oracle re-derives the
    coin by nibble arithmetic over DuckDB's md5 hex and applies the same
    integer thresholds."""
    from engine.corpus.sampling import stratified_sample

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    return stratified_sample(
        d, "source", {"src0": 1.0, "src1": 0.5, "src2": 0.25}, default_rate=0.125
    )


def q_exact_k_sample(spark, sf_dir):
    """Exact-k-per-stratum sample (C18): uniform-without-replacement via
    rank on the md5 coin with key tie-break — a fixed-size eval/holdout
    cut. Oracle = identical window in DuckDB."""
    from engine.corpus.sampling import exact_k_sample

    d = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    return exact_k_sample(d, "source", k=5)


def q_weighted_mix(spark, sf_dir):
    """Source-weighted corpus mixing (C17): downsample sources so the kept
    char-mass matches target shares; largest achievable corpus without
    upsampling (C = min_s T_s/w_s, rate_s = least(1, w_s*C/T_s)). The rate
    arithmetic is a fixed IEEE-double op tree mirrored verbatim in the
    oracle, so membership AND the emitted mix_rate are bit-exact."""
    from engine.corpus.sampling import weighted_mix

    d = read_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return weighted_mix(
        d, {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    ).select("doc_id", "source", "n_chars", "mix_rate")


def q_decontaminate(spark, sf_dir):
    """Eval-set decontamination (engine/corpus/traindata.py, SURVEY.md
    §2.10 C19): flag training docs sharing any word 3-gram with a
    deterministic 5% eval cut of the corpus (the C16 hash coin under the
    'eval' salt). Hash-exact: the oracle re-derives the eval set with the
    nibble-parsed coin and the grams with the shared shingle SQL."""
    from engine.corpus.sampling import hash_sample
    from engine.corpus.traindata import decontaminate

    d = read_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    ev = hash_sample(d, 0.05, salt="eval")
    return decontaminate(d, ev, n=3).select(
        "doc_id", "source", "n_hit_grams", "contaminated"
    )


def q_pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing (C20): shard docs by source, lay
    them end to end in hash order, cut every 64 BPE-ish tokens; one row per
    (doc, pack) slice. Oracle = identical int64 window + generate_series
    arithmetic in DuckDB."""
    from pyspark.sql import functions as F

    from engine.corpus.text import bpe_tokens
    from engine.corpus.traindata import pack_sequences

    d = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .withColumn("n_tok", F.size(bpe_tokens(F.col("text"))))
    )
    return pack_sequences(d, seq_len=64, n_tokens_col="n_tok")


def q_tfidf_terms(spark, sf_dir):
    """Per-doc top-5 tf-idf terms (engine/corpus/traindata.py, SURVEY.md
    §2.10 C23): ratio idf (log-free, so the score tree is bit-exact in
    DuckDB), token tie-break, row_number ≤ 5. Oracle = identical two-level
    aggregation + window."""
    from engine.corpus.traindata import tfidf_topk_terms

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_topk_terms(d, k=5)


def q_repetition_stats(spark, sf_dir):
    """Intra-doc repetition filters (engine/corpus/text.py, SURVEY.md §2.10
    C22): duplicate word / 2-gram / 3-gram fractions + threshold flag — the
    Gopher-style boilerplate filter cross-doc dedup can't see. Exact
    integer-ratio doubles, mirrored in the DuckDB oracle."""
    from engine.corpus.text import repetition_stats

    d = read_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return repetition_stats(d).drop("text")


def q_vocab_topk(spark, sf_dir):
    """Corpus vocabulary stats (C21): top-100 tokens by term frequency with
    document frequency, via per-(doc,token) pre-agg then per-token totals
    (map-side-combine friendly) and TakeOrderedAndProject. Total order
    (term_freq desc, token) makes the set unique; oracle = same two-level
    aggregation in DuckDB."""
    from engine.corpus.traindata import vocab_stats

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return vocab_stats(d, top_k=100)


def q_dedup_clusters(spark, sf_dir):
    """Near-dup cluster keep-list (engine/corpus/dedup.py::
    connected_components, SURVEY.md §2.10 C28): LSH candidate pairs →
    connected components (transitive closure of near-duplication) →
    per-doc cluster id + keeper flag. Oracle: DuckDB recursive CTE over the
    identical pair CTE chain — min reachable id per node."""
    from engine.corpus.dedup import connected_components, lsh_candidate_pairs

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = lsh_candidate_pairs(d)
    comp = connected_components(
        pairs, nodes=d.select(F.col("doc_id").alias("node"))
    )
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("component_id"),
        (F.col("node") == F.col("component")).cast("int").alias("is_keeper"),
    )


def q_resize_plumbing(spark, sf_dir):
    """Image-resize plumbing (engine/corpus/multimodal.py::resize_features,
    SURVEY.md §2.10 C27): decode + aspect-preserving integer dims math +
    stubbed resample fused into one Arrow stage (payload crosses into
    Python once, never shuffles). Hash-exact: the oracle reconstructs dims
    from asset_id arithmetic and the checksum from sha256 nibble sums over
    the same payload-body slice."""
    from engine.corpus.multimodal import gen_assets, resize_features

    return resize_features(gen_assets(spark, 2000), max_side=64)


def q_length_buckets(spark, sf_dir):
    """Sequence-length bucketing (engine/corpus/traindata.py::length_buckets,
    SURVEY.md §2.10 C26): pad-to-bucket batch-scheduling prep — per pow2
    bucket: doc count, effective tokens, truncation loss, exact pad-waste
    fraction. Oracle = same literal edge array + integer-ratio arithmetic."""
    from engine.corpus.text import bpe_tokens
    from engine.corpus.traindata import length_buckets

    d = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn("n_tok", F.size(bpe_tokens(F.col("text"))))
    )
    return length_buckets(d, "n_tok")


def q_approx_quantiles(spark, sf_dir):
    """G9 quantile sketch with an in-query error-bound gate
    (engine/transforms/table.py::quantile_sketch_gate): exact positional
    p50/p90 in integer cents are hash-checked; percentile_approx
    (Greenwald-Khanna, accuracy=100) is asserted inside its published
    rank-error guarantee — a drifting sketch flips approx_ok and breaks
    the value hash (same pattern as approx_distinct's 5×rsd bound)."""
    from engine.transforms.table import quantile_sketch_gate

    e = _events(spark, sf_dir).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return quantile_sketch_gate(e, "event_type", "cents", qs=(0.5, 0.9), accuracy=100)


def q_ngram_topk(spark, sf_dir):
    """Corpus token-bigram stats (engine/corpus/traindata.py::ngram_topk,
    SURVEY.md §2.10 C25): top-100 bigrams by total frequency with document
    frequency — phrase-vocabulary induction / n-gram-LM count table. Same
    map-side-combine two-level aggregation as vocab_topk; (freq desc, gram)
    total order. Oracle = identical gram derivation + aggregation."""
    from engine.corpus.traindata import ngram_topk

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return ngram_topk(d, n=2, top_k=100)


def _pii_augmented(d):
    """Deterministically inject PII spans into the synthetic corpus (the
    fixture text has none): email on doc_id%7, IPv4 on %11, phone on %13 —
    pure integer/string arithmetic mirrored verbatim in the oracle SQL, so
    both engines scrub the identical augmented text."""
    did = F.col("doc_id")
    return d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                did % 7 == 0,
                F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                did % 11 == 0,
                F.concat(
                    F.lit(" from 10."), (did % 200).cast("string"),
                    F.lit(".0."), (did % 250).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 13 == 0,
                F.concat(F.lit(" call +1 555 867 5"), (did % 900 + 100).cast("string")),
            ).otherwise(F.lit("")),
        ),
    )


def q_pii_scrub(spark, sf_dir):
    """PII detection + redaction (engine/corpus/privacy.py, SURVEY.md §2.10
    C24): per-doc email/IPv4/phone counts + placeholder-masked text, pure
    per-row JVM regexp (RE2-portable patterns, fixed redaction order).
    Hash-exact: the oracle runs the same regexes over the same
    deterministically-augmented text."""
    from engine.corpus.privacy import pii_scrub

    d = _pii_augmented(
        read_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    return pii_scrub(d).select(
        "doc_id", "source", "n_emails", "n_ipv4", "n_phones", "has_pii",
        "redacted_text",
    )


# ---- DuckDB oracle SQL builders (mirror engine/corpus expressions) ----

_W = "string_split(trim(lower(text)), ' ')"
_W_NOLOWER = "string_split(trim(text), ' ')"
_TOKEN_RE_SQL = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
# PII patterns (engine/corpus/privacy.py) — constructs with identical
# semantics in Java regex and RE2
_EMAIL_RE_SQL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
_IPV4_RE_SQL = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
_PHONE_RE_SQL = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def _shingles_sql(n: int = 3, w: str = "w") -> str:
    """Shingle expression over a word-array column ``w`` (bind it in a CTE:
    ``wt AS (SELECT doc_id, {_W} AS w FROM documents)``)."""
    grams = " || ' ' || ".join(f"{w}[i+{j}]" for j in range(n)).replace(f"{w}[i+0]", f"{w}[i]")
    return (
        f"list_sort(list_distinct(CASE WHEN len({w}) < {n} "
        f"THEN [array_to_string({w}, ' ')] "
        f"ELSE list_transform(range(1, len({w}) - {n - 2}), i -> {grams}) END))"
    )


def _grams_all_sql(n: int, w: str = "w") -> str:
    """Non-distinct word-n-gram expression over a word-array column ``w``
    (engine/corpus/text.py::grams_all — repetition detection keeps
    multiplicity, unlike _shingles_sql)."""
    grams = " || ' ' || ".join(f"{w}[i+{j}]" for j in range(n)).replace(f"{w}[i+0]", f"{w}[i]")
    return (
        f"CASE WHEN len({w}) < {n} THEN [array_to_string({w}, ' ')] "
        f"ELSE list_transform(range(1, len({w}) - {n - 2}), i -> {grams}) END"
    )


def _coin_sql(key: str, salt: str = "afg") -> str:
    """engine/corpus/sampling.py::sample_coin in DuckDB SQL: the first 4
    hex nibbles of md5(salt|key) parsed base-16 via strpos arithmetic
    (same technique as the multimodal byte-checksum oracle)."""
    h = f"md5('{salt}|' || {key})"

    def nib(i: int) -> str:
        return f"(strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1)"

    return f"(4096 * {nib(1)} + 256 * {nib(2)} + 16 * {nib(3)} + {nib(4)})"


def _minhash_sql(i: int, sh: str = "sh") -> str:
    return f"list_min(list_transform({sh}, s -> md5('{i}|' || s)))"


def _lsh_pairs_cte() -> str:
    """CTE chain: documents → shingles → 16 minhashes → 4 bands → pairs."""
    hs = ",\n    ".join(f"{_minhash_sql(i)} AS h{i}" for i in range(16))
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, h{4*b} || h{4*b+1} || h{4*b+2} || h{4*b+3} AS bk FROM hs"
        for b in range(4)
    )
    return f"""
wt AS (SELECT doc_id, {_W} AS w FROM documents),
sh AS (SELECT doc_id, {_shingles_sql()} AS sh FROM wt),
hs AS (SELECT doc_id,
    {hs}
  FROM sh),
bands AS (
  {band_selects}),
pairs AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.bk = r.bk AND l.doc_id < r.doc_id)
"""


def _sw_sql(lang_words: list[str], w: str = _W) -> str:
    lst = "[" + ", ".join(f"'{x}'" for x in lang_words) + "]"
    return f"len(list_filter({w}, x -> list_contains({lst}, x)))"


def _cos_sql(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


def _bucket_sql(v: str, table: int = 0) -> str:
    from engine.corpus.similarity import _hyperplane

    terms = []
    for i in range(8):
        plane = "[" + ", ".join(repr(x) for x in _hyperplane(table * 8 + i, 64)) + "]::DOUBLE[]"
        terms.append(f"(CASE WHEN list_dot_product({v}, {plane}) > 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _corpus_oracle_sql() -> dict[str, str]:
    from engine.corpus.sampling import rate_threshold
    from engine.corpus.text import LANGS, STOPWORDS

    lang_scores = ",\n  ".join(
        f"{_sw_sql(STOPWORDS[l])} AS s_{l}" for l in LANGS
    )
    best = "greatest(" + ", ".join(f"s_{l}" for l in LANGS) + ")"
    pred_chain = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN s_{l} = {best} THEN '{l}'" for l in LANGS
    ) + " END"

    return {
        "exact_dedup": """
WITH k AS (SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
                  count(*) AS n_copies
           FROM documents GROUP BY 1)
SELECT d.doc_id, k.content_hash, k.keeper_id, k.n_copies,
       CASE WHEN d.doc_id <> k.keeper_id THEN 1 ELSE 0 END AS is_dup
FROM documents d JOIN k ON md5(d.text) = k.content_hash
""",
        "minhash_lsh_pairs": f"""
WITH {_lsh_pairs_cte()}
SELECT id_a, id_b FROM pairs
""",
        "near_dup_jaccard": f"""
WITH {_lsh_pairs_cte()}
SELECT id_a, id_b, jaccard FROM (
  SELECT p.id_a, p.id_b,
         round(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 1.0
                    ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.sh, b.sh))) END, 6) AS jaccard
  FROM pairs p JOIN sh a ON a.doc_id = p.id_a JOIN sh b ON b.doc_id = p.id_b) t
WHERE jaccard >= 0.8
""",
        "simhash_pairs_md5": _simhash_md5_sql(bits=60, max_hamming=4),
        "embedding_near_dup": f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT id_a, id_b, cos FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({_cos_sql('a.v', 'b.v')}, 6) AS cos
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id) t
WHERE cos >= 0.3
""",
        "embedding_near_dup_lsh": f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, v, {_bucket_sql('v')} AS bucket FROM emb)
SELECT id_a, id_b, cos FROM (
  SELECT l.vec_id AS id_a, r.vec_id AS id_b,
         round({_cos_sql('l.v', 'r.v')}, 6) AS cos
  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id) t
WHERE cos >= 0.3
""",
        "ann_topk": f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id < 10),
s AS (SELECT q_id, vec_id, round({_cos_sql('v', 'qv')}, 6) AS score
      FROM emb CROSS JOIN q),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS "rank"
      FROM s)
SELECT q_id, vec_id, score, "rank" FROM r WHERE "rank" <= 5
""",
        "label_agreement": f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
s AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id, c.label AS n_label,
             round({_cos_sql('c.v', 'q.v')}, 6) AS score
      FROM emb q JOIN emb c ON c.vec_id <> q.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id ASC) AS rn
      FROM s),
v AS (SELECT q_id, n_label, count(*) AS votes FROM r WHERE rn <= 5 GROUP BY q_id, n_label),
m AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, n_label ASC) AS mr
      FROM v)
SELECT e.vec_id, e.label, m.n_label AS majority_label, m.votes,
       CASE WHEN m.n_label = e.label THEN 1 ELSE 0 END AS agrees
FROM m JOIN emb e ON e.vec_id = m.q_id
WHERE m.mr = 1
""",
        "ann_lsh_topk": f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cb AS (SELECT vec_id, v, {_bucket_sql('v')} AS bucket FROM emb),
qb AS (SELECT vec_id AS q_id, v AS qv, {_bucket_sql('v')} AS bucket
       FROM emb WHERE vec_id < 10),
s AS (SELECT q_id, cb.vec_id, round({_cos_sql('cb.v', 'qb.qv')}, 6) AS score, cb.bucket
      FROM cb JOIN qb ON cb.bucket = qb.bucket),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS "rank"
      FROM s)
SELECT q_id, vec_id, score, "rank", bucket FROM r WHERE "rank" <= 5
""",
        "ann_lsh_multitable": f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cb AS (SELECT vec_id, v, {_bucket_sql('v', 0)} AS b0, {_bucket_sql('v', 1)} AS b1 FROM emb),
qb AS (SELECT vec_id AS q_id, v AS qv, b0, b1 FROM cb WHERE vec_id < 10),
cand AS (
  SELECT DISTINCT q_id, c.vec_id
  FROM cb c JOIN qb q ON c.b0 = q.b0
  UNION
  SELECT DISTINCT q_id, c.vec_id
  FROM cb c JOIN qb q ON c.b1 = q.b1),
s AS (SELECT cand.q_id, cand.vec_id,
             round({_cos_sql('c.v', 'q.qv')}, 6) AS score
      FROM cand JOIN cb c ON c.vec_id = cand.vec_id
                JOIN qb q ON q.q_id = cand.q_id),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS "rank"
      FROM s)
SELECT q_id, vec_id, score, "rank" FROM r WHERE "rank" <= 5
""",
        "ann_ivf_topk": f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id % 40 = 0),
ca AS (SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos_sql('e.v', 'c.cv')} DESC, c.cid ASC) AS rn
    FROM emb e CROSS JOIN cent c) t WHERE rn = 1),
qp AS (SELECT q_id, qv, cid FROM (
    SELECT e.vec_id AS q_id, e.v AS qv, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos_sql('e.v', 'c.cv')} DESC, c.cid ASC) AS rn
    FROM emb e CROSS JOIN cent c WHERE e.vec_id < 10) t WHERE rn <= 3),
s AS (SELECT qp.q_id, ca.vec_id, round({_cos_sql('ca.v', 'qp.qv')}, 6) AS score
      FROM ca JOIN qp ON ca.cid = qp.cid),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS "rank"
      FROM s)
SELECT q_id, vec_id, score, "rank" FROM r WHERE "rank" <= 5
""",
        "tumbling_agg": """
SELECT user_id,
       time_bucket(INTERVAL 1 HOUR, ts) AS win_start,
       time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS win_end,
       COUNT(value) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events GROUP BY user_id, time_bucket(INTERVAL 1 HOUR, ts)
""",
        "sliding_agg": """
WITH ev AS (SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS v FROM events),
w AS (SELECT user_id, v,
             time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE AS win_start
      FROM ev, generate_series(0, 3) AS gs(k))
SELECT user_id, win_start, win_start + INTERVAL 2 HOUR AS win_end,
       COUNT(v) AS n, CAST(SUM(v) AS DOUBLE) AS value_sum
FROM w GROUP BY user_id, win_start
""",
        "median_by_group": """
WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events),
r AS (SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents ASC) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM c),
m AS (SELECT event_type, cents, n FROM r
      WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
         OR rn = CAST(floor(n / 2.0 + 1) AS BIGINT))
SELECT event_type, MAX(n) AS n, AVG(cents) / 100.0 AS median_value
FROM m GROUP BY event_type
""",
        "pivot_counts": """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
FROM events GROUP BY user_id
""",
        "token_array_ops": """
WITH t AS (SELECT doc_id, list_transform(string_split(text, ' '), w -> CAST(length(w) AS INT)) AS toks
           FROM documents)
SELECT doc_id,
       len(toks) AS n_tok,
       CAST(list_sum(toks) AS BIGINT) AS tok_sum,
       array_to_string(toks[1:5], ',') AS first5,
       len(list_distinct(toks)) AS n_unique,
       list_max(toks) AS max_tok
FROM t
""",
        "lang_id": f"""
WITH scored AS (SELECT doc_id, lang,
  {lang_scores}
  FROM documents)
SELECT doc_id, lang, {pred_chain} AS lang_pred FROM scored
""",
        "quality_score": f"""
SELECT doc_id,
  round(0.4 * least(1.0, CAST(length(text) AS DOUBLE) / 200.0)
      + 0.3 * least(1.0, 5.0 * {_sw_sql(["the", "a", "and", "of", "to", "is", "in", "that", "it", "for"])}
                         / greatest(1.0, CAST(len({_W_NOLOWER}) AS DOUBLE)))
      + 0.3 * greatest(0.0, 1.0
          - CAST(len(list_filter(regexp_extract_all(text, '{_TOKEN_RE_SQL}'),
                                 t -> regexp_matches(t, '^[^A-Za-z0-9]$'))) AS DOUBLE)
            / greatest(1.0, CAST(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS DOUBLE))
          - CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
            / greatest(1.0, CAST(length(text) AS DOUBLE))), 6) AS quality
FROM documents
""",
        "token_counts": f"""
SELECT doc_id,
       len({_W_NOLOWER}) AS n_ws_tokens,
       len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS n_bpe_tokens,
       len(list_distinct({_W})) AS n_unique_words
FROM documents
""",
        "doc_fingerprint": f"""
WITH wt AS (SELECT doc_id, text, {_W} AS w FROM documents)
SELECT doc_id, md5(text) AS md5_full,
       list_min(list_transform({_shingles_sql()}, s -> md5(s))) AS shingle_minhash
FROM wt
""",
        "broadcast_dims": """
SELECT r_name, n_name, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "snapshot_diff": """
WITH a AS (SELECT doc_id, source FROM documents WHERE n_chars >= 100),
     b AS (SELECT doc_id, source FROM documents WHERE lang = 'en')
SELECT doc_id, source, 'a_only' AS side FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) t
UNION ALL
SELECT doc_id, source, 'both' AS side FROM (SELECT * FROM a INTERSECT SELECT * FROM b) t
""",
        "global_topn": """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""",
        "grouping_sets": """
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS chars_sum
FROM documents
GROUP BY GROUPING SETS ((source, lang), (source), ())
""",
        # sketch bound assertion: oracle emits TRUE — a drifting HLL++
        # estimate (>±10% = 5×rsd) breaks the value hash on approx_ok
        "approx_distinct": """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users_exact, TRUE AS approx_ok
FROM events GROUP BY event_type
""",
        # independent reconstruction of engine/corpus/multimodal.py's
        # deterministic assets: header fields from asset_id arithmetic,
        # n_bytes = 14-byte header + 32-byte sha256 digest × 4, checksum =
        # sum(buf[14:78]) + len(buf) = 2 × digest byte-sum + 142. The hex
        # digest's bytes are summed via nibble arithmetic (DuckDB sha256
        # returns lowercase hex).
        "multimodal_decode": """
WITH base AS (
  SELECT range AS asset_id, range % 3 AS k,
         sha256('asset|' || range) AS hx
  FROM range(2000)
),
body AS (
  SELECT asset_id, k,
         list_sum(list_transform(generate_series(0, 31), i ->
           16 * (strpos('0123456789abcdef', substr(hx, 2*i + 1, 1)) - 1)
              + (strpos('0123456789abcdef', substr(hx, 2*i + 2, 1)) - 1)
         )) AS digest_sum
  FROM base
)
SELECT asset_id,
       CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(16 + (asset_id * 7919) % 240 AS INTEGER) AS width,
       CAST(16 + (asset_id * 104729) % 240 AS INTEGER) AS height,
       CAST(CASE WHEN k = 0 THEN 1 ELSE 1 + (asset_id * 31) % 64 END AS INTEGER) AS n_frames,
       CAST(142 AS BIGINT) AS n_bytes,
       CAST(2 * digest_sum + 142 AS BIGINT) AS byte_checksum,
       'header-stub' AS decoder
FROM body
""",
        # video subset + frame arithmetic reconstructed from asset_id;
        # generate_series is inclusive-stop in both engines
        "frame_sample": """
WITH v AS (
  SELECT range AS asset_id,
         CAST(1 + (range * 31) % 64 AS INTEGER) AS n_frames
  FROM range(2000) WHERE range % 3 = 2
)
SELECT asset_id, n_frames,
       CAST(unnest(generate_series(0, n_frames - 1, 8)) AS INTEGER) AS frame_idx
FROM v
""",
        # deterministic stratified sampling: same 16-bit md5 coin, same
        # integer thresholds (1.0/0.5/0.25 -> 65536/32768/16384, default
        # 0.125 -> 8192)
        "stratified_sample": f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE {_coin_sql('doc_id')} < CASE source
  WHEN 'src0' THEN 65536 WHEN 'src1' THEN 32768 WHEN 'src2' THEN 16384
  ELSE 8192 END
""",
        "exact_k_sample": """
SELECT doc_id, source,
       CAST(row_number() OVER (
         PARTITION BY source ORDER BY md5('afg|' || doc_id), doc_id
       ) AS INTEGER) AS sample_rank
FROM documents
QUALIFY sample_rank <= 5
""",
        # weighted mix: identical IEEE-double rate tree (T cast double,
        # C = min(T/w), rate = least(1, (w*C)/T)), then the coin predicate
        "weighted_mix": f"""
WITH t AS (
  SELECT source, CAST(sum(n_chars) AS DOUBLE) AS T FROM documents GROUP BY source
),
w AS (
  SELECT * FROM (VALUES
    ('src0', CAST(0.4 AS DOUBLE)), ('src1', CAST(0.3 AS DOUBLE)),
    ('src2', CAST(0.2 AS DOUBLE)), ('src3', CAST(0.1 AS DOUBLE))
  ) AS v(source, w)
),
tw AS (SELECT t.source, t.T, w.w FROM t JOIN w USING (source)),
r AS (
  SELECT source,
         least(CAST(1.0 AS DOUBLE), (w * (SELECT min(T / w) FROM tw)) / T)
           AS mix_rate
  FROM tw
)
SELECT d.doc_id, d.source, d.n_chars, r.mix_rate
FROM documents d JOIN r USING (source)
WHERE {_coin_sql('d.doc_id')} < CAST(floor(mix_rate * 65536.0) AS INTEGER)
""",
        # decontamination: eval cut = C16 coin under the 'eval' salt at
        # rate 0.05 (threshold {rate_threshold(0.05)} = floor(.05*65536));
        # shingles() is distinct per doc, so count(*) after the gram join
        # counts distinct hit grams
        "decontaminate": f"""
WITH wt AS (SELECT doc_id, source, {_W} AS w FROM documents),
sh AS (SELECT doc_id, source, {_shingles_sql(3)} AS sh FROM wt),
ev AS (
  SELECT DISTINCT unnest(sh) AS g FROM sh
  WHERE {_coin_sql('doc_id', 'eval')} < {rate_threshold(0.05)}
),
dg AS (SELECT doc_id, unnest(sh) AS g FROM sh),
h AS (SELECT dg.doc_id, count(*) AS n_hit FROM dg JOIN ev USING (g) GROUP BY dg.doc_id)
SELECT d.doc_id, d.source,
       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit_grams,
       coalesce(h.n_hit, 0) > 0 AS contaminated
FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id
""",
        # concat-and-chunk packing: identical int64 op tree (window sum in
        # (md5 coin, doc_id) order, DIV/greatest/least slice arithmetic)
        "pack_sequences": f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS BIGINT) AS n
  FROM documents
),
c AS (
  SELECT doc_id, source, n,
         CAST(sum(n) OVER (
           PARTITION BY source ORDER BY md5('afg|' || doc_id), doc_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
  FROM d WHERE n > 0
),
s AS (SELECT doc_id, source, n, e, e - n AS st FROM c),
x AS (SELECT *, unnest(generate_series(st // 64, (e - 1) // 64)) AS p FROM s)
SELECT doc_id, source,
       CAST(p AS BIGINT) AS pack_id,
       CAST(greatest(st, p * 64) - p * 64 AS BIGINT) AS pack_off,
       CAST(greatest(st, p * 64) - st AS BIGINT) AS tok_start,
       CAST(least(e, (p + 1) * 64) - greatest(st, p * 64) AS BIGINT) AS tok_len
FROM x
""",
        # tf-idf: same tf/df/N aggregates, identical IEEE score tree
        # (tf * (N+1) / (df+1)), same (score desc, token) rank order
        "tfidf_terms": f"""
WITH t AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, token),
dfx AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
s AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfx.df,
         CAST(tf.tf AS DOUBLE) * (CAST(nn.n AS DOUBLE) + 1.0)
           / (CAST(dfx.df AS DOUBLE) + 1.0) AS score
  FROM tf JOIN dfx USING (token), nn
)
SELECT doc_id, token, tf, df, score,
       CAST(row_number() OVER (
         PARTITION BY doc_id ORDER BY score DESC, token
       ) AS INTEGER) AS term_rank
FROM s QUALIFY term_rank <= 5
""",
        # intra-doc repetition: same non-distinct gram lists, exact
        # integer-ratio double fractions, same thresholds
        "repetition_stats": f"""
WITH wt AS (SELECT doc_id, source, {_W} AS w FROM documents),
g AS (
  SELECT doc_id, source, w,
         {_grams_all_sql(2)} AS g2,
         {_grams_all_sql(3)} AS g3
  FROM wt
),
fr AS (
  SELECT doc_id, source,
    CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE)
      AS dup_word_frac,
    CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / CAST(len(g2) AS DOUBLE)
      AS dup_2gram_frac,
    CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / CAST(len(g3) AS DOUBLE)
      AS dup_3gram_frac
  FROM g
)
SELECT *,
       dup_word_frac > 0.30 OR dup_2gram_frac > 0.20 OR dup_3gram_frac > 0.18
         AS is_repetitive
FROM fr
""",
        # vocabulary stats: same two-level aggregation + total-order top-k
        "vocab_topk": f"""
WITH t AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}')) AS token
  FROM documents
),
pd AS (SELECT doc_id, token, count(*) AS c FROM t GROUP BY doc_id, token),
a AS (
  SELECT token, CAST(sum(c) AS BIGINT) AS term_freq,
         CAST(count(*) AS BIGINT) AS doc_freq
  FROM pd GROUP BY token
)
SELECT token, term_freq, doc_freq FROM a
ORDER BY term_freq DESC, token LIMIT 100
""",
        # resize plumbing: dims from asset_id arithmetic (images are
        # id%3=0), integer-div aspect math, checksum = sum of the first
        # (out_w*out_h)%96+16 body bytes — body is the sha256 digest
        # repeated 4x, so prefix sums come from nibble arithmetic
        # (full_sum * (L DIV 32) + prefix_sum(L % 32))
        "resize_plumbing": """
WITH base AS (
  SELECT range AS asset_id, sha256('asset|' || range) AS hx,
         16 + (range * 7919) % 240 AS w, 16 + (range * 104729) % 240 AS h
  FROM range(2000) WHERE range % 3 = 0
),
dims AS (
  SELECT asset_id, hx, w, h,
    CASE WHEN greatest(w, h) <= 64 THEN w
         ELSE greatest(1, (w * 64) // greatest(w, h)) END AS ow,
    CASE WHEN greatest(w, h) <= 64 THEN h
         ELSE greatest(1, (h * 64) // greatest(w, h)) END AS oh
  FROM base
),
l AS (SELECT *, (ow * oh) % 96 + 16 AS n FROM dims),
sums AS (
  SELECT asset_id, w, h, ow, oh, n,
    list_sum(list_transform(generate_series(0, 31), i ->
      16 * (strpos('0123456789abcdef', substr(hx, 2*i + 1, 1)) - 1)
         + (strpos('0123456789abcdef', substr(hx, 2*i + 2, 1)) - 1))) AS full_sum,
    CASE WHEN n % 32 = 0 THEN 0 ELSE
      list_sum(list_transform(generate_series(0, (n % 32) - 1), i ->
        16 * (strpos('0123456789abcdef', substr(hx, 2*i + 1, 1)) - 1)
           + (strpos('0123456789abcdef', substr(hx, 2*i + 2, 1)) - 1))) END AS prefix_sum
  FROM l
)
SELECT asset_id,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(ow AS INTEGER) AS out_w, CAST(oh AS INTEGER) AS out_h,
       CAST(full_sum * (n // 32) + prefix_sum AS BIGINT) AS resized_checksum,
       'header-stub' AS resizer
FROM sums
""",
        # dedup clusters: the identical LSH pair CTE chain, closed
        # transitively with a recursive CTE (min reachable id per node);
        # docs in no pair are singleton components of themselves
        "dedup_clusters": f"""
WITH RECURSIVE {_lsh_pairs_cte()},
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
comp AS (SELECT node AS doc_id, min(lbl) AS component_id
         FROM reach GROUP BY node)
SELECT doc_id, component_id,
       CASE WHEN doc_id = component_id THEN 1 ELSE 0 END AS is_keeper
FROM comp
""",
        # length buckets: same literal edge array, least()-clamp, and
        # integer-ratio pad-waste arithmetic
        "length_buckets": f"""
WITH d AS (
  SELECT CAST(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS BIGINT) AS n
  FROM documents WHERE text IS NOT NULL
),
b AS (
  SELECT list_min(list_filter([16, 32, 64, 128, 256, 512, 1024, 2048],
                              e -> e >= least(n, 2048))) AS seq_bucket,
         least(n, 2048) AS eff, n - least(n, 2048) AS trunc
  FROM d
)
SELECT CAST(seq_bucket AS BIGINT) AS seq_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(eff) AS BIGINT) AS sum_tokens,
       CAST(sum(trunc) AS BIGINT) AS truncated_tokens,
       1.0 - CAST(sum(eff) AS DOUBLE)
           / CAST(seq_bucket * count(*) AS DOUBLE) AS pad_waste_frac
FROM b GROUP BY seq_bucket
""",
        # quantile sketch gate: exact lower quantiles at rank
        # floor(q*(n-1))+1 (identical IEEE floor tree); oracle emits TRUE —
        # a GK sketch outside its rank guarantee breaks the hash on approx_ok
        "approx_quantiles": """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
  WHERE value IS NOT NULL
),
r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
  max(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 THEN cents END) AS p5_exact,
  max(CASE WHEN rn = CAST(floor(0.9 * (n - 1)) AS BIGINT) + 1 THEN cents END) AS p9_exact,
  TRUE AS approx_ok
FROM r GROUP BY event_type
""",
        # token bigrams: same derivation (BPE-ish regex over lowercased
        # text, docs shorter than n tokens contribute nothing), same
        # two-level aggregation + total-order top-k
        "ngram_topk": f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS tk
  FROM documents
),
g AS (
  SELECT doc_id, unnest(
    CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
         ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END
  ) AS gram
  FROM t
),
pd AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
a AS (
  SELECT gram, CAST(sum(c) AS BIGINT) AS gram_freq,
         CAST(count(*) AS BIGINT) AS doc_freq
  FROM pd GROUP BY gram
)
SELECT gram, gram_freq, doc_freq FROM a
ORDER BY gram_freq DESC, gram LIMIT 100
""",
        # PII scrub: same RE2-portable regexes over the same augmented
        # text; counts on the original, redaction chained in the same
        # fixed order (email -> ipv4 -> phone)
        "pii_scrub": f"""
WITH aug AS (
  SELECT doc_id, source,
    text
    || CASE WHEN doc_id % 7 = 0
            THEN ' contact user' || doc_id || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN ' from 10.' || (doc_id % 200) || '.0.' || (doc_id % 250)
            ELSE '' END
    || CASE WHEN doc_id % 13 = 0
            THEN ' call +1 555 867 5' || (doc_id % 900 + 100) ELSE '' END
      AS t
  FROM documents
)
SELECT doc_id, source,
  CAST(len(regexp_extract_all(t, '{_EMAIL_RE_SQL}')) AS INTEGER) AS n_emails,
  CAST(len(regexp_extract_all(t, '{_IPV4_RE_SQL}')) AS INTEGER) AS n_ipv4,
  CAST(len(regexp_extract_all(t, '{_PHONE_RE_SQL}')) AS INTEGER) AS n_phones,
  len(regexp_extract_all(t, '{_EMAIL_RE_SQL}')) > 0
    OR len(regexp_extract_all(t, '{_IPV4_RE_SQL}')) > 0
    OR len(regexp_extract_all(t, '{_PHONE_RE_SQL}')) > 0 AS has_pii,
  regexp_replace(
    regexp_replace(
      regexp_replace(t, '{_EMAIL_RE_SQL}', '<EMAIL>', 'g'),
      '{_IPV4_RE_SQL}', '<IP>', 'g'),
    '{_PHONE_RE_SQL}', '<PHONE>', 'g') AS redacted_text
FROM aug
""",
    }


def q_broadcast_dims(spark, sf_dir):
    """A4 + A5 (SURVEY.md §2.3): shuffle equi-join to ``customer`` (too big to
    broadcast at corpus scale), explicit ``broadcast()`` of the tiny
    ``nation``/``region`` dims — revenue per region × nation."""
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = read_table(spark, sf_dir, "region")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


def q_pricing_summary(spark, sf_dir):
    """G1 hash agg over ``lineitem`` (TPC-H Q1 pattern): pushed-down date
    filter + grouped sums. Per-row products are exact 6-decimal values, so
    DECIMAL(18,6) sums are hash-exact across engines; averages derive from
    exact sum / count."""
    li = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )

    def dsum(expr):
        return F.sum(expr.cast("decimal(18,6)"))

    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).cast("double").alias("sum_qty"),
        dsum(F.col("l_extendedprice")).cast("double").alias("sum_base_price"),
        dsum(disc_price).cast("double").alias("sum_disc_price"),
        dsum(charge).cast("double").alias("sum_charge"),
        (dsum(F.col("l_quantity")).cast("double") / n).alias("avg_qty"),
        (dsum(F.col("l_extendedprice")).cast("double") / n).alias("avg_price"),
        n.alias("count_order"),
    )


def q_snapshot_diff(spark, sf_dir):
    """O5 set ops (SURVEY.md §2.6): corpus diffing between two snapshots —
    rows only in snapshot A (EXCEPT ALL) and rows in both (INTERSECT)."""
    d = read_table(spark, sf_dir, "documents")
    snap_a = d.where(F.col("n_chars") >= 100).select("doc_id", "source")
    snap_b = d.where(F.col("lang") == "en").select("doc_id", "source")
    removed = snap_a.exceptAll(snap_b).withColumn("side", F.lit("a_only"))
    common = snap_a.intersect(snap_b).withColumn("side", F.lit("both"))
    return removed.unionByName(common)


def q_global_topn(spark, sf_dir):
    """O2 global sort + limit: Catalyst compiles orderBy().limit() to
    TakeOrderedAndProject — per-partition top-N then a single merge, never a
    full global sort. Deterministic tiebreak on the key."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def q_grouping_sets(spark, sf_dir):
    """G4 multi-granularity metrics via GROUPING SETS — (source×lang),
    (source), and grand total in ONE pass (Expand + single aggregate)."""
    read_table(spark, sf_dir, "documents").createOrReplaceTempView("afg_docs")
    return spark.sql("""
        SELECT source, lang, COUNT(*) AS n_docs,
               CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS chars_sum
        FROM afg_docs
        GROUP BY GROUPING SETS ((source, lang), (source), ())
    """)


def q_hotwin_family(spark, sf_dir):
    """W8 oracle coverage: the full per-entity window family (ffill → lag →
    sessionize → prefix rolling) with a hot-key list routing users 0-4
    through the time-bucketed skew-proof plans (engine/hotwin.py). Semantics
    are identical to the plain single-window plans — the oracle is plain
    window SQL. (This intentionally exercises the public per-op hot_keys=
    API; production pipelines split once per pipeline via engine.plan.lower.)"""
    hot = [0, 1, 2, 3, 4]
    bucket = "6 hours"
    e = _events_with_nulls(spark, sf_dir)
    f = forward_fill(e, "user_id", "ts", ["value_n"], out_suffix="_f",
                     hot_keys=hot, bucket=bucket)
    f = lag_features(f, "user_id", "ts", ["value_n_f"], lags=[1],
                     hot_keys=hot, bucket=bucket)
    f = sessionize(f, "user_id", "ts", gap="30 minutes",
                   hot_keys=hot, bucket=bucket)
    f = f.withColumn("vdec", F.col("value_n_f").cast("decimal(18,2)"))
    r = rolling_aggregates(f, "user_id", "ts", {"vdec": ["count", "sum"]},
                           window="1 hour", method="prefix",
                           hot_keys=hot, bucket=bucket)
    return r.select(
        "event_id", "user_id", "ts", "value_n", "value_n_f",
        "value_n_f_lag1", "session_id",
        F.col("vdec_count_1hour").alias("n_1h"),
        F.col("vdec_sum_1hour").cast("double").alias("sum_1h"),
    )


def q_fused_chain(spark, sf_dir):
    """Fused two-exchange feature chain (engine/fused.py) in hybrid mode:
    as-of join + lag + sessionize + 1-day rolling compiled to two wide
    shuffles, with users 0-4 routed through 6-hour time buckets
    (B = hot(entity) ? floor(ts/bucket) : 0) and cross-bucket state stitched
    via broadcast carry tables. Semantics are identical to composing the
    public operators — the oracle is ASOF JOIN + plain window SQL. The
    rolling source is cast to decimal so the prefix-sum (cum − cum@cutoff)
    arithmetic is exact and hash-comparable."""
    from engine.fused import fused_feature_chain

    probes, state = _probe_state(spark, sf_dir)
    state = state.select(
        "user_id", "ts", F.col("value").cast("decimal(18,2)").alias("vdec"),
        "etype",
    )
    r = fused_feature_chain(
        probes, state, on="user_id", probe_ts="ts", state_ts="ts",
        values=["vdec", "etype"], suffix="_last",
        lag_cols=["etype_last"], lags=[1],
        session_gap="30 minutes",
        rolling={"vdec_last": ["count", "sum"]},
        rolling_window="1 day", bucket="6 hours",
        hot_keys=[0, 1, 2, 3, 4],
    )
    return r.select(
        "event_id", "user_id", "ts",
        F.col("vdec_last").cast("double").alias("value_last"),
        "etype_last",
        F.col("etype_last_lag1").alias("etype_lag1"),
        "session_id",
        F.col("vdec_last_count_1day").alias("n_1d"),
        F.col("vdec_last_sum_1day").cast("double").alias("sum_1d"),
    )


def q_grouped_demean(spark, sf_dir):
    """G5 oracle coverage: Arrow-batched grouped-map (applyInPandas) — per
    source, demean n_chars. Float discipline: the group mean derives from an
    exact int64 sum, so the single float division + subtraction are
    IEEE-identical across engines (no rounding needed)."""
    import pandas as pd

    from engine.transforms.table import grouped_map

    d = read_table(spark, sf_dir, "documents")

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        mu = float(pdf["n_chars"].sum()) / n  # exact int sum → one fp divide
        out = pdf.copy()
        out["n_chars_dm"] = pdf["n_chars"].astype("float64") - mu
        out["n_grp"] = n
        return out[["doc_id", "source", "n_chars", "n_chars_dm", "n_grp"]]

    return grouped_map(
        d, "source", demean,
        schema="doc_id long, source string, n_chars long, n_chars_dm double, n_grp long",
        prune=["doc_id", "source", "n_chars"],
    )


def q_trimmed_mean_udaf(spark, sf_dir):
    """G6 oracle coverage: custom vectorized UDAF (pandas_udf grouped agg) —
    per-source trimmed mean of n_chars (drop the 2 lowest/highest by sorted
    position; positional trim over the sorted multiset is tie-independent).
    Exact int64 sums make the single float division cross-engine exact."""
    import numpy as np
    import pandas as pd

    from engine.transforms.table import make_grouped_agg_udaf

    k = 2

    # no inline type hints: this module's `from __future__ import annotations`
    # would stringify them and break pandas_udf's signature inference
    def trimmed(s):
        v = np.sort(s.to_numpy(np.int64))
        if len(v) > 2 * k:
            v = v[k:-k]
        return float(v.sum()) / len(v)

    trimmed.__annotations__ = {"s": pd.Series, "return": float}

    # Spark disallows mixing a grouped-agg pandas UDF with JVM aggregates in
    # one agg(), so the group size is a second (trivial) pandas UDAF
    def size(s):
        return len(s)

    size.__annotations__ = {"s": pd.Series, "return": int}

    udaf = make_grouped_agg_udaf(trimmed)
    n_udaf = make_grouped_agg_udaf(size, "long")
    d = read_table(spark, sf_dir, "documents").select("source", "n_chars")
    return d.groupBy("source").agg(
        udaf(F.col("n_chars")).alias("trimmed_mean"),
        n_udaf(F.col("n_chars")).alias("n_docs"),
    )


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-flat ANN (the second scale path the brief names next to LSH):
    deterministic sampled centroids, per-row JVM nearest-centroid
    assignment, nprobe=3 list search, exact cosine re-rank."""
    from engine.corpus.similarity import ivf_topk

    e = read_table(spark, sf_dir, "embeddings")
    return ivf_topk(e, _emb_queries(e), k=5, centroid_stride=40, nprobe=3)


def q_tumbling_agg(spark, sf_dir):
    """§2.8 tumbling windowed aggregate (batch form of the streaming op —
    same code path runs on readStream). Window bounds come back as
    TIMESTAMP_NTZ to match the driver tables' type discipline."""
    from engine.streaming import windowed_agg

    e = _events(spark, sf_dir).select(
        "user_id", "ts", F.col("value").cast("decimal(18,2)").alias("vdec")
    )
    out = windowed_agg(e, "user_id", "ts", {"vdec": ["count", "sum"]}, window="1 hour")
    return out.select(
        "user_id",
        F.col("win_start").cast("timestamp_ntz").alias("win_start"),
        F.col("win_end").cast("timestamp_ntz").alias("win_end"),
        F.col("vdec_count").alias("n"),
        F.col("vdec_sum").cast("double").alias("value_sum"),
    )


def q_sliding_agg(spark, sf_dir):
    """§2.8 SLIDING windowed aggregate (window=2h, slide=30m — each event
    lands in exactly window/slide = 4 epoch-aligned windows; same
    engine.streaming.windowed_agg code path runs on readStream). Oracle
    replicates each event into its 4 covering windows via generate_series
    and re-derives Spark's epoch-aligned window starts with time_bucket."""
    from engine.streaming import windowed_agg

    e = _events(spark, sf_dir).select(
        "user_id", "ts", F.col("value").cast("decimal(18,2)").alias("vdec")
    )
    out = windowed_agg(
        e, "user_id", "ts", {"vdec": ["count", "sum"]},
        window="2 hours", slide="30 minutes",
    )
    return out.select(
        "user_id",
        F.col("win_start").cast("timestamp_ntz").alias("win_start"),
        F.col("win_end").cast("timestamp_ntz").alias("win_end"),
        F.col("vdec_count").alias("n"),
        F.col("vdec_sum").cast("double").alias("value_sum"),
    )


def q_median_by_group(spark, sf_dir):
    """Exact (interpolation-free) per-group median: middle element(s) of the
    value multiset in integer cents — positional, so float quantile
    interpolation differences between engines cannot appear."""
    e = _events(spark, sf_dir).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("cents").asc())
    r = (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("event_type")))
    )
    lo = (F.col("n") + 1) / 2
    hi = F.col("n") / 2 + 1
    mid = r.where((F.col("rn") == F.floor(lo)) | (F.col("rn") == F.floor(hi)))
    return mid.groupBy("event_type").agg(
        F.max("n").alias("n"),
        (F.avg("cents") / 100.0).alias("median_value"),
    )


def q_pivot_counts(spark, sf_dir):
    """G4 pivot: per-user event counts spread across one column per event
    type (explicit value list — at corpus scale the implicit two-pass pivot
    is a full extra scan). Absent combinations are 0, not NULL."""
    e = _events(spark, sf_dir).select("user_id", "event_type")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
        .select("user_id", *[F.col(t).alias(f"n_{t}") for t in types])
    )


def q_token_array_ops(spark, sf_dir):
    """§2.7 array/token kernels with a hard oracle: deterministic
    array<int> tokens derived from the text (word lengths), then the JVM
    array expression family — size/slice/transform/aggregate/distinct/max —
    all whole-stage-codegen, no Python, no shuffle."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.transform(F.split(F.col("text"), " "), lambda w: F.length(w).cast("int"))
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").alias("n_tok"),
        F.aggregate("toks", F.lit(0).cast("long"), lambda a, x: a + x).alias("tok_sum"),
        F.concat_ws(
            ",", F.transform(F.slice("toks", 1, 5), lambda x: x.cast("string"))
        ).alias("first5"),
        F.size(F.array_distinct("toks")).alias("n_unique"),
        F.array_max("toks").alias("max_tok"),
    )


def q_approx_distinct(spark, sf_dir):
    """G3: HLL++ approximate per-key cardinality next to the exact count.
    The raw sketch estimate is engine-specific, so the HARD check is the
    error-bound assertion computed INSIDE the query: ``approx_ok`` is true
    iff the estimate lands within 5×rsd (rsd=0.02 → ±10%) of the exact
    count — the oracle emits TRUE, so a drifting sketch breaks the value
    hash (round-2 verdict #8: upgrades this from rows-only)."""
    e = _events(spark, sf_dir)
    a = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
        F.countDistinct("user_id").alias("n_users_exact"),
    )
    bound = F.col("n_users_exact") * F.lit(0.10)
    return a.select(
        "event_type",
        "n_users_exact",
        (F.abs(F.col("approx") - F.col("n_users_exact")) <= bound).alias("approx_ok"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    probes, state = _probe_state(spark, SF0001)
    feat = asof_join(
        probes, state, on="user_id", probe_ts="ts", state_ts="ts",
        values=["value", "etype"], suffix="_last",
    )
    feat = lag_features(feat, "user_id", "ts", ["value_last"], lags=[1])
    feat = sessionize(feat, "user_id", "ts", gap="30 minutes")
    feat = rolling_aggregates(feat, "user_id", "ts", {"value_last": ["count"]}, window="1 hour")
    return feat


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """ORDERING CONTRACT (round-2 verdict #3): the driver's correctness gate
    runs the FIRST 50 dict entries. Entries are therefore ordered: (1) the
    queries that had no CORRECTNESS row yet — previously past the window, or
    new this round — then (2) every remaining unique operator, then (3) a
    TAIL of entries whose operator/kernel is already exercised by an
    in-window query (the comment on each names its cover) — these keep
    running in pytest/check_oracle but can safely fall outside the driver's
    window."""
    return {
        # --- (1) no official CORRECTNESS row yet: first, always ---------
        # r4 LLM-pipeline operators (C16-C29, G9, sliding_agg,
        # flagship_sequences) landed past the driver's r4 window; r5 rotates
        # them in so each gets an official driver-green row (r4 verdict #1).
        "stratified_sample": q_stratified_sample,    # C16
        "exact_k_sample": q_exact_k_sample,          # C18
        "weighted_mix": q_weighted_mix,              # C17
        "decontaminate": q_decontaminate,            # C19
        "pack_sequences": q_pack_sequences,          # C20
        "vocab_topk": q_vocab_topk,                  # C21
        "repetition_stats": q_repetition_stats,      # C22
        "tfidf_terms": q_tfidf_terms,                # C23
        "pii_scrub": q_pii_scrub,                    # C24
        "ngram_topk": q_ngram_topk,                  # C25
        "approx_quantiles": q_approx_quantiles,      # G9
        "length_buckets": q_length_buckets,          # C26
        "resize_plumbing": q_resize_plumbing,        # C27
        "dedup_clusters": q_dedup_clusters,          # C28
        "sliding_agg": q_sliding_agg,                # §2.8 sliding window
        "label_agreement": q_label_agreement,        # C29
        "frame_sample": q_frame_sample,              # C14
        "flagship_sequences": q_flagship_sequences,  # flagship DuckDB oracle
        # --- (2) unique operator surface --------------------------------
        "broadcast_dims": q_broadcast_dims,
        "snapshot_diff": q_snapshot_diff,
        "approx_distinct": q_approx_distinct,
        "global_topn": q_global_topn,
        "grouping_sets": q_grouping_sets,
        "dim_grouped_agg": q_dim_grouped_agg,
        "asof_merge": q_asof_merge,
        "ffill": q_ffill,
        "lag_lead": q_lag_lead,
        "session_agg": q_session_agg,
        "rolling_1h": q_rolling_1h,
        "cumulative": q_cumulative,
        "direct_features": q_direct_features,
        "agg_features": q_agg_features,
        "two_level_agg": q_two_level_agg,
        "row_features_text": q_row_features_text,
        "row_features_time": q_row_features_time,
        "json_extract": q_json_extract,
        "plan_pipeline": q_plan_pipeline,
        "hotwin_family": q_hotwin_family,
        "fused_chain": q_fused_chain,
        "trimmed_mean_udaf": q_trimmed_mean_udaf,
        "token_array_ops": q_token_array_ops,
        # corpus ops (§2.10): dedup / similarity / text analysis
        "exact_dedup": q_exact_dedup,
        "near_dup_jaccard": q_near_dup_jaccard,
        "simhash_pairs_md5": q_simhash_pairs_md5,
        "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
        "ann_lsh_multitable": q_ann_lsh_multitable,
        "ann_ivf_topk": q_ann_ivf_topk,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "token_counts": q_token_counts,
        # --- (3) tail: kernel already covered by an in-window entry ------
        # Every tail entry below has a driver-green CORRECTNESS row from a
        # prior round AND is hash-checked every pytest run
        # (tests/test_tail_oracle.py); the named cover keeps the kernel
        # exercised inside the current driver window.
        "sessionize": q_sessionize,          # cover: session_agg, fused_chain
        "asof_bucketed": q_asof_bucketed,    # cover: asof_merge (same oracle), fused_chain hybrid
        "rollup_events": q_rollup_events,    # cover: grouping_sets (same GROUPING SETS engine path)
        "cube_events": q_cube_events,        # cover: grouping_sets
        "session_window_agg": q_session_window_agg,  # cover: session_agg (same agg; streaming variant pytest-checked)
        "simhash_pairs": q_simhash_pairs,    # cover: simhash_pairs_md5 (same kernel, portable hash)
        "embedding_near_dup": q_embedding_near_dup,  # cover: embedding_near_dup_lsh (same verify kernel)
        "ann_lsh_topk": q_ann_lsh_topk,      # cover: ann_lsh_multitable (superset, L=1 special case)
        # r5-demoted twins (driver-green in CORRECTNESS_r04.json):
        "asof_union": q_asof_union,          # cover: asof_merge (identical oracle, A1 union strategy)
        "asof_strict": q_asof_strict,        # cover: asof_merge (same kernel, <= -> < flag)
        "bfill": q_bfill,                    # cover: ffill (same carry kernel, reversed frame)
        "minmax": q_minmax,                  # cover: direct_features (same column-transform family)
        "topk_latest": q_topk_latest,        # cover: global_topn + vocab_topk (rank/TakeOrdered kernels)
        "semi_anti": q_semi_anti,            # cover: decontaminate (broadcast left-anti kernel)
        "range_join": q_range_join,          # cover: sliding_agg (window-containment non-equi expansion)
        "pivot_counts": q_pivot_counts,      # cover: grouping_sets (reshaped agg engine path)
        "median_by_group": q_median_by_group,  # cover: approx_quantiles (exact positional p50 kernel)
        "distinct_users": q_distinct_users,  # cover: approx_distinct (G3, exact gate in-query)
        "tumbling_agg": q_tumbling_agg,      # cover: sliding_agg (slide == window special case)
        "minhash_lsh_pairs": q_minhash_lsh_pairs,  # cover: near_dup_jaccard (verify consumes LSH pairs)
        "ann_topk": q_ann_topk,              # cover: label_agreement (brute-force topk is its oracle fetch) + ann_lsh_multitable
        "salted_join": q_salted_join,        # cover: two_level_agg (same salt kernel), fused_chain hybrid
        "grouped_demean": q_grouped_demean,  # cover: trimmed_mean_udaf (Arrow grouped-table transform)
        "pricing_summary": q_pricing_summary,  # cover: agg_features (hash group-by agg, G1)
        "doc_fingerprint": q_doc_fingerprint,  # cover: token_counts + quality_score (per-row JVM text kernels)
        "multimodal_decode": q_multimodal_decode,  # cover: resize_plumbing + frame_sample (same fused decode stage)
    }


def oracle_sql() -> dict[str, str]:
    asof = f"""
WITH {_PROBE_STATE_SQL}
SELECT p.event_id, p.user_id, p.ts, s.value AS value_last, s.etype AS etype_last
FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND s.ts <= p.ts
"""
    return {
        "asof_union": asof,
        "asof_merge": asof,
        "asof_bucketed": asof,
        "asof_strict": f"""
WITH {_PROBE_STATE_SQL}
SELECT p.event_id, p.user_id, p.ts, s.value AS value_last, s.etype AS etype_last
FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND s.ts < p.ts
""",
        "ffill": f"""
WITH {_NULLS_SQL}
SELECT event_id, user_id, ts, value_n,
       last_value(value_n IGNORE NULLS) OVER
         (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS value_n_f
FROM e
""",
        "bfill": f"""
WITH {_NULLS_SQL}
SELECT event_id, user_id, ts, value_n,
       first_value(value_n IGNORE NULLS) OVER
         (PARTITION BY user_id ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         AS value_n_b
FROM e
""",
        "lag_lead": """
SELECT event_id, user_id, ts, value,
       lag(value, 1)  OVER w AS value_lag1,
       lag(value, 2)  OVER w AS value_lag2,
       lead(value, 1) OVER w AS value_lead1
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
""",
        "sessionize": """
WITH d AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
SELECT event_id, user_id, ts,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM d
""",
        "session_agg": """
WITH d AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts, value,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM d)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS span_us,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM s GROUP BY user_id, session_id
""",
        "rolling_1h": """
SELECT event_id, user_id, ts,
       COUNT(value) OVER w AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
        "cumulative": """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS cum_sum,
       COUNT(value) OVER w AS cum_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
        "topk_latest": """
SELECT event_id, user_id, ts, value FROM (
  SELECT event_id, user_id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
  FROM events) t WHERE rn <= 3
""",
        "direct_features": """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
       c.c_mktsegment AS cust_c_mktsegment, c.c_acctbal AS cust_c_acctbal
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
""",
        "agg_features": """
SELECT o_custkey, COUNT(o_orderkey) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
FROM orders GROUP BY o_custkey
""",
        "two_level_agg": """
SELECT event_type, COUNT(value) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events GROUP BY event_type
""",
        "dim_grouped_agg": """
SELECT c.c_mktsegment,
       COUNT(CAST(o.o_totalprice AS DECIMAL(18,2))) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(MIN(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
       CAST(MAX(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
        "salted_join": """
WITH dim AS (SELECT event_type, COUNT(*) AS type_count FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type, d.type_count
FROM events e JOIN dim d ON e.event_type = d.event_type
""",
        "minmax": """
WITH s AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
SELECT e.event_id, e.value,
       CASE WHEN s.hi = s.lo THEN 0.5 ELSE (e.value - s.lo) / (s.hi - s.lo) END AS value_mm
FROM events e CROSS JOIN s
""",
        "row_features_text": """
SELECT doc_id, n_chars, LENGTH(text) AS text_len,
       len(string_split(TRIM(text), ' ')) AS n_words,
       LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')) AS n_digits,
       len(list_distinct(string_split(text, ' '))) AS n_unique_words
FROM documents
""",
        "row_features_time": """
SELECT event_id, ts, value,
       hour(ts) AS h,
       dayofweek(ts) + 1 AS dw,
       month(ts) AS mo,
       CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS wknd,
       ROUND(LN(1 + value), 6) AS v_log1p
FROM events
""",
        "json_extract": """
SELECT event_id, props, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events
""",
        "distinct_users": """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
""",
        "rollup_events": """
SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, COUNT(*) AS n
FROM events GROUP BY ROLLUP (event_type, CAST(ts AS DATE))
""",
        "semi_anti": """
SELECT p_partkey,
       CASE WHEN p_partkey IN (SELECT l_partkey FROM lineitem) THEN 1 ELSE 0 END AS shipped
FROM part
""",
        "session_window_agg": """
WITH d AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM d)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM s GROUP BY user_id, sid
""",
        "plan_pipeline": f"""
WITH {_PROBE_STATE_SQL},
a AS (
  SELECT p.event_id, p.user_id, p.ts, s.value AS value_last, s.etype AS etype_last
  FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND s.ts <= p.ts),
l AS (
  SELECT *, lag(value_last, 1) OVER (PARTITION BY user_id ORDER BY ts) AS value_last_lag1
  FROM a),
d AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                 THEN 1 ELSE 0 END AS is_new
  FROM l WINDOW w AS (PARTITION BY user_id ORDER BY ts))
SELECT event_id, user_id, ts, value_last, etype_last, value_last_lag1,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM d
""",
        "hotwin_family": f"""
WITH {_NULLS_SQL},
f AS (
  SELECT *, last_value(value_n IGNORE NULLS) OVER
         (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS value_n_f
  FROM e),
l AS (
  SELECT *, lag(value_n_f, 1) OVER (PARTITION BY user_id ORDER BY ts) AS value_n_f_lag1
  FROM f),
d AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                 THEN 1 ELSE 0 END AS is_new
  FROM l WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM d)
SELECT event_id, user_id, ts, value_n, value_n_f, value_n_f_lag1, session_id,
       COUNT(value_n_f) OVER w2 AS n_1h,
       CAST(SUM(CAST(value_n_f AS DECIMAL(18,2))) OVER w2 AS DOUBLE) AS sum_1h
FROM s
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
        "fused_chain": """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
s AS (SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS vdec, event_type AS etype
      FROM events WHERE event_type <> 'click'),
a AS (
  SELECT p.event_id, p.user_id, p.ts, s.vdec AS vdec_last, s.etype AS etype_last
  FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND s.ts <= p.ts),
l AS (
  SELECT *, lag(etype_last, 1) OVER (PARTITION BY user_id ORDER BY ts) AS etype_lag1
  FROM a),
d AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                 THEN 1 ELSE 0 END AS is_new
  FROM l WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
se AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM d)
SELECT event_id, user_id, ts, CAST(vdec_last AS DOUBLE) AS value_last,
       etype_last, etype_lag1, session_id,
       COUNT(vdec_last) OVER w2 AS n_1d,
       CAST(SUM(vdec_last) OVER w2 AS DOUBLE) AS sum_1d
FROM se
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW)
""",
        "grouped_demean": """
SELECT doc_id, source, n_chars,
       CAST(n_chars AS DOUBLE)
         - CAST(SUM(n_chars) OVER (PARTITION BY source) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY source) AS n_chars_dm,
       COUNT(*) OVER (PARTITION BY source) AS n_grp
FROM documents
""",
        "trimmed_mean_udaf": """
WITH r AS (SELECT source, n_chars,
                  row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
                  COUNT(*) OVER (PARTITION BY source) AS n
           FROM documents),
t AS (SELECT source, n_chars, n FROM r WHERE n <= 4 OR (rn > 2 AND rn <= n - 2))
SELECT source, CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS trimmed_mean,
       MAX(n) AS n_docs
FROM t GROUP BY source
""",
        "range_join": """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
sess AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM d),
s AS (SELECT user_id, session_id, MIN(ts) AS s_start FROM sess GROUP BY 1, 2),
c AS (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click')
SELECT s.user_id, s.session_id, COUNT(c.c_ts) AS n_clicks_1h
FROM s LEFT JOIN c
  ON s.user_id = c.user_id AND c.c_ts >= s.s_start
 AND c.c_ts < s.s_start + INTERVAL 1 HOUR
GROUP BY s.user_id, s.session_id
""",
        "cube_events": """
SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY CUBE (event_type, CAST(ts AS DATE))
""",
        "flagship_sequences": _FLAGSHIP_SQL,
        **_corpus_oracle_sql(),
    }
