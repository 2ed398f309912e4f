"""Stage-by-stage wall-time profile of the flagship pipeline at a given
parallelism — diagnoses which stage stops scaling (skew / overhead).

Usage: python scripts/profile_flagship.py <cores> [n_docs] [hot_pct]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    hot_pct = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    spark = (
        SparkSession.builder.appName("afg-profile")
        .master(f"local[{cores}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from engine.asof import asof_join
    from engine.datagen import gen_probes, gen_seq_events, gen_sequences
    from engine.skew import two_level_agg
    from engine.window_ops import lag_features, rolling_aggregates, sessionize

    def mat(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    def timed(label, df, out):
        t0 = time.time()
        mat(df)
        out[label] = round(time.time() - t0, 2)

    res: dict[str, float] = {}
    seqs = gen_sequences(spark, n_docs, seed=42)
    ev = gen_seq_events(spark, n_docs, seed=42, hot_frac_pct=hot_pct)
    probes = gen_probes(spark, n_docs, n_docs * 2, seed=42, hot_frac_pct=hot_pct)

    # warmup: run datagen once so codegen/JIT costs are excluded below
    mat(ev)

    timed("gen_sequences", seqs, res)
    timed("gen_seq_events", ev, res)
    timed("gen_probes", probes, res)

    feat = asof_join(
        probes, ev, on="doc_id", probe_ts="asof_ts", state_ts="ts",
        values=["fvalue", "fcat"], suffix="_last",
    )
    timed("asof", feat, res)
    feat = lag_features(feat, "doc_id", "asof_ts", ["fvalue_last"], lags=[1, 2])
    timed("asof+lag", feat, res)
    feat = sessionize(feat, "doc_id", "asof_ts", gap="1 hour")
    timed("asof+lag+sess", feat, res)
    feat = rolling_aggregates(
        feat, "doc_id", "asof_ts", {"fvalue_last": ["count", "sum"]}, window="1 day"
    )
    timed("asof+lag+sess+roll", feat, res)
    out = feat.join(seqs, "doc_id", "left")
    timed("out(+seq join)", out, res)
    src_stats = two_level_agg(
        out, "source", {"fvalue_last": ["count", "sum", "avg"]}, buckets=16
    )
    timed("src_stats", src_stats, res)

    print(json.dumps({"cores": cores, "n_docs": n_docs, "hot_pct": hot_pct, "stages": res}))
    spark.stop()


if __name__ == "__main__":
    main()
