"""Phase-level timing of the flagship pipeline at one core count.

Materializes each stage boundary separately (so later phases reuse the
persisted mid-frame exactly as the real pipeline does) and prints one JSON
line with per-phase seconds.  Usage:

    AFG_SHUFFLE_TMPFS=1 python scripts/flagship_profile.py <cores>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F

from engine import cache as _cache


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = bench.get_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    root = bench.ensure_corpus(spark, bench.BENCH_DOCS)

    from engine.asof import _PAYLOAD, _TAG, _TS_KEY, _tagged_union
    from engine.fused import fused_feature_chain
    from engine.skew import detect_hot_keys, two_level_agg
    from engine.cache import tracked_persist

    p = spark.read.parquet(os.path.join(root, "probes"))
    e = spark.read.parquet(os.path.join(root, "seq_events"))
    n = p.count() + e.count()
    thr = max(10_000, (4 * n) // int(spark.conf.get("spark.sql.shuffle.partitions")))
    hot = detect_hot_keys(
        p.select("doc_id").unionByName(e.select("doc_id")), "doc_id", thr,
        sample_fraction=0.05,
    )
    n_docs = int(os.path.basename(root).split("_")[0])
    seqs = bench.read_sequences(spark, root, n_docs)
    srcsel = seqs.select("doc_id", "source")

    # warm full pipeline once (codegen + page cache)
    out, stats = bench.flagship_pipeline(spark, root, strategy="hybrid", hot_keys=hot)
    bench.materialize(out)
    bench.materialize(stats)
    _cache.release_all()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()

    phases: dict[str, float] = {}

    BUCKET_US = 6 * 3_600_000_000

    t0 = time.time()
    feat = fused_feature_chain(
        p, e, on="doc_id", probe_ts="asof_ts", state_ts="ts",
        values=["fvalue", "fcat"], suffix="_last",
        lag_cols=["fvalue_last"], lags=[1, 2],
        session_gap="1 hour",
        rolling={"fvalue_last": ["count", "sum"]},
        rolling_window="1 day",
        bucket=BUCKET_US / 1e6,
        hot_keys=hot,
    )
    feat = tracked_persist(feat)
    bench.materialize(feat)
    phases["fused_chain_noop"] = round(time.time() - t0, 3)

    from engine import hotwin

    t0 = time.time()
    pred = hotwin.hot_predicate("doc_id", hot)
    not_hot = ~F.coalesce(pred, F.lit(False))
    out = feat.where(not_hot).join(seqs, "doc_id", "left").unionByName(
        feat.where(pred).join(F.broadcast(seqs.where(pred)), "doc_id", "left")
    )
    bench.materialize(out)
    phases["token_join_noop"] = round(time.time() - t0, 3)

    t0 = time.time()
    src_join = feat.where(not_hot).join(srcsel, "doc_id", "left").unionByName(
        feat.where(pred).join(F.broadcast(srcsel.where(pred)), "doc_id", "left")
    )
    stats = two_level_agg(
        src_join, "source", {"fvalue_last": ["count", "sum", "avg"]}, buckets=16
    )
    bench.materialize(stats)
    phases["src_stats_noop"] = round(time.time() - t0, 3)

    # second run of the chain alone with phase-internal splits:
    _cache.release_all()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()

    # E1 + persist only: materialize the mid frame via the internal helper
    t0 = time.time()
    keys = ["doc_id"]
    unioned, probe_cols = _tagged_union(
        p, e, keys, "asof_ts", "ts", ["fvalue", "fcat"],
        ["fvalue_last", "fcat_last"],
    )
    from pyspark.sql import Window

    pred2 = hotwin.hot_predicate("doc_id", hot)
    b = F.when(pred2, F.floor(F.col(_TS_KEY) / F.lit(BUCKET_US))).otherwise(F.lit(0))
    unioned = unioned.withColumn("__fx_b", b)
    w_asof = (
        Window.partitionBy("doc_id", "__fx_b")
        .orderBy(F.col(_TS_KEY).asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mid_all = tracked_persist(
        unioned.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w_asof))
    )
    bench.materialize(mid_all)
    phases["e1_union_window_persist"] = round(time.time() - t0, 3)

    print(json.dumps({"cores": cores,
                      "tmpfs": os.environ.get("AFG_SHUFFLE_TMPFS", "0") == "1",
                      "phases": phases}))
    spark.stop()


if __name__ == "__main__":
    main()
