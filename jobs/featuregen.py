"""Production feature-generation job (SURVEY.md §3.2).

Launch:
  spark-submit --py-files engine.zip jobs/featuregen.py \
      --input /root/testdata/sf0.1 --output /tmp/featout \
      --partitions 64 --chunk-size 16 --gap "30 minutes" --lags 1 2

Runs the flagship pipeline (as-of join + ffill-semantics last-value + lag +
sessionize + trailing aggregates) per stable hash-partition of the entity key,
committing each partition atomically with lineage + throughput metrics.
A killed run resumes: committed partitions are skipped without recomputation.

Inputs: either the driver testdata ``events`` table (entity=user_id, probes =
click events) or ``--synthetic N`` for the tokenized ``sequences`` corpus +
``seq_events`` + ``probes`` (entity=doc_id).

Fault injection for the resume test: ``--kill-after-chunks K`` exits the
process ungracefully after K committed chunks.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from engine import cache
from engine.checkpoint import PID_COL, CheckpointManager, ParquetJournalTableIO, with_partition_id
from engine.io import read_table
from engine.plan import FeatureEngine


def build_features(probes, state, entity, probe_ts, values, gap, lags,
                   asof_strategy="hybrid", hot_keys=None):
    """Build the flagship pipeline through the FeaturePlan IR (§3.1) so the
    serialized plan rides in the checkpoint lineage — a resumed job can
    prove exactly what pipeline produced each committed partition.

    With ``asof_strategy='hybrid'`` the hot/cold split happens at the
    PIPELINE level (engine.plan.lower hot_keys=...): the plan steps stay
    'union' and the lowering routes pre-detected hot keys through the
    time-bucketed variants of every per-entity operator."""
    step_strategy = "union" if asof_strategy == "hybrid" else asof_strategy
    eng = (
        FeatureEngine(probes, entity=entity, ts=probe_ts)
        .asof(state, values=values, suffix="_last", strategy=step_strategy)
        .lag([values[0] + "_last"], lags=list(lags))
        .sessionize(gap)
        .rolling({values[0] + "_last": ["count", "sum"]}, "1 day", method="prefix")
    )
    keys = hot_keys if asof_strategy == "hybrid" else None
    return eng.to_df(hot_keys=keys), eng.plan


def stage_inputs(spark, probes_p, state_p, stage_dir, files_per_pid: int = 8):
    """Write the pid-partitioned inputs ONCE so each chunk's scan
    partition-prunes (PartitionFilters on __pid) to its own pids instead of
    re-decoding the full input. Without staging, the chunk filter is a
    predicate on a COMPUTED hash column — nothing for the reader to prune —
    so a P/chunk_size-chunk run pays P/chunk_size full input scans
    (measured: 63% overhead at 8M docs / 4 chunks; staged overhead in the
    same record, BENCH/BASELINE.md).

    Cost model at scale: staging = one extra full-input exchange + write,
    amortized across all chunks; the repartition keys on (pid, sub-bucket)
    so each pid lands in ~files_per_pid files and no single task serializes
    a whole pid. Resume-safe/idempotent: a table is reused only when its
    write completed (_SUCCESS); pid assignment is data-determined, so a
    restaged table is bit-identical.
    """
    out = {}
    for name, df in (("probes", probes_p), ("state", state_p)):
        d = os.path.join(stage_dir, name)
        sub = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns if c != PID_COL]),
            F.lit(files_per_pid),
        )
        if not os.path.exists(os.path.join(d, "_SUCCESS")):
            (
                df.repartition(F.col(PID_COL), sub)
                .write.mode("overwrite")
                .partitionBy(PID_COL)
                .parquet(d)
            )
        out[name] = spark.read.parquet(d)
    return out["probes"], out["state"]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.001")
    ap.add_argument("--output", required=True)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="if >0: n_docs of synthetic sequences corpus instead of events")
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--chunk-size", type=int, default=8)
    ap.add_argument("--gap", default="30 minutes")
    ap.add_argument("--lags", type=int, nargs="+", default=[1])
    ap.add_argument("--parallelism", type=int, default=0, help="spark.sql.shuffle.partitions")
    ap.add_argument("--asof-strategy", default="hybrid",
                    choices=["union", "merge", "bucketed", "hybrid"],
                    help="physical as-of strategy; hybrid = hot/cold skew split")
    ap.add_argument("--output-partition-by", nargs="*", default=[],
                    help="extra hive-partition columns under the pid layout "
                         "(P4 pruning for downstream readers), e.g. source")
    ap.add_argument("--stage-input", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="write pid-partitioned input copies once under "
                         "<output>/_staged so chunk scans partition-prune "
                         "instead of re-decoding the full input per chunk. "
                         "DEFAULT since r5: measured strictly better (30.6%% "
                         "vs 40%% checkpoint overhead at 8M docs/4 chunks, "
                         "BENCH/BASELINE.md); --no-stage-input is the escape "
                         "hatch for outputs on write-expensive storage")
    ap.add_argument("--kill-after-chunks", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("afg-featuregen").getOrCreate()
    if args.parallelism:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.parallelism))
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic:
        from engine.datagen import gen_probes, gen_seq_events, gen_sequences

        entity, probe_ts, values = "doc_id", "asof_ts", ["fvalue", "fcat"]
        state = gen_seq_events(spark, args.synthetic, seed=args.seed)
        probes = gen_probes(spark, args.synthetic, args.synthetic * 2, seed=args.seed)
        seqs = gen_sequences(spark, args.synthetic, seed=args.seed)
        probes = probes.join(seqs.select("doc_id", "n_tok", "source"), "doc_id", "left")
    else:
        entity, probe_ts, values = "user_id", "ts", ["value", "event_type"]
        e = read_table(spark, args.input, "events")
        probes = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
        state = e.where(F.col("event_type") != "click").select(
            "user_id", "ts", "value", "event_type"
        )

    hot_keys = None
    if args.asof_strategy == "hybrid":
        # per-input metadata, detected once (sampled partial-agg count).
        # Cost-based (r3): a key is only routed to the time-bucketed plan
        # when its serial window task would actually straggle the job —
        # below that bar the fused plan degenerates to the plain chain,
        # which is faster (the hybrid machinery's fixed costs are real).
        from engine.skew import straggler_hot_keys

        n = probes.count() + state.count()
        hot_keys = straggler_hot_keys(
            probes.select(entity).unionByName(state.select(entity)), entity, n,
            cores=spark.sparkContext.defaultParallelism,
            sample_fraction=0.05 if n > 1_000_000 else None,
        )
        print(f"hot keys routed (straggler condition): {len(hot_keys)}")

    io = ParquetJournalTableIO(args.output, extra_partition_cols=args.output_partition_by)
    mgr = CheckpointManager(io, args.partitions)
    pending = mgr.pending()
    print(f"partitions={args.partitions} pending={len(pending)} "
          f"committed={args.partitions - len(pending)}")

    probes_p = with_partition_id(probes, entity, args.partitions)
    state_p = with_partition_id(state, entity, args.partitions)
    if args.stage_input:
        probes_p, state_p = stage_inputs(
            spark, probes_p, state_p, os.path.join(args.output, "_staged")
        )

    t_start = time.time()
    total_rows = 0
    chunks_done = 0
    lineage = None
    for i in range(0, len(pending), args.chunk_size):
        chunk = pending[i : i + args.chunk_size]
        cp = probes_p.where(F.col(PID_COL).isin(chunk))
        cs = state_p.where(F.col(PID_COL).isin(chunk)).drop(PID_COL)
        feat, plan = build_features(cp, cs, entity, probe_ts, values, args.gap,
                                    args.lags, asof_strategy=args.asof_strategy,
                                    hot_keys=hot_keys)
        if lineage is None:
            lineage = {
                "inputs": {"input": args.input, "synthetic": args.synthetic, "seed": args.seed},
                "params": {"gap": args.gap, "lags": args.lags, "partitions": args.partitions,
                           "asof_strategy": args.asof_strategy,
                           "stage_input": args.stage_input,
                           "n_hot_keys": len(hot_keys or [])},
                "plan": plan.to_dict(),
                "code_version": os.environ.get("AFG_CODE_VERSION", "dev"),
            }
        stats = mgr.run_chunk(chunk, feat, lineage)
        # drop the hot-branch / as-of intermediates this chunk persisted —
        # without this the chunked loop pins new cache blocks per chunk for
        # the life of the application
        cache.release_all()
        total_rows += stats["rows"]
        chunks_done += 1
        print(f"chunk {chunks_done}: pids={chunk} rows={stats['rows']} "
              f"wall={stats['wall_s']:.2f}s")
        if args.kill_after_chunks and chunks_done >= args.kill_after_chunks:
            print("FAULT INJECTION: killing job now", flush=True)
            os._exit(42)

    wall = time.time() - t_start
    summary = {
        "rows": total_rows,
        "wall_s": round(wall, 2),
        "rows_per_s": round(total_rows / wall, 1) if wall else None,
        "partitions": args.partitions,
    }
    print("SUMMARY " + json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
