"""Sum Spark task metrics from event logs — the honest scaling diagnostic.

Walls grade the host; Σ task metrics grade the ENGINE: if two legs at
different parallelism report the same Σ CPU and the same shuffle bytes, the
plan does identical work and any wall-clock gap is hardware contention
(memory bandwidth / GC / disk), not plan shape.  See the r3 finding where
per-task CPU inflation from sort-prefix cache misses masqueraded as a
scaling gap.

Usage:
    python scripts/tasksum.py <eventlog-dir-or-file> [--after <epoch_ms>]

Sums over all SparkListenerTaskEnd events (optionally only tasks LAUNCHED
at/after --after, so warmup / corpus generation can be fenced out) and
prints one JSON line:

    {"files": N, "tasks": N, "cpu_s": Σ executor CPU, "run_s": Σ run time,
     "gc_s": Σ JVM GC, "shuffle_write_mb": Σ bytes written,
     "shuffle_read_mb": Σ local+remote bytes read,
     "spill_disk_mb": ..., "input_mb": ...}

Event logs are written zstd-compressed by bench.get_spark when
AFG_EVENTLOG_DIR is set.
"""

from __future__ import annotations

import io
import json
import os
import sys


def _open_log(path: str):
    if path.endswith(".zstd") or path.endswith(".zst"):
        try:
            import zstandard as zstd  # pyspark vendors zstandard

            fh = open(path, "rb")
            return io.TextIOWrapper(
                zstd.ZstdDecompressor().stream_reader(fh), encoding="utf-8"
            )
        except ImportError:
            import subprocess

            p = subprocess.run(
                ["zstd", "-d", "-q", "-c", path], capture_output=True, text=True
            )
            return io.StringIO(p.stdout)
    return open(path, "r", encoding="utf-8")


def summarize(paths: list[str], after_ms: int = 0) -> dict:
    tot = {
        "files": 0,
        "tasks": 0,
        "cpu_s": 0.0,
        "run_s": 0.0,
        "gc_s": 0.0,
        "shuffle_write_mb": 0.0,
        "shuffle_read_mb": 0.0,
        "spill_disk_mb": 0.0,
        "input_mb": 0.0,
    }
    for path in paths:
        tot["files"] += 1
        with _open_log(path) as fh:
            for line in fh:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                ev = json.loads(line)
                ti = ev.get("Task Info") or {}
                if ti.get("Launch Time", 0) < after_ms:
                    continue
                tm = ev.get("Task Metrics") or {}
                if not tm:
                    continue
                tot["tasks"] += 1
                tot["cpu_s"] += tm.get("Executor CPU Time", 0) / 1e9
                tot["run_s"] += tm.get("Executor Run Time", 0) / 1e3
                tot["gc_s"] += tm.get("JVM GC Time", 0) / 1e3
                sw = tm.get("Shuffle Write Metrics") or {}
                tot["shuffle_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                sr = tm.get("Shuffle Read Metrics") or {}
                tot["shuffle_read_mb"] += (
                    sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
                ) / 1e6
                tot["spill_disk_mb"] += tm.get("Disk Bytes Spilled", 0) / 1e6
                im = tm.get("Input Metrics") or {}
                tot["input_mb"] += im.get("Bytes Read", 0) / 1e6
    for k in list(tot):
        if isinstance(tot[k], float):
            tot[k] = round(tot[k], 1)
    return tot


def main() -> None:
    target = sys.argv[1]
    after_ms = 0
    if "--after" in sys.argv:
        after_ms = int(sys.argv[sys.argv.index("--after") + 1])
    if os.path.isdir(target):
        paths = [
            os.path.join(target, f)
            for f in sorted(os.listdir(target))
            if not f.endswith(".inprogress")
        ]
    else:
        paths = [target]
    print(json.dumps(summarize(paths, after_ms)))


if __name__ == "__main__":
    main()
