"""P4 partition-pruning layout: a partitioned write must produce a layout a
filtered read prunes at plan level (PartitionFilters), with exact round-trip
contents."""

import io as _io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from engine.io import read_table, write_partitioned


def _formatted_plan(df) -> str:
    buf = _io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    e = read_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    write_partitioned(e, out, "event_type", max_records_per_file=100_000)

    back = spark.read.parquet(out)
    clicks = back.where(F.col("event_type") == "click")
    plan = _formatted_plan(clicks)
    assert "PartitionFilters" in plan
    # the partition filter actually carries the predicate (not an empty list)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "event_type" in pf and "[]" not in pf.replace("[], ", "x")

    # contents round-trip exactly (partition column moves to the directory)
    want = e.where(F.col("event_type") == "click").count()
    assert clicks.count() == want

    # non-partition filters still push down as data filters
    vals = back.where(F.col("value") > 100.0)
    plan2 = _formatted_plan(vals)
    assert "PushedFilters" in plan2 and "value" in plan2
