"""FeaturePlan IR (§3.1/3.3) and Structured Streaming analogues (§2.8)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.io import read_table
from engine.plan import FeatureEngine, FeaturePlan, lower
from engine.streaming import (
    file_stream,
    run_available_now,
    session_window_agg,
    stateful_ffill,
    windowed_agg,
)
from engine.window_ops import lag_features, sessionize


def _probe_state(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    probes = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    state = e.where(F.col("event_type") != "click").select(
        "user_id", "ts", "value", F.col("event_type").alias("etype")
    )
    return probes, state


def test_plan_lowering_equals_direct_composition(spark, sf_dir):
    from engine.asof import asof_join

    probes, state = _probe_state(spark, sf_dir)
    fluent = (
        FeatureEngine(probes, entity="user_id", ts="ts")
        .asof(state, values=["value", "etype"], suffix="_last")
        .lag(["value_last"], lags=[1])
        .sessionize("30 minutes")
        .to_df()
    )
    direct = asof_join(
        probes, state, on="user_id", probe_ts="ts", state_ts="ts",
        values=["value", "etype"], suffix="_last",
    )
    direct = lag_features(direct, "user_id", "ts", ["value_last"], lags=[1])
    direct = sessionize(direct, "user_id", "ts", gap="30 minutes")
    assert fluent.exceptAll(direct).count() == 0
    assert direct.exceptAll(fluent).count() == 0


def test_plan_roundtrips_as_lineage(spark, sf_dir):
    probes, state = _probe_state(spark, sf_dir)
    eng = (
        FeatureEngine(probes, entity="user_id", ts="ts")
        .asof(state, values=["value"], suffix="_last")
        .lag(["value_last"], lags=[1, 2])
        .rolling({"value_last": ["count"]}, "1 hour")
    )
    d = eng.plan.to_dict()
    assert d["code_version"] and d["entity"] == "user_id"
    rehydrated = FeaturePlan.from_dict(d)
    assert rehydrated == eng.plan
    # a rehydrated plan lowers to the same result (lineage is executable)
    out_a = eng.to_df()
    out_b = lower(probes, rehydrated, {"state": state})
    assert out_a.exceptAll(out_b).count() == 0


def test_plan_unknown_op_raises(spark, sf_dir):
    probes, _ = _probe_state(spark, sf_dir)
    bad = FeaturePlan("user_id", "ts").add("warp_drive")
    with pytest.raises(ValueError, match="unknown plan op"):
        lower(probes, bad)


# ------------------------------------------------------------- streaming ----

def test_session_window_agg_batch_matches_gap_sessionize(spark, sf_dir):
    """session_window (≥ gap ⇒ new session) vs gap-cumsum sessionize
    (> gap ⇒ new session) agree when no gap is exactly the boundary."""
    e = read_table(spark, sf_dir, "events").select("user_id", "ts")
    sw = session_window_agg(e, "user_id", "ts", "30 minutes").toPandas()
    gs = (
        sessionize(e, "user_id", "ts", gap="30 minutes")
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_events"))
        .toPandas()
    )
    a = sw.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    b = gs.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["n_events"].values == b["n_events"].values).all()
    assert (a["session_start"].values == b["session_start"].values).all()


def test_streaming_windowed_agg_matches_batch(spark, sf_dir, tmp_path):
    e = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    # split input into 3 files so availableNow runs multiple micro-batches
    src = str(tmp_path / "stream_src")
    e.repartition(3).write.mode("overwrite").parquet(src)
    batch = windowed_agg(e, "user_id", "ts", {"value": ["count"]}, "1 hour").toPandas()

    stream = file_stream(spark, src, e.schema)
    agg = windowed_agg(stream, "user_id", "ts", {"value": ["count"]}, "1 hour",
                       watermark="2 hours")
    got = run_available_now(agg, "win_agg_test", output_mode="complete").toPandas()
    a = batch.sort_values(["user_id", "win_start"]).reset_index(drop=True)
    b = got.sort_values(["user_id", "win_start"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["value_count"].values == b["value_count"].values).all()


def test_stateful_ffill_stream_matches_batch(spark, sf_dir, tmp_path):
    from engine.window_ops import forward_fill
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType, TimestampNTZType,
    )

    e = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_type") == "error", None).otherwise(F.col("value")).alias("v"),
    )
    batch = forward_fill(e, "user_id", "ts", ["v"], out_suffix="_f").toPandas()

    # single file → one micro-batch: within-batch ffill must equal batch op
    src = str(tmp_path / "ffill_src")
    e.coalesce(1).write.mode("overwrite").parquet(src)
    schema = StructType([
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("v", DoubleType()),
    ])
    out_schema = StructType(schema.fields + [StructField("v_f", DoubleType())])
    stream = file_stream(spark, src, schema)
    filled = stateful_ffill(stream, "user_id", "ts", ["v"], out_schema)
    got = run_available_now(filled, "ffill_test").toPandas()

    a = batch.sort_values("event_id").reset_index(drop=True)
    b = got.sort_values("event_id").reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_series_equal(
        a["v_f"], b["v_f"], check_names=False, check_exact=True
    )
