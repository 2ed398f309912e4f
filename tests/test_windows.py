import numpy as np
import pandas as pd
import pytest

from engine.window_ops import (
    backward_fill,
    cumulative_stats,
    forward_fill,
    lag_features,
    rolling_aggregates,
    sessionize,
    top_k_per_group,
)
from tests.oracle import oracle_ffill, oracle_rolling, oracle_sessionize


@pytest.fixture(scope="module")
def events(seq_fixtures):
    return seq_fixtures["seq_events"]


@pytest.fixture(scope="module")
def pevents(events):
    return events.toPandas()


def _aligned(spark_pdf, col):
    return spark_pdf.sort_values(["doc_id", "ts"], kind="mergesort")[col].reset_index(drop=True)


def test_forward_fill(events, pevents):
    got = forward_fill(events, "doc_id", "ts", ["fvalue"]).toPandas()
    want = oracle_ffill(pevents, "doc_id", "ts", "fvalue").reset_index(drop=True)
    g = _aligned(got, "fvalue_ffill")
    assert np.allclose(g.astype(float), want.astype(float), equal_nan=True)


def test_backward_fill(events, pevents):
    got = backward_fill(events, "doc_id", "ts", ["fvalue"]).toPandas()
    p = pevents.sort_values(["doc_id", "ts"], kind="mergesort")
    want = p.groupby("doc_id")["fvalue"].bfill().reset_index(drop=True)
    g = _aligned(got, "fvalue_bfill")
    assert np.allclose(g.astype(float), want.astype(float), equal_nan=True)


def test_lag_lead(events, pevents):
    got = lag_features(events, "doc_id", "ts", ["fvalue"], lags=[1, 2], leads=[1]).toPandas()
    p = pevents.sort_values(["doc_id", "ts"], kind="mergesort")
    for col, shift in [("fvalue_lag1", 1), ("fvalue_lag2", 2), ("fvalue_lead1", -1)]:
        want = p.groupby("doc_id")["fvalue"].shift(shift).reset_index(drop=True)
        g = _aligned(got, col)
        assert np.allclose(g.astype(float), want.astype(float), equal_nan=True), col


def test_sessionize(events, pevents):
    gap = "6 hours"
    got = sessionize(events, "doc_id", "ts", gap=gap).toPandas()
    want = oracle_sessionize(pevents, "doc_id", "ts", 6 * 3600).reset_index(drop=True)
    g = _aligned(got, "session_id")
    assert (g.astype("int64").values == want.astype("int64").values).all()


@pytest.mark.parametrize("method", ["frame", "prefix"])
@pytest.mark.parametrize("fn", ["count", "sum", "avg"])
def test_rolling(events, pevents, fn, method):
    got = rolling_aggregates(
        events, "doc_id", "ts", {"fvalue": [fn]}, window="2 days", method=method
    ).toPandas()
    want = oracle_rolling(pevents, "doc_id", "ts", "fvalue", 2 * 86400, fn)
    want = want.reset_index(drop=True)
    g = _aligned(got, f"fvalue_{fn}_2days")
    assert np.allclose(g.astype(float), want.astype(float), equal_nan=True)


def test_rolling_stddev_methods_agree(events):
    f = rolling_aggregates(
        events, "doc_id", "ts", {"fvalue": ["stddev"]}, window="2 days", method="frame"
    ).toPandas()
    p = rolling_aggregates(
        events, "doc_id", "ts", {"fvalue": ["stddev"]}, window="2 days", method="prefix"
    ).toPandas()
    key = ["doc_id", "ts"]
    f = f.sort_values(key, kind="mergesort").reset_index(drop=True)
    p = p.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert np.allclose(
        f["fvalue_stddev_2days"].astype(float),
        p["fvalue_stddev_2days"].astype(float),
        equal_nan=True,
    )


def test_rolling_prefix_rejects_minmax(events):
    with pytest.raises(ValueError, match="prefix"):
        rolling_aggregates(
            events, "doc_id", "ts", {"fvalue": ["min"]}, window="1 day", method="prefix"
        )


def test_cumulative(events, pevents):
    got = cumulative_stats(events, "doc_id", "ts", {"fvalue": ["sum", "count"]}).toPandas()
    p = pevents.sort_values(["doc_id", "ts"], kind="mergesort")
    # SQL SUM over a running frame ignores nulls (emits the running sum on a
    # null row); pandas cumsum emits NaN there — forward-fill within the group.
    want_sum = (
        p.assign(_cs=p.groupby("doc_id")["fvalue"].cumsum())
        .groupby("doc_id")["_cs"]
        .ffill()
        .reset_index(drop=True)
    )
    g = _aligned(got, "fvalue_cumsum")
    assert np.allclose(g.astype(float), want_sum.astype(float), equal_nan=True)
    want_cnt = (
        p["fvalue"].notna().groupby(p["doc_id"]).cumsum().reset_index(drop=True)
    )
    g = _aligned(got, "fvalue_cumcount")
    assert (g.astype("int64").values == want_cnt.astype("int64").values).all()


def test_top_k_per_group(events, pevents):
    got = top_k_per_group(events, "doc_id", "ts", k=1, desc=True, tiebreak="fcat").toPandas()
    want_n = pevents["doc_id"].nunique()
    assert len(got) == want_n
    p_max = pevents.groupby("doc_id")["ts"].max()
    g = got.set_index("doc_id")["ts"]
    assert (g.sort_index() == p_max.sort_index()).all()
