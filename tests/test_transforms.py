import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.io import read_table
from engine.transforms.column import direct_features, minmax_normalize, rank_normalize, standardize
from engine.transforms.row import ROW_FUNCTIONS, apply_row_features
from engine.transforms.table import agg_features, grouped_map, grouped_zscore


def test_row_features_numeric(spark, sf_dir):
    e = read_table(spark, sf_dir, "events").limit(200)
    out = apply_row_features(
        e, [("v_log1p", "log1p", "value"), ("v_sqrt", "sqrt", "value"), ("h", "hour", "ts")]
    ).toPandas()
    assert np.allclose(out["v_log1p"], np.log1p(out["value"]))
    assert np.allclose(out["v_sqrt"], np.sqrt(out["value"]))
    assert (out["h"] == pd.to_datetime(out["ts"]).dt.hour).all()


def test_row_features_tokens_jvm_only(seq_fixtures):
    seqs = seq_fixtures["sequences"]
    out = apply_row_features(
        seqs,
        [
            ("nt", "n_tokens", "tokens"),
            ("nu", "n_unique_tokens", "tokens"),
            ("tsum", "token_sum", "tokens"),
            ("tmean", "token_mean", "tokens"),
        ],
    ).toPandas()
    for _, r in out.head(50).iterrows():
        toks = np.asarray(r["tokens"])
        assert r["nt"] == len(toks)
        assert r["nu"] == len(np.unique(toks))
        assert r["tsum"] == toks.sum()
        assert np.isclose(r["tmean"], toks.mean())


def test_unknown_row_function_raises(seq_fixtures):
    with pytest.raises(KeyError):
        apply_row_features(seq_fixtures["sequences"], [("x", "nope", "tokens")])


def test_direct_features(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    out = direct_features(
        orders, cust, fk="o_custkey", parent_key="c_custkey",
        cols=["c_mktsegment"], prefix="c_",
    ).toPandas()
    want = orders.toPandas().merge(
        cust.toPandas()[["c_custkey", "c_mktsegment"]].rename(
            columns={"c_mktsegment": "c_c_mktsegment"}
        ),
        left_on="o_custkey", right_on="c_custkey", how="left",
    ).drop(columns="c_custkey")
    assert len(out) == len(want)
    a = out.sort_values("o_orderkey").reset_index(drop=True)
    b = want.sort_values("o_orderkey").reset_index(drop=True)
    assert (a["c_c_mktsegment"].fillna("") == b["c_c_mktsegment"].fillna("")).all()


def test_agg_features_cutoff(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    cutoff = "2024-01-10 00:00:00"
    out = agg_features(
        e, "user_id", {"value": ["count", "sum"]}, cutoff=cutoff, ts_col="ts"
    ).toPandas()
    p = e.toPandas()
    p = p[p["ts"] <= pd.Timestamp(cutoff)]
    want = p.groupby("user_id")["value"].agg(["count", "sum"])
    got = out.set_index("user_id").sort_index()
    assert (got["value_count"] == want["count"].sort_index()).all()
    assert np.allclose(got["value_sum"], want["sum"].sort_index())


def test_standardize_minmax_rank(spark, sf_dir):
    e = read_table(spark, sf_dir, "events").select("event_id", "value")
    p = e.toPandas()
    z = standardize(e, ["value"]).toPandas().sort_values("event_id")
    want_z = (p["value"] - p["value"].mean()) / p["value"].std(ddof=1)
    assert np.allclose(z["value_z"].values, want_z.values, rtol=1e-9)

    mm = minmax_normalize(e, ["value"]).toPandas().sort_values("event_id")
    rng = p["value"].max() - p["value"].min()
    assert np.allclose(mm["value_mm"].values, ((p["value"] - p["value"].min()) / rng).values)

    rk = rank_normalize(e, "value").toPandas()
    assert rk["value_pctrank"].between(0, 1).all()


def test_grouped_zscore_and_grouped_map(spark, seq_fixtures):
    ev = seq_fixtures["seq_events"]
    gz = grouped_zscore(ev, "fcat", "fvalue").toPandas()
    p = ev.toPandas()
    mu = p.groupby("fcat")["fvalue"].transform("mean")
    sd = p.groupby("fcat")["fvalue"].transform(lambda s: s.std(ddof=1))
    want = (p["fvalue"] - mu) / sd
    a = gz.sort_values(["doc_id", "ts", "fvalue"])["fvalue_gz"].reset_index(drop=True)
    b = want.loc[p.sort_values(["doc_id", "ts", "fvalue"]).index].reset_index(drop=True)
    assert np.allclose(a.astype(float), b.astype(float), equal_nan=True)

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["fvalue_dm"] = pdf["fvalue"] - pdf["fvalue"].mean()
        return pdf[["fcat", "fvalue_dm"]]

    gm = grouped_map(
        ev, "fcat", demean, schema="fcat string, fvalue_dm double",
        prune=["fcat", "fvalue"],
    )
    got = gm.groupBy("fcat").agg(F.avg("fvalue_dm").alias("m")).toPandas()
    assert np.allclose(got["m"].astype(float), 0.0, atol=1e-9)


def test_grouped_agg_udaf(spark, seq_fixtures):
    """G6: custom vectorized aggregate (trimmed mean) in groupBy().agg()."""
    from engine.transforms.table import make_grouped_agg_udaf

    ev = seq_fixtures["seq_events"]

    def trimmed_mean(s: pd.Series) -> float:
        s = s.dropna().sort_values()
        k = max(1, int(len(s) * 0.1))
        inner = s.iloc[k:-k] if len(s) > 2 * k else s
        return float(inner.mean()) if len(inner) else float("nan")

    udaf = make_grouped_agg_udaf(trimmed_mean)
    got = (
        ev.groupBy("fcat").agg(udaf("fvalue").alias("tm"))
        .toPandas().set_index("fcat")["tm"]
    )
    p = ev.toPandas()
    for fcat, grp in p.groupby("fcat"):
        want = trimmed_mean(grp["fvalue"])
        assert np.isclose(got[fcat], want, equal_nan=True), fcat


def test_quantile_sketch_gate_matches_numpy(spark):
    """G9 python oracle: exact lower quantiles at rank floor(q*(n-1))+1 and
    a GK sketch that must sit inside its rank-error band."""
    import math

    import numpy as np

    from engine.transforms.table import quantile_sketch_gate

    rng = np.random.RandomState(7)
    rows = [
        (f"g{i % 3}", int(v))
        for i, v in enumerate(rng.randint(0, 10_000, size=3000))
    ]
    df = spark.createDataFrame(rows, ["k", "cents"])
    out = {r.k: r for r in quantile_sketch_gate(df, "k", "cents", qs=(0.5, 0.9), accuracy=100).collect()}
    by_k = {}
    for k, v in rows:
        by_k.setdefault(k, []).append(v)
    for k, vals in by_k.items():
        vals.sort()
        n = len(vals)
        r = out[k]
        assert r.n == n
        assert r.p5_exact == vals[math.floor(0.5 * (n - 1))]
        assert r.p9_exact == vals[math.floor(0.9 * (n - 1))]
        assert r.approx_ok


def test_quantile_sketch_gate_ignores_nulls(spark):
    """r4 ADVICE regression: null values must not shift ranks or counts.
    Exact quantiles come from the NON-null multiset (matching what
    percentile_approx sees) and an all-null key drops out entirely."""
    import math

    from engine.transforms.table import quantile_sketch_gate

    vals = list(range(100))
    rows = (
        [("a", v) for v in vals]
        + [("a", None)] * 37          # nulls interleaved into a real key
        + [("b", None)] * 5           # an all-null key
    )
    df = spark.createDataFrame(rows, "k string, cents long")
    out = {r.k: r for r in quantile_sketch_gate(
        df, "k", "cents", qs=(0.5, 0.9), accuracy=100).collect()}
    assert set(out) == {"a"}, "all-null key must drop out, not report ranks"
    n = len(vals)
    r = out["a"]
    assert r.n == n
    assert r.p5_exact == sorted(vals)[math.floor(0.5 * (n - 1))]
    assert r.p9_exact == sorted(vals)[math.floor(0.9 * (n - 1))]
    assert r.approx_ok
