"""Corpus sampling/mixing (SURVEY.md §2.10 C16-C18) — python-oracle tests
per SURVEY.md §5.1. Hash-exactness vs DuckDB is covered by the
test_tail_oracle entries; these pin the semantic properties:
determinism, rate-nesting, stratification, exact-k, and mixture shares.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from engine.corpus.sampling import (
    COIN_SPACE,
    exact_k_sample,
    hash_sample,
    rate_threshold,
    stratified_sample,
    weighted_mix,
)
from engine.io import read_table


def _py_coin(doc_id: int, salt: str = "afg") -> int:
    return int(hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()[:4], 16)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )


def test_coin_matches_python_md5(docs):
    from engine.corpus.sampling import sample_coin

    rows = docs.select("doc_id", sample_coin(["doc_id"]).alias("coin")).collect()
    assert rows
    for r in rows:
        assert r.coin == _py_coin(r.doc_id), r.doc_id


def test_hash_sample_deterministic_nested_and_partition_invariant(docs):
    s50a = {r.doc_id for r in hash_sample(docs, 0.5).collect()}
    s50b = {r.doc_id for r in hash_sample(docs.repartition(7), 0.5).collect()}
    s25 = {r.doc_id for r in hash_sample(docs, 0.25).collect()}
    assert s50a == s50b  # membership survives any re-partitioning
    assert s25 <= s50a   # thresholds over one fixed coin nest
    n = docs.count()
    assert abs(len(s50a) / n - 0.5) < 0.1  # 16-bit coin is uniform-ish
    # exact membership law: coin < floor(rate * 65536)
    expect = {r.doc_id for r in docs.collect() if _py_coin(r.doc_id) < rate_threshold(0.5)}
    assert s50a == expect


def test_stratified_rates_and_default(docs):
    out = stratified_sample(
        docs, "source", {"src0": 1.0, "src1": 0.0}, default_rate=0.5
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    all_src0 = {r.doc_id for r in docs.where(F.col("source") == "src0").collect()}
    assert by_src.get("src0") == all_src0  # rate 1.0 keeps everything
    assert "src1" not in by_src            # rate 0.0 drops everything
    for r in out:  # default strata obey the coin law at 0.5
        if r.source not in ("src0", "src1"):
            assert _py_coin(r.doc_id) < rate_threshold(0.5)


def test_exact_k_sample_sizes_and_determinism(docs):
    out = exact_k_sample(docs, "source", k=5)
    pdf = out.toPandas()
    sizes = pdf.groupby("source").size()
    n_per = docs.groupBy("source").count().toPandas().set_index("source")["count"]
    for src, n in n_per.items():
        assert sizes.get(src, 0) == min(5, n), src
    # rank is a permutation 1..k per stratum, and a re-run is identical
    assert set(pdf[pdf.source == "src0"]["sample_rank"]) == set(range(1, sizes["src0"] + 1))
    pdf2 = exact_k_sample(docs.repartition(5), "source", k=5).toPandas()
    a = pdf.sort_values(["source", "sample_rank"]).reset_index(drop=True)
    b = pdf2.sort_values(["source", "sample_rank"]).reset_index(drop=True)
    assert a[["doc_id", "source", "sample_rank"]].equals(b[["doc_id", "source", "sample_rank"]])


def test_weighted_mix_shares_and_binding_source(docs):
    weights = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    out = weighted_mix(docs, weights).toPandas()
    assert set(out.source) <= set(weights)  # unweighted sources dropped
    # the binding source (max T/w is NOT it — min T/w is) keeps rate 1.0
    totals = (
        docs.where(F.col("source").isin(*weights))
        .groupBy("source").agg(F.sum("n_chars").alias("T")).toPandas()
        .set_index("source")["T"]
    )
    binding = min(weights, key=lambda s: totals[s] / weights[s])
    rates = out.groupby("source")["mix_rate"].first()
    assert rates[binding] == 1.0
    assert (rates <= 1.0).all() and (rates > 0.0).all()
    # planned char-shares match the target weights exactly by construction:
    # rate_s * T_s / C == w_s for non-binding sources
    C = min(totals[s] / weights[s] for s in weights)
    for s in weights:
        assert rates[s] * totals[s] / C == pytest.approx(weights[s], rel=1e-12)
    # and every kept row obeys the coin law at its source's rate
    thr = {s: int(rates[s] * COIN_SPACE) for s in weights}
    for r in out.itertuples():
        assert _py_coin(r.doc_id) < thr[r.source]
