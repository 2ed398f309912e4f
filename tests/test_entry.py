"""Driver-contract smoke: entry() runs, every queries() entry returns rows at
sf0.001, oracle_sql() keys ⊆ queries() keys. The full value-level oracle
comparison runs via scripts/check_oracle.py at sf0.01 (driver replica)."""

import __spark_entry__ as E

# The documented tail entries (each covered by a named in-window twin —
# see the queries() docstring). The driver's correctness gate runs the FIRST
# 50 dict entries, so these must sit at the END of queries().
TAIL = [
    "sessionize",
    "asof_bucketed",
    "rollup_events",
    "cube_events",
    "session_window_agg",
    "simhash_pairs",
    "embedding_near_dup",
    "ann_lsh_topk",
    "flagship_sequences",
    "frame_sample",    # r4: C14 upgraded pytest-only -> hash-exact tail oracle
    # r4 corpus sampling/mixing family (C16-C18), hash-exact tail oracles
    "stratified_sample",
    "exact_k_sample",
    "weighted_mix",
    # r4 training-set prep family (C19-C21), hash-exact tail oracles
    "decontaminate",
    "pack_sequences",
    "vocab_topk",
    "repetition_stats",  # r4 C22: intra-doc repetition filters
    "tfidf_terms",       # r4 C23: per-doc tf-idf top-k terms
    "pii_scrub",         # r4 C24: PII detection/redaction
    "ngram_topk",        # r4 C25: corpus token-bigram stats
    "approx_quantiles",  # r4 G9: quantile sketch + exact positional gate
    "length_buckets",    # r4 C26: sequence-length bucketing
    "resize_plumbing",   # r4 C27: image-resize plumbing
    "dedup_clusters",    # r4 C28: connected-components dedup keep-list
    "sliding_agg",       # r4 §2.8: sliding windowed aggregate
    "label_agreement",   # r4 C29: leave-one-out k-NN label-noise screen
]
DRIVER_WINDOW = 50


def test_driver_window_ordering():
    """r3 advice: the first-50 ordering contract was only a comment — a
    mid-dict insertion would silently push a unique-operator query out of
    the driver's correctness window. Assert the tail entries are exactly
    the last entries and every non-tail entry sits inside the window."""
    names = list(E.queries())
    assert names[-len(TAIL):] == TAIL
    non_tail = names[: -len(TAIL)]
    assert len(non_tail) <= DRIVER_WINDOW, (
        f"{len(non_tail)} non-tail entries exceed the driver's "
        f"{DRIVER_WINDOW}-entry window; move a covered entry to the tail"
    )


def test_oracle_keys_subset():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    # every oracle-less query is intentionally rows-only
    rows_only = set(qs) - set(os_)
    assert rows_only == {
        "simhash_pairs",        # xxhash64 has no DuckDB analogue
        # (r3: multimodal_decode + approx_distinct upgraded to hash-exact;
        #  r4: flagship_sequences upgraded — shared-parquet corpus +
        #  ASOF JOIN / window SQL oracle)
    }, rows_only


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0


def test_all_queries_return_rows(spark, sf_dir):
    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() > 0, name
