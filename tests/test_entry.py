"""Driver-contract smoke: entry() runs, every queries() entry returns rows at
sf0.001, oracle_sql() keys ⊆ queries() keys. The full value-level oracle
comparison runs via scripts/check_oracle.py at sf0.01 (driver replica)."""

import __spark_entry__ as E


def test_oracle_keys_subset():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    # every oracle-less query is intentionally rows-only
    rows_only = set(qs) - set(os_)
    assert rows_only == {
        "flagship_sequences",   # synthetic corpus, pandas-oracle-tested
        "simhash_pairs",        # xxhash64 has no DuckDB analogue
        # (r3: multimodal_decode + approx_distinct were upgraded to
        # hash-exact — sha256 reconstruction / in-query bound assertion)
    }, rows_only


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0


def test_all_queries_return_rows(spark, sf_dir):
    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() > 0, name
