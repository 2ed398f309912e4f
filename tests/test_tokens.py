"""Token-array invariant (BASELINE.json:15): per-row output token arrays are
EXACTLY equal to the input — element values and int32 element type — through
the full feature pipeline. SURVEY.md §5.4."""

import numpy as np
import pyarrow as pa
from pyspark.sql import functions as F

from engine.asof import asof_join
from engine.window_ops import lag_features, sessionize


def _token_map(df):
    """doc_id -> (np int32 array) via Arrow (no pandas upcast on the way out)."""
    tbl = pa.Table.from_batches(df.select("doc_id", "tokens")._collect_as_arrow())
    assert tbl.schema.field("tokens").type == pa.list_(pa.int32()), tbl.schema
    out = {}
    for batch in tbl.to_batches():
        ids = batch.column("doc_id").to_pylist()
        toks = batch.column("tokens")
        for i, d in enumerate(ids):
            out[d] = np.asarray(toks[i].as_py(), dtype=np.int64)
    return out


def test_tokens_roundtrip_pipeline(spark, seq_fixtures):
    seqs = seq_fixtures["sequences"]
    ev = seq_fixtures["seq_events"]
    before = _token_map(seqs)

    # full pipeline: per-doc latest feature values joined back onto the corpus
    feat = asof_join(
        seqs.select("doc_id", F.lit("2024-02-15 00:00:00").cast("timestamp_ntz").alias("asof_ts"),
                    "tokens", "n_tok", "source"),
        ev, on="doc_id", probe_ts="asof_ts", state_ts="ts",
        values=["fvalue", "fcat"], suffix="_last",
    )
    after = _token_map(feat)

    assert set(before) == set(after)
    for d, arr in before.items():
        assert np.array_equal(arr, after[d]), d


def test_n_tok_invariant(seq_fixtures):
    seqs = seq_fixtures["sequences"]
    bad = seqs.where(F.col("n_tok") != F.size("tokens")).count()
    assert bad == 0
    assert dict(seqs.dtypes)["tokens"] == "array<int>"
    assert dict(seqs.dtypes)["n_tok"] == "int"


def test_source_skew_present(seq_fixtures):
    """Generator contract: src0 holds ~50% of rows (skew fixture is real)."""
    seqs = seq_fixtures["sequences"]
    total = seqs.count()
    src0 = seqs.where(F.col("source") == "src0").count()
    assert 0.3 <= src0 / total <= 0.7
