"""Training-set prep operators (SURVEY.md §2.10 C19-C21) — python-oracle
tests per SURVEY.md §5.1. Hash-exactness vs DuckDB is covered by the
driver window (decontaminate) and test_tail_oracle (pack_sequences,
vocab_topk); these pin the semantic invariants: eval self-contamination,
drop/annotate agreement, pack slice algebra, stream reassembly, partition
invariance, and counter equality.
"""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from engine.corpus.sampling import hash_sample
from engine.corpus.text import TOKEN_RE
from engine.corpus.traindata import decontaminate, pack_sequences, vocab_stats
from engine.io import read_table

SEQ_LEN = 64


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").select("doc_id", "source", "text")


def test_decontaminate_annotate_and_drop_agree(docs):
    ev = hash_sample(docs, 0.05, salt="eval")
    ann = decontaminate(docs, ev, n=3).collect()
    eval_ids = {r.doc_id for r in ev.collect()}
    assert eval_ids  # the 5% cut is non-empty on the fixture
    by_id = {r.doc_id: r for r in ann}
    assert set(by_id) == {r.doc_id for r in docs.collect()}  # annotate keeps all
    for i in eval_ids:  # every eval doc shares its own grams
        assert by_id[i].contaminated and by_id[i].n_hit_grams > 0, i
    for r in ann:
        assert r.contaminated == (r.n_hit_grams > 0)
    dropped = decontaminate(docs, ev, n=3, mode="drop")
    assert set(dropped.columns) == set(docs.columns)  # original schema
    kept = {r.doc_id for r in dropped.collect()}
    assert kept == {i for i, r in by_id.items() if not r.contaminated}


def test_decontaminate_python_oracle(docs):
    ev = hash_sample(docs, 0.05, salt="eval")
    rows = docs.collect()
    eval_ids = {r.doc_id for r in ev.collect()}

    def grams(text):
        w = re.split(r"\s+", text.strip().lower())
        if len(w) < 3:
            return {" ".join(w)}
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    ev_set = set().union(*(grams(r.text) for r in rows if r.doc_id in eval_ids))
    got = {r.doc_id: r.n_hit_grams for r in decontaminate(docs, ev, n=3).collect()}
    for r in rows:
        assert got[r.doc_id] == len(grams(r.text) & ev_set), r.doc_id


@pytest.fixture(scope="module")
def packed_input(docs):
    return docs.withColumn(
        "n_tok", F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0))
    ).select("doc_id", "source", "n_tok")


def test_pack_sequences_slice_algebra(packed_input):
    out = pack_sequences(packed_input, SEQ_LEN, "n_tok").toPandas()
    ntok = {
        r.doc_id: r.n_tok for r in packed_input.collect() if r.n_tok > 0
    }
    # per-doc: slices cover [0, n_tok) contiguously across consecutive packs
    for doc_id, g in out.sort_values("pack_id").groupby("doc_id"):
        assert g.tok_len.sum() == ntok[doc_id], doc_id
        assert g.tok_start.iloc[0] == 0
        assert (g.tok_start + g.tok_len).iloc[-1] == ntok[doc_id]
        assert list(g.tok_start)[1:] == list((g.tok_start + g.tok_len))[:-1]
        assert list(g.pack_id) == list(range(g.pack_id.iloc[0], g.pack_id.iloc[-1] + 1))
    # per-pack: every pack except the shard's last is exactly full, and
    # slices tile [0, SEQ_LEN) without gaps
    for (src, pid), g in out.groupby(["source", "pack_id"]):
        g = g.sort_values("pack_off")
        assert g.pack_off.iloc[0] == 0
        assert (g.pack_off + g.tok_len).max() <= SEQ_LEN
        assert list(g.pack_off)[1:] == list((g.pack_off + g.tok_len))[:-1]
        if pid < out[out.source == src].pack_id.max():
            assert g.tok_len.sum() == SEQ_LEN, (src, pid)
    # shard totals: pack count is ceil(total_tokens / SEQ_LEN)
    totals = out.groupby("source").tok_len.sum()
    packs = out.groupby("source").pack_id.max() + 1
    for src in totals.index:
        assert packs[src] == -(-int(totals[src]) // SEQ_LEN), src


def test_pack_sequences_partition_invariant_and_zero_skip(packed_input):
    a = pack_sequences(packed_input, SEQ_LEN, "n_tok").toPandas()
    b = pack_sequences(packed_input.repartition(7), SEQ_LEN, "n_tok").toPandas()
    key = ["doc_id", "pack_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    zero_ids = {r.doc_id for r in packed_input.where("n_tok <= 0").collect()}
    assert zero_ids.isdisjoint(set(a.doc_id))


def test_vocab_stats_python_counter(docs):
    out = vocab_stats(docs, top_k=50).collect()
    tf, df_ = Counter(), Counter()
    for r in docs.collect():
        toks = re.findall(TOKEN_RE, r.text.lower())
        tf.update(toks)
        df_.update(set(toks))
    expect = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert [(r.token, r.term_freq) for r in out] == expect
    for r in out:
        assert r.doc_freq == df_[r.token], r.token


def test_tfidf_topk_python_oracle(docs):
    from engine.corpus.traindata import tfidf_topk_terms

    out = tfidf_topk_terms(docs, k=3).collect()
    tf, df_ = {}, Counter()
    rows = docs.collect()
    for r in rows:
        c = Counter(re.findall(TOKEN_RE, r.text.lower()))
        tf[r.doc_id] = c
        df_.update(c.keys())
    n = len([r for r in rows if tf[r.doc_id]])
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, c in tf.items():
        if not c:
            assert doc_id not in by_doc
            continue
        scored = sorted(
            ((t, cnt, cnt * (n + 1) / (df_[t] + 1)) for t, cnt in c.items()),
            key=lambda x: (-x[2], x[0]),
        )[:3]
        got = sorted(by_doc[doc_id], key=lambda r: r.term_rank)
        assert [(g.token, g.tf) for g in got] == [(t, cnt) for t, cnt, _ in scored]
        for g, (t, cnt, s) in zip(got, scored):
            assert g.score == pytest.approx(s, rel=1e-12) and g.df == df_[t]
        assert [g.term_rank for g in got] == list(range(1, len(got) + 1))


def test_length_buckets_matches_python(spark):
    """C26 python oracle: smallest-edge-≥-len assignment, max-edge
    truncation, exact integer-ratio pad-waste fractions."""
    from engine.corpus.traindata import DEFAULT_BUCKET_EDGES, length_buckets

    lens = [0, 1, 16, 17, 31, 32, 100, 2048, 2049, 9999, 640, 64]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lens)], ["doc_id", "n_tok"]
    )
    got = {r.seq_bucket: r for r in length_buckets(df, "n_tok").collect()}
    expect = {}
    for n in lens:
        eff = min(n, 2048)
        b = min(e for e in DEFAULT_BUCKET_EDGES if e >= eff)
        d = expect.setdefault(b, [0, 0, 0])
        d[0] += 1
        d[1] += eff
        d[2] += n - eff
    assert set(got) == set(expect)
    for b, (n_docs, sum_tok, trunc) in expect.items():
        r = got[b]
        assert (r.n_docs, r.sum_tokens, r.truncated_tokens) == (n_docs, sum_tok, trunc)
        assert r.pad_waste_frac == 1.0 - sum_tok / (b * n_docs)


def test_length_buckets_excludes_null_counts(spark):
    """r4 ADVICE regression: a null token count must be EXCLUDED, not
    silently land in the max bucket (F.least skips nulls → eff=max_edge)."""
    from engine.corpus.traindata import length_buckets

    df = spark.createDataFrame(
        [(0, 10), (1, None), (2, 3000), (3, None)],
        "doc_id long, n_tok long",
    )
    got = {r.seq_bucket: r for r in length_buckets(df, "n_tok").collect()}
    assert set(got) == {16, 2048}
    assert got[16].n_docs == 1 and got[16].sum_tokens == 10
    # only the real 3000-token doc reaches the max bucket — not the nulls
    assert got[2048].n_docs == 1 and got[2048].sum_tokens == 2048
    assert got[2048].truncated_tokens == 3000 - 2048
