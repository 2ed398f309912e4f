"""Training-set preparation operators (SURVEY.md §2.10 C19-C21): the steps
between a cleaned corpus and a token stream — eval-set decontamination,
fixed-length sequence packing, and corpus vocabulary statistics.

Requirement source: task brief "add the operations a large-scale
training-data pipeline would need"; the reference repo is empty at v0
(/root/reference/README.md:1), so the semantics are defined here and
pinned by the DuckDB oracles in __spark_entry__.py.

Scale notes (10^12 rows):

* ``decontaminate`` — the eval n-gram set is tiny relative to the corpus
  (|eval|·grams rows, distinct-ed once) and is broadcast; the corpus side
  explodes shingles *pipelined over the scan* and probes the broadcast
  hash table, so fact rows never shuffle to find hits. Only hit rows
  (bounded by contamination) reach the per-doc count, and the final
  annotate join is id-keyed. Drop mode anti-joins on the distinct
  contaminated-id set instead of re-joining counts.
* ``pack_sequences`` — packing is per-shard (a real pipeline shards by
  source/date/bucket before packing), so the running token offset is a
  window partitioned by the shard key: Spark range-partitions shards
  across executors and no global sort exists. Output is one row per
  (doc, pack) intersection — ≤ n_docs + total_tokens/seq_len rows.
* ``vocab_stats`` — classic two-level aggregation: per-(doc,token) partial
  counts collapse map-side before the shuffle, then per-token totals; the
  global top-k is TakeOrderedAndProject (no full sort). Term and document
  frequency come out of one pass.

Everything is deterministic (hash-coin ordering, never ``rand()``) and a
pure function of the input — identical on re-run, retry, or any
partitioning, which the resumable checkpoint path requires.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from engine.corpus.text import bpe_tokens, shingles


def eval_grams(eval_docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """The distinct word-n-gram set of an eval/benchmark corpus — the
    blocklist side of decontamination. Tiny vs the corpus; broadcast it."""
    return (
        eval_docs.select(F.explode(shingles(F.col(text_col), n)).alias("_gram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "annotate",
) -> DataFrame:
    """Eval-set decontamination: flag (or drop) training documents sharing
    any word n-gram with the eval corpus — the standard guard against
    benchmark leakage into training data (the GPT-3 appendix-C procedure,
    public). Shingles are distinct per doc, so ``n_hit_grams`` counts the
    *distinct* grams of the doc that appear in the eval set.

    mode="annotate" keeps every row and adds ``n_hit_grams`` (long) and
    ``contaminated`` (boolean); mode="drop" returns the clean subset with
    the original schema.
    """
    ev = F.broadcast(eval_grams(eval_docs, n, text_col))
    dg = docs.select(id_col, F.explode(shingles(F.col(text_col), n)).alias("_gram"))
    hit_ids = dg.join(ev, "_gram")
    if mode == "drop":
        return docs.join(hit_ids.select(id_col).distinct(), id_col, "left_anti")
    if mode != "annotate":
        raise ValueError(f"mode must be 'annotate' or 'drop', got {mode!r}")
    hits = hit_ids.groupBy(id_col).agg(F.count("*").alias("n_hit_grams"))
    return (
        docs.join(hits, id_col, "left")
        .withColumn("n_hit_grams", F.coalesce(F.col("n_hit_grams"), F.lit(0).cast("long")))
        .withColumn("contaminated", F.col("n_hit_grams") > 0)
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    n_tokens_col: str,
    shard_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "afg",
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay the shard's documents end to
    end in a deterministic hash order and cut the token stream every
    ``seq_len`` tokens — the standard pre-training packing scheme (docs may
    straddle pack boundaries; the trainer masks attention across them).

    Emits one row per (document, pack) intersection:

      pack_id    — 0-based pack index within the shard
      pack_off   — where the slice starts inside the pack
      tok_start  — where the slice starts inside the document (0-based)
      tok_len    — slice length in tokens

    so Σ tok_len per (shard, pack_id) == seq_len for every full pack, and
    reassembling slices by (pack_id, pack_off) reproduces the shard's
    token stream exactly. Docs with a non-positive token count are
    skipped. The order key is (md5(salt|id), id) — a total order, so the
    packing is unique and identical on any partitioning/re-run.

    All arithmetic is int64 (DIV/mod/min/max), mirrored verbatim in the
    DuckDB oracle — hash-exact cross-engine.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    ntok = F.col(n_tokens_col).cast("long")
    order = [F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col))), F.col(id_col)]
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    L = F.lit(int(seq_len)).cast("long")
    end = F.sum(ntok).over(w)
    start = end - ntok
    d = (
        docs.where(ntok > 0)
        .select(
            id_col,
            shard_col,
            ntok.alias("_n"),
            start.alias("_start"),
            end.alias("_end"),
        )
        .withColumn("_first", F.expr(f"_start DIV {int(seq_len)}"))
        .withColumn("_last", F.expr(f"(_end - 1) DIV {int(seq_len)}"))
    )
    p = F.col("pack_id")
    pstart = p * L
    return (
        d.withColumn("pack_id", F.explode(F.sequence(F.col("_first"), F.col("_last"))))
        .select(
            id_col,
            shard_col,
            p,
            (F.greatest(F.col("_start"), pstart) - pstart).alias("pack_off"),
            (F.greatest(F.col("_start"), pstart) - F.col("_start")).alias("tok_start"),
            (
                F.least(F.col("_end"), pstart + L)
                - F.greatest(F.col("_start"), pstart)
            ).alias("tok_len"),
        )
    )


def tfidf_topk_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k terms by a tf-idf score — keyword/topic features
    over the token axis (the classic text feature-engineering primitive).

    score = tf · (N + 1) / (df + 1), a RATIO idf rather than log idf: for
    any fixed tf it ranks terms identically (both are strictly decreasing
    in df), and being a fixed tree of exactly-rounded IEEE ops (no
    transcendentals) it is bit-identical in the DuckDB oracle, where
    ln()'s last ulp is libm- vs JVM-dependent. Rank ties break on the
    token, so the per-doc top-k set is unique.

    Lazily composed — no driver-side count(): N is a 1-row aggregate
    cross-joined back, df a per-token frame joined back; both sides of
    those joins are broadcast. The tf frame feeds three consumers (scores,
    df, N), so it is persisted via ``tracked_persist`` — without it Spark
    re-runs the corpus scan + token explode per consumer (the plan audit
    hard-gates this as InMemoryTableScan). Fact-scale exchanges:
    per-(doc,token) tf, then the per-doc top-k window; the caller's
    pipeline barrier releases the cache (`engine/cache.py`).
    """
    from engine.cache import tracked_persist

    toks = docs.select(
        id_col, F.explode(bpe_tokens(F.lower(F.col(text_col)))).alias("token")
    )
    tf = tracked_persist(toks.groupBy(id_col, "token").agg(F.count("*").alias("tf")))
    dfx = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = tf.agg(F.countDistinct(id_col).alias("_n"))
    score = (
        F.col("tf").cast("double")
        * (F.col("_n").cast("double") + F.lit(1.0))
        / (F.col("df").cast("double") + F.lit(1.0))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "token")
    return (
        tf.join(F.broadcast(dfx), "token")
        .crossJoin(F.broadcast(n))
        .withColumn("score", score)
        .drop("_n")
        .withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= k)
        .select(id_col, "token", "tf", "df", "score", "term_rank")
    )


def token_ngrams(c: Column, n: int) -> Column:
    """Token n-grams WITH multiplicity, in document order, over the BPE-ish
    pre-tokenization (space-joined; the regex never emits a token containing
    a space, so the join is unambiguous). Documents shorter than n tokens
    contribute nothing — n-gram LM counting semantics, unlike ``shingles``'
    whole-text fallback (set semantics for Jaccard)."""
    t = bpe_tokens(F.lower(c))
    return F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
        )
    )


def ngram_topk(
    docs: DataFrame,
    n: int = 2,
    top_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus n-gram statistics (C25): the top-k token n-grams by total
    term frequency with document frequency — the language-model-flavored
    sibling of ``vocab_stats`` (n=1): phrase-vocabulary induction, corpus
    drift checks, and the count table behind n-gram LM quality filters.

    Same two-level aggregation scheme as ``vocab_stats``: explode pipelined
    over the scan, per-(doc, gram) partials collapse map-side before the
    wide shuffle, global top-k is TakeOrderedAndProject (no full sort).
    (gram_freq desc, gram asc) is a total order — the result set is unique.
    """
    grams = docs.select(
        id_col, F.explode(token_ngrams(F.col(text_col), n)).alias("gram")
    )
    per_doc = grams.groupBy(id_col, "gram").agg(F.count("*").alias("_c"))
    return (
        per_doc.groupBy("gram")
        .agg(F.sum("_c").alias("gram_freq"), F.count("*").alias("doc_freq"))
        .orderBy(F.desc("gram_freq"), "gram")
        .limit(top_k)
    )


DEFAULT_BUCKET_EDGES = (16, 32, 64, 128, 256, 512, 1024, 2048)


def length_buckets(
    docs: DataFrame,
    n_tokens_col: str,
    edges: Sequence[int] = DEFAULT_BUCKET_EDGES,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence-length bucketing (C26): assign each document to the
    smallest bucket edge ≥ its token count — the batch-scheduling prep
    for pad-to-bucket training (docs longer than the max edge are
    truncated to it, the standard max-sequence-length cut). Per bucket:

      n_docs            — documents assigned
      sum_tokens        — Σ effective (post-truncation) tokens
      truncated_tokens  — Σ tokens cut by the max-edge clamp
      pad_waste_frac    — 1 − sum_tokens / (bucket · n_docs), the fraction
                          of padded batch slots wasted (exact
                          integer-ratio IEEE double)

    Bucket assignment is a pure per-row JVM expression over a literal
    edge array (``array_min(filter(edges, e -> e ≥ len))``) pipelined
    into the scan; the aggregation is one |edges|-row hash agg with
    map-side combine. Zero-token docs land in the smallest bucket.
    """
    if list(edges) != sorted(set(int(e) for e in edges)) or not edges:
        raise ValueError(f"edges must be sorted unique non-empty, got {edges!r}")
    ntok = F.col(n_tokens_col).cast("long")
    max_edge = F.lit(int(edges[-1])).cast("long")
    eff = F.least(ntok, max_edge)
    arr = F.array(*[F.lit(int(e)).cast("long") for e in edges])
    bucket = F.array_min(F.filter(arr, lambda e: e >= eff))
    # r4 ADVICE: a null token count must not reach the bucketing expression —
    # F.least skips nulls, so such a row silently landed in the max bucket
    # with eff=max_edge, inflating its n_docs/sum_tokens. A null count is a
    # broken upstream row: exclude it rather than mis-count it.
    docs = docs.where(F.col(n_tokens_col).isNotNull())
    b = docs.select(
        bucket.alias("seq_bucket"),
        eff.alias("_eff"),
        (ntok - eff).alias("_trunc"),
    )
    out = b.groupBy("seq_bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("_eff").alias("sum_tokens"),
        F.sum("_trunc").alias("truncated_tokens"),
    )
    return out.withColumn(
        "pad_waste_frac",
        F.lit(1.0)
        - F.col("sum_tokens").cast("double")
        / (F.col("seq_bucket") * F.col("n_docs")).cast("double"),
    )


def vocab_stats(
    docs: DataFrame,
    top_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary statistics: the top-k tokens by total term
    frequency, with document frequency — the input to tokenizer training,
    stopword induction, and corpus drift checks.

    One pass: explode BPE-ish tokens of the lowercased text, pre-aggregate
    per (doc, token) so the wide shuffle carries per-doc partials, then
    per-token ``term_freq`` (Σ occurrences) and ``doc_freq`` (# docs).
    Top-k is (term_freq desc, token asc) — a total order, so the result
    set is unique.
    """
    toks = docs.select(
        id_col, F.explode(bpe_tokens(F.lower(F.col(text_col)))).alias("token")
    )
    per_doc = toks.groupBy(id_col, "token").agg(F.count("*").alias("_c"))
    return (
        per_doc.groupBy("token")
        .agg(F.sum("_c").alias("term_freq"), F.count("*").alias("doc_freq"))
        .orderBy(F.desc("term_freq"), "token")
        .limit(top_k)
    )
