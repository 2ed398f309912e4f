"""Text-analysis operators over the documents/sequences corpus
(SURVEY.md §2.10): tokenization, token counting, language ID, quality
scoring, document fingerprinting.

Requirement source: task brief "text analysis: language-ID (n-gram
heuristic), quality scoring, token counting, document fingerprinting";
the reference repo is empty at v0 (/root/reference/README.md:1), so the
semantics here are defined by this engine and pinned by the DuckDB
oracles in __spark_entry__.py.

Scale notes (10^12 rows): every function below is a pure per-row JVM
expression — no shuffle, no Python worker, fully pipelined inside
whole-stage codegen over the Parquet scan. Cross-engine determinism for
the oracle comes from md5 (identical hex in Spark and DuckDB) and
integer-ratio float arithmetic (identical IEEE doubles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation.
# Mirrors the GPT-2 pre-tokenizer's class split at ASCII granularity; kept
# RE2/Java-regex-portable so Spark and DuckDB extract identical tokens.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic; order of LANGS is the tie-break precedence.
LANGS = ["en", "es", "fr", "de", "zh"]
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is", "in", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "un", "les", "des", "en", "du", "que"],
    "de": ["der", "die", "und", "das", "von", "mit", "den", "ein", "zu", "ist"],
    "zh": ["de", "shi", "le", "zai", "wo", "you", "he", "ta", "men", "zhe"],
}


def words(c: Column) -> Column:
    """Whitespace word split (empty string -> empty array, not [''])."""
    return F.split(F.trim(c), r"\s+")


def bpe_tokens(c: Column) -> Column:
    """BPE-ish regex pre-tokenization into an array<string> (JVM-side)."""
    return F.regexp_extract_all(c, F.lit(TOKEN_RE), 0)


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_ws_tokens (whitespace), n_bpe_tokens (regex), n_unique_words."""
    from engine.io import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    c = F.col(text_col)
    return (
        df.withColumn("n_ws_tokens", F.size(words(c)))
        .withColumn("n_bpe_tokens", F.size(bpe_tokens(c)))
        .withColumn("n_unique_words", F.size(F.array_distinct(words(F.lower(c)))))
    )


def _stopword_hits(c: Column, lang: str) -> Column:
    """Count of words from ``lang``'s stopword list present in the text
    (with multiplicity): size(filter(words, w -> w in list))."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words(F.lower(c)), lambda w: F.array_contains(sw, w)))


def lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-hit language ID. Scores each language by stopword matches
    per word; argmax with fixed precedence (LANGS order) on ties, 'und' when
    all scores are zero. Pure JVM expressions -> identical in the DuckDB
    oracle (same CASE chain)."""
    from engine.io import ensure_min_parallelism

    c = F.col(text_col)
    scored = ensure_min_parallelism(df)
    for lang in LANGS:
        scored = scored.withColumn(f"_sw_{lang}", _stopword_hits(c, lang))
    best = F.greatest(*[F.col(f"_sw_{l}") for l in LANGS])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANGS:  # first max in LANGS order wins ties
        pred = pred.when(F.col(f"_sw_{lang}") == best, F.lit(lang))
    return scored.withColumn(out, pred).drop(*[f"_sw_{l}" for l in LANGS])


def quality_score(df: DataFrame, text_col: str = "text", out: str = "quality") -> DataFrame:
    """Heuristic quality score in [0,1] from length, punctuation ratio,
    digit ratio and stopword ratio — the standard cheap pre-training text
    filters (C4-style), as exact integer-ratio arithmetic:

      len_score  = least(1, n_chars / 200)
      punct_pen  = n_punct / greatest(1, n_bpe_tokens)
      digit_pen  = n_digit_chars / greatest(1, n_chars)
      sw_score   = least(1, 5 * en_stopword_hits / greatest(1, n_words))
      quality    = round(0.4*len_score + 0.3*sw_score
                         + 0.3*greatest(0, 1 - punct_pen - digit_pen), 6)
    """
    from engine.io import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    c = F.col(text_col)
    n_chars = F.length(c).cast("double")
    n_words = F.size(words(c)).cast("double")
    n_bpe = F.size(bpe_tokens(c)).cast("double")
    n_punct = F.size(F.filter(bpe_tokens(c), lambda t: t.rlike(r"^[^A-Za-z0-9]$"))).cast("double")
    n_digit = (F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))).cast("double")
    sw = _stopword_hits(c, "en").cast("double")
    len_score = F.least(F.lit(1.0), n_chars / F.lit(200.0))
    punct_pen = n_punct / F.greatest(F.lit(1.0), n_bpe)
    digit_pen = n_digit / F.greatest(F.lit(1.0), n_chars)
    sw_score = F.least(F.lit(1.0), F.lit(5.0) * sw / F.greatest(F.lit(1.0), n_words))
    q = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * sw_score
        + F.lit(0.3) * F.greatest(F.lit(0.0), F.lit(1.0) - punct_pen - digit_pen)
    )
    return df.withColumn(out, F.round(q, 6))


def shingles(c: Column, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (distinct, sorted — set
    semantics for Jaccard). Documents shorter than n words yield the whole
    text as a single shingle."""
    w = words(F.lower(c))
    grams = F.when(
        F.size(w) < n, F.array(F.concat_ws(" ", w))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
        )
    )
    return F.array_sort(F.array_distinct(grams))


def grams_all(w: Column, n: int) -> Column:
    """Word n-grams WITH multiplicity, in document order (the non-distinct
    counterpart of ``shingles`` — repetition detection needs duplicates).
    Texts shorter than n words yield the whole text as a single gram."""
    return F.when(
        F.size(w) < n, F.array(F.concat_ws(" ", w))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
        )
    )


# Repetition thresholds (public Gopher-paper-style repetition filters,
# Rae et al. 2021 §A1.1 — adapted to word/n-gram duplicate fractions).
REP_DUP_WORD_MAX = 0.30
REP_DUP_2GRAM_MAX = 0.20
REP_DUP_3GRAM_MAX = 0.18


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Intra-document repetition signals — the quality filter that catches
    boilerplate/spam which *cross-doc* dedup (C1-C6) never sees:

      dup_word_frac   = 1 - |distinct words| / |words|
      dup_2gram_frac  = 1 - |distinct 2-grams| / |2-grams|
      dup_3gram_frac  = 1 - |distinct 3-grams| / |3-grams|
      is_repetitive   = any fraction above its threshold

    Case-insensitive. Every fraction is an exact integer-ratio IEEE double
    (no rounding), so the DuckDB oracle is bit-identical. Pure per-row JVM
    expressions — no shuffle, pipelined into the scan at any corpus size.
    """
    from engine.io import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    w = words(F.lower(F.col(text_col)))

    def dup_frac(arr: Column) -> Column:
        return (F.size(arr) - F.size(F.array_distinct(arr))).cast("double") / F.size(
            arr
        ).cast("double")

    out = (
        df.withColumn("dup_word_frac", dup_frac(w))
        .withColumn("dup_2gram_frac", dup_frac(grams_all(w, 2)))
        .withColumn("dup_3gram_frac", dup_frac(grams_all(w, 3)))
    )
    return out.withColumn(
        "is_repetitive",
        (F.col("dup_word_frac") > REP_DUP_WORD_MAX)
        | (F.col("dup_2gram_frac") > REP_DUP_2GRAM_MAX)
        | (F.col("dup_3gram_frac") > REP_DUP_3GRAM_MAX),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: full-content md5 plus a rolling min-hash over
    3-word shingles (= MinHash with k=1) — the cheap near-dup prefilter.
    Both are md5-hex based, so the DuckDB oracle is bit-identical."""
    from engine.io import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    c = F.col(text_col)
    return df.withColumn("md5_full", F.md5(c)).withColumn(
        "shingle_minhash", F.array_min(F.transform(shingles(c), F.md5))
    )
