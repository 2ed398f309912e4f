"""PII detection / redaction operators (SURVEY.md §2.10 C24): the scrub
step every large-scale training-data pipeline runs between raw crawl text
and the token stream — count and mask emails, IPv4 addresses, and
phone-shaped numbers.

Requirement source: task brief ("add the operations a large-scale
training-data pipeline would need"); the reference repo is empty at v0
(/root/reference/README.md:1), so the semantics are defined here and
pinned by the DuckDB tail oracle in __spark_entry__.py plus the pure
python-``re`` oracle in tests/test_corpus.py.

Design rules:

* **Pure per-row JVM regexp expressions** — ``regexp_extract_all`` for
  counts, chained ``regexp_replace`` for redaction. No shuffle, no Python
  stage: the scrub pipelines into the Parquet scan at any corpus size and
  stays inside whole-stage codegen.
* **Cross-engine-portable regexes.** Every pattern uses only constructs
  with identical semantics in Java regex (Spark) and RE2 (DuckDB):
  explicit character classes, bounded repetition, ``\\b`` word
  boundaries. No lookaround, no backreferences (RE2 has neither).
* **Fixed redaction order** (email → ipv4 → phone) so overlapping
  matches resolve identically everywhere; each placeholder token is
  chosen so it cannot itself match a later pattern.

At 100 TB this is the cheapest kind of operator — embarrassingly
parallel, zero exchange — and the one most worth keeping out of Python:
a per-row Python UDF here would put the *entire corpus* through the
Arrow boundary for a regex the JVM runs 10-100× faster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Patterns (deliberately simple + portable; precision/recall tuning is a
# policy choice layered on top, not an engine concern):
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# 8+ chars of digit/space/()/- bounded by digits; dots excluded so IPv4s
# and decimals never double-count as phones
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"

# (name, pattern, placeholder) in redaction order. Placeholders contain
# no digits/@ so a redacted span can never re-match a later pattern.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def _count(c: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII counts: ``n_emails``, ``n_ipv4``, ``n_phones``
    (non-overlapping leftmost matches — identical semantics in Java regex
    and RE2) plus ``has_pii``. Counts are computed on the ORIGINAL text,
    independent of redaction order."""
    from engine.io import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    c = F.col(text_col)
    out = (
        df.withColumn("n_emails", _count(c, EMAIL_RE))
        .withColumn("n_ipv4", _count(c, IPV4_RE))
        .withColumn("n_phones", _count(c, PHONE_RE))
    )
    return out.withColumn(
        "has_pii",
        (F.col("n_emails") > 0) | (F.col("n_ipv4") > 0) | (F.col("n_phones") > 0),
    )


def pii_redact(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted_text"
) -> DataFrame:
    """Mask every PII span with its placeholder, applying the patterns in
    the fixed ``PII_PATTERNS`` order (email first: an email contains
    digit runs a later phone pass could otherwise partially eat)."""
    c = F.col(text_col)
    for _, pattern, placeholder in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, placeholder)
    return df.withColumn(out_col, c)


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stats + redaction in one pass (one projection, still zero-shuffle)."""
    return pii_redact(pii_stats(df, text_col), text_col)
