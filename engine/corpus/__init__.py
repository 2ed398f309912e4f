"""Training-corpus operators: dedup, similarity search, text analysis,
multimodal plumbing (SURVEY.md §2.10).

All hot-path expressions are JVM Column expressions (whole-stage codegen);
Python appears only in Arrow-batched ``mapInPandas`` stages (multimodal
decode), never per-row (BASELINE.json:15).
"""
