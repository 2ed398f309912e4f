"""PySpark-native point-in-time feature-engineering engine.

A from-scratch reimplementation of the capabilities of
``anugrahasinha/AutomaticFeatureGeneration`` (reference @ /root/reference, which
ships no code — see SURVEY.md §0; the binding spec is /root/repo/BASELINE.json).

Design rules (SURVEY.md §1-§4):
- ``pyspark.sql.DataFrame`` only; no RDDs, no per-row Python UDFs.
- Python stages are Arrow-vectorized (``pandas_udf`` / ``applyInPandas`` /
  ``mapInArrow``) and always preceded by an explicit ``select`` (column pruning
  does not cross opaque Python stages).
- Token arrays (``array<int32>``) never pass through pandas — JVM array
  functions or ``mapInArrow`` only (int32 preservation, SURVEY.md §7 risk 3).
- Skew on ``doc_id``/``source`` is handled explicitly (salting / two-level
  aggregation), not left to AQE (AQE skew-split does not cover windows).
"""

from engine.asof import asof_join
from engine.window_ops import (
    backward_fill,
    cumulative_stats,
    forward_fill,
    lag_features,
    rolling_aggregates,
    sessionize,
    top_k_per_group,
)

__all__ = [
    "asof_join",
    "forward_fill",
    "backward_fill",
    "lag_features",
    "sessionize",
    "rolling_aggregates",
    "cumulative_stats",
    "top_k_per_group",
]
