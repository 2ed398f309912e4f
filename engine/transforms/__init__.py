"""The three DFS-lineage transform families (BASELINE.json:6, SURVEY.md §2.9).

- row    — per-row scalar features (datetime decomposition, numeric maps,
           text/token stats); JVM expressions first, pandas_udf for extensions.
- column — direct features: parent-entity columns pulled onto child rows via
           FK joins, plus whole-column normalizations.
- table  — relational aggregations per parent key with optional temporal
           cutoff, grouped-map transforms, vectorized UDAFs.
"""

from engine.transforms.row import apply_row_features, row_function, ROW_FUNCTIONS
from engine.transforms.column import direct_features, standardize, minmax_normalize, rank_normalize
from engine.transforms.table import agg_features, grouped_map, grouped_zscore

__all__ = [
    "apply_row_features", "row_function", "ROW_FUNCTIONS",
    "direct_features", "standardize", "minmax_normalize", "rank_normalize",
    "agg_features", "grouped_map", "grouped_zscore",
]
