"""row_functions family — per-row scalar feature transforms (SURVEY.md §2.9).

Every built-in here is a pure JVM Column expression (whole-stage codegen, no
Python worker). Custom Python transforms register through ``row_function`` as
Arrow-vectorized ``pandas_udf``s — classic per-row ``udf()`` is banned
(BASELINE.json:15 "no per-row Python").

Token-array functions use Spark higher-order array functions so ``array<int32>``
never crosses into pandas (int32-preservation rule, SURVEY.md §7 risk 3).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> Column -> Column
ROW_FUNCTIONS: dict[str, Callable[[Column], Column]] = {}


def row_function(name: str):
    """Register a named row transform (Column -> Column)."""

    def deco(fn):
        ROW_FUNCTIONS[name] = fn
        return fn

    return deco


# ---- datetime decomposition (DFS 2015 datetime row_functions) ----
row_function("hour")(lambda c: F.hour(c))
row_function("minute")(lambda c: F.minute(c))
row_function("dayofweek")(lambda c: F.dayofweek(c))
row_function("dayofmonth")(lambda c: F.dayofmonth(c))
row_function("month")(lambda c: F.month(c))
row_function("year")(lambda c: F.year(c))
row_function("week")(lambda c: F.weekofyear(c))
row_function("is_weekend")(lambda c: F.dayofweek(c).isin(1, 7).cast("int"))
row_function("date")(lambda c: F.to_date(c))

# ---- numeric maps ----
row_function("log1p")(lambda c: F.log1p(c))
row_function("log")(lambda c: F.log(c))
row_function("sqrt")(lambda c: F.sqrt(c))
row_function("abs")(lambda c: F.abs(c))
row_function("square")(lambda c: c * c)
row_function("negate")(lambda c: -c)
row_function("sign")(lambda c: F.signum(c))
row_function("round2")(lambda c: F.round(c, 2))
row_function("is_null")(lambda c: c.isNull().cast("int"))

# ---- text stats ----
row_function("length")(lambda c: F.length(c))
row_function("lower")(lambda c: F.lower(c))
row_function("n_words")(lambda c: F.size(F.split(F.trim(c), r"\s+")))
row_function("n_upper")(
    lambda c: F.length(c) - F.length(F.regexp_replace(c, r"[A-Z]", ""))
)
row_function("n_digits")(
    lambda c: F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
)
row_function("n_punct")(
    lambda c: F.length(c) - F.length(F.regexp_replace(c, r"[!-/:-@\[-`{-~]", ""))
)

# ---- token-array stats (pure JVM; tokens never enter pandas) ----
row_function("n_tokens")(lambda c: F.size(c))
row_function("n_unique_tokens")(lambda c: F.size(F.array_distinct(c)))
row_function("token_min")(lambda c: F.array_min(c))
row_function("token_max")(lambda c: F.array_max(c))
row_function("token_sum")(
    lambda c: F.aggregate(c, F.lit(0).cast("long"), lambda acc, x: acc + x)
)
row_function("token_mean")(
    lambda c: F.aggregate(c, F.lit(0).cast("long"), lambda acc, x: acc + x)
    / F.size(c)
)
row_function("token_head8")(lambda c: F.slice(c, 1, 8))
row_function("unique_token_ratio")(
    lambda c: F.size(F.array_distinct(c)) / F.size(c)
)

# ---- JSON ----
row_function("json_k")(lambda c: F.get_json_object(c, "$.k").cast("int"))


def apply_row_features(
    df: DataFrame, specs: dict[str, tuple[str, str]] | list[tuple[str, str, str]]
) -> DataFrame:
    """Apply named row transforms.

    ``specs``: {out_col: (fn_name, in_col)} or [(out_col, fn_name, in_col)].
    """
    if isinstance(specs, dict):
        items = [(out, fn, col) for out, (fn, col) in specs.items()]
    else:
        items = list(specs)
    exprs = []
    for out, fn, col in items:
        if fn not in ROW_FUNCTIONS:
            raise KeyError(f"unknown row function: {fn!r} (have {sorted(ROW_FUNCTIONS)})")
        exprs.append(ROW_FUNCTIONS[fn](F.col(col)).alias(out))
    return df.select("*", *exprs)
