"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the given sf_dir, compare row count,
column names, and order-insensitive values (exact for non-floats, exact-or-
allclose report for floats).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    pdf = pdf[cols].copy()
    for c in cols:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(cols, kind="mergesort", na_position="last").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return [f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"]
    if len(spark_pdf) != len(duck_pdf):
        return [f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}"]
    a, b = canon(spark_pdf), canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                avf, bvf = av.astype(float).values, bv.astype(float).values
                exact = np.array_equal(avf, bvf, equal_nan=True)
                close = np.allclose(avf, bvf, rtol=1e-9, atol=1e-12, equal_nan=True)
                if not exact:
                    worst = np.nanmax(np.abs(np.nan_to_num(avf) - np.nan_to_num(bvf)))
                    problems.append(
                        f"col {c}: float {'allclose but NOT exact' if close else 'MISMATCH'} (max abs diff {worst:.3e})"
                    )
            else:
                if not av.astype(str).equals(bv.astype(str)):
                    bad = (av.astype(str) != bv.astype(str))
                    i = int(np.argmax(bad.values))
                    problems.append(f"col {c}: value mismatch at sorted row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}")
        except Exception as ex:
            problems.append(f"col {c}: compare error {ex}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from engine.io import get_spark
    import __spark_entry__ as E

    spark = get_spark(app="oracle-check", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            continue
        if sql is None:
            print(f"rows  {name}: {len(spdf)} rows (no oracle — rows-only)")
            if len(spdf) == 0:
                failures += 1
            continue
        try:
            dpdf = con.sql(sql).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures += 1
            continue
        probs = compare(name, spdf, dpdf)
        if probs:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(probs))
        else:
            print(f"OK    {name}: {len(spdf)} rows, exact match")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
