"""Spark-vs-DuckDB oracle comparison — mirrors the driver's correctness
gate: row count + schema + order-insensitive value comparison with
columns sorted by name."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from pypers_spark.sources.registry import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            # strip tz so LTZ-vs-NTZ readings of the same parquet agree
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, duck_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    if len(sp) != len(duck_df):
        problems.append(f"row count: spark={len(sp)} duck={len(duck_df)}")
    if sorted(sp.columns) != sorted(duck_df.columns):
        problems.append(f"columns: spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}")
        return problems
    a, b = _canon(sp), _canon(duck_df)
    if len(a) == len(b):
        for c in a.columns:
            if not a[c].equals(b[c]):
                neq = a[c] != b[c]
                idx = list(neq[neq].index[:3])
                if not idx and str(a[c].dtype) != str(b[c].dtype):
                    # values agree element-wise but dtypes differ (e.g. a
                    # DuckDB HUGEINT sum surfacing as float vs Spark's
                    # int64) — name the real mismatch, not "0 diffs"
                    problems.append(
                        f"column {c}: dtype mismatch spark={a[c].dtype} "
                        f"duck={b[c].dtype} (values equal — CAST the oracle)"
                    )
                    continue
                problems.append(
                    f"column {c}: {sum(neq)} diffs, e.g. rows {idx}: "
                    f"spark={list(a[c][idx])} duck={list(b[c][idx])}"
                )
    return problems


def check_query(spark, con, name: str, sf_dir: str) -> list[str]:
    import __spark_entry__ as e

    q = e.queries()[name]
    # dynamic oracles (op_file_stats) interpolate the gate's sf_dir —
    # passed explicitly so the oracle is pinned to the SAME tables the
    # Spark side reads (no process-global env mutation).
    sql = e.oracle_sql(sf_dir).get(name)
    if sql is None:
        df = q(spark, sf_dir)
        n = df.count()
        return [] if n >= 0 and not math.isnan(n) else [f"{name}: no rows"]
    spark_df = q(spark, sf_dir)
    duck_df = con.sql(sql).df()
    return compare(spark_df, duck_df)
