"""Local mirror of the driver's DuckDB-oracle comparison (t2).

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row counts, column sets, and values
(order-insensitive, small float tolerance on top of the registry's rounding).
"""
from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_run(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, duck_df: pd.DataFrame, float_tol: float = 1e-6) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    errs: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(duck_df.columns):
        errs.append(f"columns differ: spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}")
        return errs
    if len(sp) != len(duck_df):
        errs.append(f"row count differs: spark={len(sp)} duck={len(duck_df)}")
        return errs
    a, b = _normalize(sp), _normalize(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            af = av.astype(float)
            bf = bv.astype(float)
            both_nan = af.isna() & bf.isna()
            close = (af - bf).abs() <= float_tol * (1.0 + bf.abs())
            bad = ~(both_nan | close.fillna(False))
            if bad.any():
                i = bad.idxmax()
                errs.append(
                    f"col {c}: {int(bad.sum())} value mismatches, first at row {i}: "
                    f"spark={af[i]} duck={bf[i]}"
                )
        else:
            if not av.astype(str).equals(bv.astype(str)):
                neq = av.astype(str) != bv.astype(str)
                i = neq.idxmax()
                errs.append(
                    f"col {c}: {int(neq.sum())} value mismatches, first at row {i}: "
                    f"spark={av[i]!r} duck={bv[i]!r}"
                )
    return errs
