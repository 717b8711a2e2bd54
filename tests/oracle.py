"""Local mirror of the driver's DuckDB-oracle comparison (t2).

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row counts, column sets, dtypes, and exact
values (order-insensitive). The driver hashes formatted values, so an
int-vs-float dtype skew (1 vs 1.0) or any value difference fails its hash;
this mirror is deliberately just as strict — the registry's round-to-6
convention is what absorbs float noise, not a comparison tolerance here.
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


def _kind_class(kind: str) -> str:
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    return "other"


def compare(spark_df, duck_df: pd.DataFrame) -> list[str]:
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
        # Nullable columns arrive as object/float depending on engine; compare
        # the numeric *class* so bigint-vs-double skew (1 vs 1.0) fails like
        # the driver's hash does, while int64-vs-int32 width skew does not.
        ka, kb = _kind_class(av.dtype.kind), _kind_class(bv.dtype.kind)
        if ka != kb and not (av.isna().all() or bv.isna().all()):
            errs.append(
                f"col {c}: dtype class mismatch spark={av.dtype} duck={bv.dtype} "
                f"(driver value-hash would differ, e.g. 1 vs 1.0)"
            )
            continue
        if ka == "float":
            af = av.astype(float)
            bf = bv.astype(float)
            both_nan = af.isna() & bf.isna()
            bad = ~(both_nan | (af == bf))
            if bad.any():
                i = bad.idxmax()
                errs.append(
                    f"col {c}: {int(bad.sum())} value mismatches, first at row {i}: "
                    f"spark={af[i]!r} duck={bf[i]!r}"
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
