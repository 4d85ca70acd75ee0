"""Self-check: replicate the driver's queries-vs-oracle comparison.

For each query name: run the Ray callable and the DuckDB oracle on the
same sf_dir (tables pre-registered as views, as the driver does), then
compare row count, sorted column names, and exact values after sorting
columns by name and rows by all columns.  Used by tests/test_entry.py.
"""

from __future__ import annotations

import os

import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        # existence check, NOT glob: sf_dir may contain glob
        # metacharacters ('[1]' in generated workspace names)
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare_one(name: str, fn, sql: str, sf_dir: str) -> dict:
    con = duckdb_con(sf_dir)
    try:
        oracle = normalize(con.sql(sql).df())
    finally:
        con.close()
    ray_res = normalize(to_pandas(fn(sf_dir)))
    out = {"name": name, "rows_ray": len(ray_res), "rows_oracle": len(oracle)}
    if list(ray_res.columns) != list(oracle.columns):
        out["status"] = f"COLUMN MISMATCH {list(ray_res.columns)} vs {list(oracle.columns)}"
        return out
    if len(ray_res) != len(oracle):
        out["status"] = "ROWCOUNT MISMATCH"
        return out
    bad = []
    for c in ray_res.columns:
        a, b = ray_res[c].to_numpy(), oracle[c].to_numpy()
        eq = (a == b) | (pd.isna(a) & pd.isna(b))
        if not eq.all():
            i = int((~eq).argmax())
            bad.append(f"{c}[{i}]: {a[i]!r} != {b[i]!r}")
    out["status"] = "OK" if not bad else "VALUE MISMATCH: " + "; ".join(bad[:3])
    return out
