"""Mimic the driver's correctness gate: run each registered query's Ray
implementation AND its DuckDB oracle at sf0.01, compare row count, schema
(column names) and sorted values.

Usage: python scripts/check_oracles.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray

SF_DIR = __import__("os").environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                ok = np.allclose(a[c].fillna(-9e99), b[c].fillna(-9e99), rtol=0, atol=0)
                exact = (a[c].fillna(-9e99) == b[c].fillna(-9e99)).all()
                if not ok:
                    problems.append(f"float col {c} differs")
                elif not exact:
                    problems.append(f"float col {c}: allclose but not bit-exact")
            else:
                if not (a[c].fillna("-") == b[c].fillna("-")).all():
                    bad = (a[c].fillna("-") != b[c].fillna("-")).sum()
                    problems.append(f"col {c}: {bad} mismatches")
    return problems


def main():
    from geo_epic_ray.pipelines.queries import ORACLES, QUERIES

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    names = sys.argv[1:] or list(QUERIES)
    failed = []
    for name in names:
        fn = QUERIES[name]
        try:
            ray_df = to_pandas(fn(SF_DIR))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray error: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in ORACLES:
            print(f"okNR {name}: rows={len(ray_df)} (no oracle — rows-only)")
            continue
        try:
            sql_df = con.execute(ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: sql error: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok   {name}: rows={len(ray_df)}")
    ray.shutdown()
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}")
        sys.exit(1)
    print(f"\nall {len(names)} queries match")


if __name__ == "__main__":
    main()
