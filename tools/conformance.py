"""Local conformance harness — mimics the driver's correctness gate:
run every queries() entry and its oracle SQL side-by-side, compare
row-count + schema + order-insensitive values.

Usage: python tools/conformance.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[ns]").astype("int64")
        if df[c].dtype == object:
            # keep NULLs distinguishable from the strings 'None'/'nan'
            # (both engines may surface SQL NULL differently)
            df[c] = df[c].map(lambda v: "\x00NULL" if pd.isna(v) else str(v))
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    a, b = normalize(ray_df), normalize(sql_df)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: ray={list(a.columns)} sql={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count differs: ray={len(a)} sql={len(b)}"]
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            try:
                av = av.astype(np.float64)
                bv = bv.astype(np.float64)
            except (ValueError, TypeError) as e:
                problems.append(f"col {c}: incomparable dtypes ({e})")
                continue
            if not np.allclose(av, bv, rtol=0, atol=0, equal_nan=True):
                mx = np.nanmax(np.abs(av - bv))
                problems.append(f"col {c}: float mismatch (max abs diff {mx:.3e})")
        else:
            if av.dtype != bv.dtype:
                problems.append(f"col {c}: dtype {av.dtype} vs {bv.dtype}")
            eq = pd.Series(av).eq(pd.Series(bv)) | (pd.Series(av).isna() & pd.Series(bv).isna())
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                problems.append(f"col {c}: value mismatch at row {i}: {av[i]!r} vs {bv[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.use_polars_sort = True  # ~25% faster block sorts (measured)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from bioontologykg_ray.pipelines.queries import QUERIES, oracle_for_sf, sf_of

    unknown = only - set(QUERIES)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)

    oracle = oracle_for_sf(sf_of(sf_dir))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_df(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"pass {name}: rows-only ({len(ray_df)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            sql_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: sql error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"   {p}")
            n_fail += 1
        else:
            print(f"pass {name}: {len(ray_df)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
