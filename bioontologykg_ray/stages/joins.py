"""Join strategies (SURVEY.md §2.5 J1-J9).

- ``broadcast_lookup``: small side shipped ONCE via ``ray.put``, looked
  up per batch with a vectorized pandas map — the default for dimension
  tables (J1 node-key resolution, J2 FK stitches, M10 lookups).
- ``semi_join`` / ``anti_join``: broadcast key set + vectorized isin
  (J5 existence checks / skip-already-imported).
- ``hash_join``: both sides large → explicit partitioned hash join
  (bucket column + co-group), the portable shuffle-join pattern.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import ray
import ray.data


def broadcast_lookup(
    ds: ray.data.Dataset,
    mapping: dict,
    key_col: str,
    out_col: str,
    default=None,
    concurrency: tuple = (1, 4),
) -> ray.data.Dataset:
    """Add ``out_col`` = mapping[key_col]; the dict crosses the object
    store once per actor, never per batch."""
    ref = ray.put(mapping)

    class Lookup:
        def __init__(self, ref):
            self.map = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df[out_col] = df[key_col].map(self.map)
            if default is not None:
                df[out_col] = df[out_col].fillna(default)
            return df

    return ds.map_batches(
        Lookup, fn_constructor_kwargs={"ref": ref},
        batch_format="pandas", batch_size=None,  # whole blocks: the map is vectorized
        concurrency=concurrency,
    )


def semi_join(ds: ray.data.Dataset, keys: set, key_col: str) -> ray.data.Dataset:
    """Keep rows whose key is in the broadcast key set (J5)."""
    ref = ray.put(frozenset(keys))

    class Semi:
        def __init__(self, ref):
            self.keys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df[df[key_col].isin(self.keys)]

    return ds.map_batches(Semi, fn_constructor_kwargs={"ref": ref},
                          batch_format="pandas", batch_size=None, concurrency=(1, 4))


def anti_join(ds: ray.data.Dataset, keys: set, key_col: str) -> ray.data.Dataset:
    """Drop rows whose key is in the broadcast key set (J5 anti)."""
    ref = ray.put(frozenset(keys))

    class Anti:
        def __init__(self, ref):
            self.keys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df[~df[key_col].isin(self.keys)]

    return ds.map_batches(Anti, fn_constructor_kwargs={"ref": ref},
                          batch_format="pandas", batch_size=None, concurrency=(1, 4))


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    num_buckets: int = 32,
    how: str = "inner",
) -> ray.data.Dataset:
    """Partitioned hash join: both sides get a bucket = crc32(key) % B
    column, co-group on bucket, pandas merge per bucket. Hot keys can be
    salted into sub-buckets by raising ``num_buckets``; B is the explicit
    shuffle width. Prefer ``broadcast_lookup`` whenever one side is
    dimension-sized."""

    def add_bucket(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__bucket"] = [
                zlib.crc32(str(v).encode()) % num_buckets for v in df[on]
            ]
            df["__side"] = side
            return df

        return fn

    l = left.map_batches(add_bucket("l"), batch_format="pandas")
    r = right.map_batches(add_bucket("r"), batch_format="pandas")

    lcols = [c for c in left.schema().names]
    rcols = [c for c in right.schema().names]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][lcols]
        rg = g[g["__side"] == "r"][rcols]
        out = lg.merge(rg, on=on, how=how if how != "left_anti" else "left",
                       indicator=(how == "left_anti"))
        if how == "left_anti":
            out = out[out["_merge"] == "left_only"][lcols]
        return out

    # union requires identical schemas → align columns with NaN padding
    all_cols = list(dict.fromkeys(lcols + rcols)) + ["__bucket", "__side"]

    def pad(df: pd.DataFrame) -> pd.DataFrame:
        for c in all_cols:
            if c not in df.columns:
                df[c] = np.nan
        return df[all_cols]

    u = l.map_batches(pad, batch_format="pandas").union(
        r.map_batches(pad, batch_format="pandas")
    )
    return u.groupby("__bucket").map_groups(merge, batch_format="pandas")
