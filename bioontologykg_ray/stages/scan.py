"""Distributed prefix sum (scan) + token-budget sequence packing.

A running total over a globally-ordered stream is the primitive behind
training-data sequence packing (fill each sample up to a token budget),
global row numbering, and deterministic offset assignment. The
reference's analogue is its running-metrics accumulation
(`src/BioOntologyKG/importers/pubmed/neo4j_citation_relationship_builder.py:226-246`
keeps processed/succeeded running counts) — here it is data-parallel:

Two-phase scan (the classic Blelloch decomposition on Ray Data blocks):

1. range-sort by the order column and MATERIALIZE (both passes must see
   the same block boundaries);
2. per-block (min_order, sum) pairs — ONE ROW PER BLOCK — are collected
   to the driver: O(#blocks), never O(#rows), so at 100 TB / 400k
   blocks this is a ~10 MB driver table;
3. exclusive block offsets broadcast back; each block adds its offset
   to a vectorized within-block cumsum.

Contract: ``order_col`` values are globally UNIQUE (block identity is
recovered by each block's min order value; duplicate orders straddling
a block boundary would alias two blocks). Doc ids / event ids satisfy
this; ties would need a composite order key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def prefix_sum(
    ds: ray.data.Dataset,
    order_col: str,
    val_col: str,
    out_col: str = "running_total",
) -> ray.data.Dataset:
    """Adds ``out_col`` = inclusive running sum of ``val_col`` in global
    ``order_col`` order. One range shuffle + two vectorized passes."""
    s = ds.sort(order_col).materialize()

    # integer cost columns accumulate EXACTLY in int64/python ints —
    # float64 running totals round past 2^53 and break the SQL-window
    # reproducibility claim
    def block_stat(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"lo": pd.Series(dtype="object"),
                                 "s": pd.Series(dtype="object")})
        is_int = pd.api.types.is_integer_dtype(df[val_col])
        tot = df[val_col].sum()
        return pd.DataFrame(
            {"lo": [df[order_col].iloc[0]],
             "s": [int(tot) if is_int else float(tot)]}
        )

    stats = s.map_batches(block_stat, batch_format="pandas", batch_size=None).to_pandas()
    stats = stats.sort_values("lo").reset_index(drop=True)
    # object-dtype cumsum over #blocks rows: python-int exact, tiny
    stats["off"] = stats["s"].astype(object).cumsum().shift(fill_value=0)
    offsets = dict(zip(stats["lo"], stats["off"]))
    off_ref = ray.put(offsets)

    def add(df: pd.DataFrame) -> pd.DataFrame:
        is_int = pd.api.types.is_integer_dtype(df[val_col]) if len(df) else False
        if df.empty:
            df = df.copy()
            df[out_col] = pd.Series(dtype="float64")
            return df
        off = ray.get(off_ref)[df[order_col].iloc[0]]
        df = df.copy()
        if is_int:
            df[out_col] = df[val_col].to_numpy(np.int64).cumsum() + np.int64(off)
        else:
            df[out_col] = df[val_col].to_numpy(np.float64).cumsum() + float(off)
        return df

    return s.map_batches(add, batch_format="pandas", batch_size=None)


def pack_by_budget(
    ds: ray.data.Dataset,
    order_col: str,
    cost_col: str,
    budget: float,
    bin_col: str = "bin",
) -> ray.data.Dataset:
    """Deterministic sequence packing: walking the stream in
    ``order_col`` order, assign each row the bin index
    ``floor(exclusive_running_cost / budget)`` — contiguous bins of
    ~``budget`` total cost (a row may straddle; budget is a soft cap,
    the standard cumulative-split used for token-budget sharding).
    Exactly reproducible in SQL as
    ``FLOOR((SUM(cost) OVER (ORDER BY ord) - cost) / budget)``."""
    if not budget > 0:
        raise ValueError(f"budget must be > 0, got {budget!r}")
    with_sum = prefix_sum(ds, order_col, cost_col, out_col="__run")

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            df = df.copy()
            df[bin_col] = pd.Series(dtype="int64")
            return df.drop(columns="__run")
        excl = df["__run"].to_numpy(np.float64) - df[cost_col].to_numpy(np.float64)
        df = df.copy()
        df[bin_col] = np.floor(excl / float(budget)).astype(np.int64)
        return df.drop(columns="__run")

    return with_sum.map_batches(assign, batch_format="pandas")
