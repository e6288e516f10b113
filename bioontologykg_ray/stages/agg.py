"""Vectorized aggregation strategies for HIGH-CARDINALITY keys.

Ray's built-in ``groupby().aggregate()`` keeps a Python accumulator per
key (~0.4 ms/group measured) — fine for dozens of groups, fatal for
hundreds of thousands. These helpers keep everything in pandas/Arrow
kernels:

- ``two_phase_agg``: map-side vectorized partial aggregate (one row per
  key per batch) → combine on the much smaller partials. The shuffle
  moves O(#keys), not O(#rows) — the same pre-aggregate pattern the
  skew notes in SURVEY.md §4.2 demand.
- ``sorted_group_apply``: EXACT per-key apply for when the operation
  needs the whole group (e.g. candidate-pair emission). Sort by key
  (one range shuffle, vectorized), apply per block to all keys strictly
  inside the block, and route the block-edge keys (the only ones that
  may straddle blocks) into a small second pass. Cost: one sort + two
  vectorized passes; no per-group Python dispatch in Ray.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import ray.data

from bioontologykg_ray import ensure_quiet


def two_phase_agg(
    ds: ray.data.Dataset,
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    combine_fn: Callable[[pd.DataFrame], pd.DataFrame],
    combine_partitions: int = 1,
) -> ray.data.Dataset:
    """partial per batch → repartition → combine per block.

    ``combine_partitions=1`` gives a single vectorized combine task over
    ~#keys rows (fine into the tens of millions). For larger key spaces
    raise it and make ``combine_fn`` idempotent per key-range (pair with
    a prior ``sort`` so ranges don't straddle, as sorted_group_apply
    does)."""
    partials = ds.map_batches(partial_fn, batch_format="pandas")
    return partials.repartition(combine_partitions).map_batches(
        combine_fn, batch_format="pandas", batch_size=None
    )


def grouped_count(
    ds: ray.data.Dataset, keys: list[str], out_col: str = "n",
    combine_partitions: int = 1, sorted_combine: bool = False,
) -> ray.data.Dataset:
    """Distributed COUNT(*) GROUP BY keys, fully vectorized.
    ``sorted_combine=True`` parallelizes the combine across blocks via a
    range sort of the (already reduced) partials — use when the key
    space itself is large (millions)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False).size().rename(columns={"size": out_col})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False)[out_col].sum()

    if sorted_combine:
        partials = ds.map_batches(partial, batch_format="pandas")
        return sorted_group_apply(
            partials, keys if len(keys) > 1 else keys[0], combine, hash_sort=True
        )
    return two_phase_agg(ds, partial, combine, combine_partitions)


def grouped_distinct(
    ds: ray.data.Dataset, keys: list[str], combine_partitions: int = 1
) -> ray.data.Dataset:
    """Distributed SELECT DISTINCT keys, fully vectorized.

    ``combine_partitions=1``: single combine task over the partial-
    deduped stream (fine into the tens of millions of distinct keys).
    ``>1``: a KEYED exchange (hash-sorted group pass) — a blind
    ``repartition(n)`` would let the same key land in two combine
    blocks and survive twice (round-2 review finding)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[keys].drop_duplicates()

    if combine_partitions <= 1:
        return two_phase_agg(ds, partial, partial, 1)
    partials = ds.map_batches(partial, batch_format="pandas")
    return sorted_group_apply(
        partials, list(keys), lambda df: df.drop_duplicates(), hash_sort=True
    )


def sorted_group_apply(
    ds: ray.data.Dataset,
    key_col: str | list[str],
    apply_fn: Callable[[pd.DataFrame], pd.DataFrame],
    empty_like: pd.DataFrame | None = None,
    hash_sort: bool = False,
) -> ray.data.Dataset:
    """Exact group-wise apply without per-group task dispatch.

    ``apply_fn`` receives a DataFrame containing one or more COMPLETE
    key groups (use ``df.groupby(key_col)`` inside — vectorized) and
    returns any frame. Keys that sit at a block's min/max after the sort
    (the only ones that can straddle block boundaries) are processed
    exclusively in a second, small pass. ``empty_like`` pins the output
    schema for empty partitions.

    ``hash_sort=True`` range-sorts a uint64 HASH of the key instead of
    the key itself — 64-bit int compares/exchanges are ~3× cheaper than
    long composite strings (measured, BASELINE.md). Correct for any
    apply_fn that groups by the REAL key internally: equal keys share a
    hash so complete groups still land in one pass; a cross-key hash
    collision merely co-locates two groups (apply_fn separates them),
    and a collision at a block boundary routes both groups to pass 2,
    which applies globally by real key. NOT for order-sensitive
    apply_fns that read cross-key block order.

    The sorted dataset is MATERIALIZED: both passes must observe the
    exact same block boundaries (a lazy sort could re-execute with
    different boundaries per consumer, double- or under-counting the
    edge keys)."""
    keys = [key_col] if isinstance(key_col, str) else list(key_col)

    if hash_sort:
        def add_hash(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__h"] = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
            return df

        ds = ds.map_batches(add_hash, batch_format="pandas")
        sort_keys: list[str] | str = "__h"
        mask_cols = ["__h"]
    else:
        sort_keys = keys if len(keys) > 1 else keys[0]
        mask_cols = keys
    s = ds.sort(sort_keys).materialize()

    def strip(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns="__h") if hash_sort else df

    def edge_mask(df: pd.DataFrame) -> pd.Series:
        k = df[mask_cols]
        first = (k == k.iloc[0]).all(axis=1)
        last = (k == k.iloc[-1]).all(axis=1)
        # NaN keys never compare equal, so a null-keyed group straddling
        # a block boundary would silently split into two body fragments:
        # route EVERY null-keyed row to the (globally applied) edge pass
        return first | last | k.isna().any(axis=1)

    def inner(df: pd.DataFrame) -> pd.DataFrame:
        ensure_quiet()  # worker imports the package -> log filter active
        # apply_fn must accept empty input (returns the empty frame with
        # correct dtypes); empty_like is only a fallback override
        if df.empty:
            return apply_fn(strip(df)) if empty_like is None else empty_like.copy()
        body = df[~edge_mask(df)]
        if body.empty:
            return apply_fn(strip(df.iloc[0:0])) if empty_like is None else empty_like.copy()
        return apply_fn(strip(body))

    def edges_only(df: pd.DataFrame) -> pd.DataFrame:
        ensure_quiet()
        if df.empty:
            return df
        return df[edge_mask(df)]

    body_out = s.map_batches(inner, batch_format="pandas", batch_size=None)
    edge_rows = s.map_batches(edges_only, batch_format="pandas", batch_size=None)
    edge_out = edge_rows.repartition(1).map_batches(
        lambda df: (
            empty_like.copy()
            if df.empty and empty_like is not None
            else apply_fn(strip(df))
        ),
        batch_format="pandas", batch_size=None,
    )
    return body_out.union(edge_out)


def grouped_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    combine_partitions: int = 1,
) -> ray.data.Dataset:
    """Distributed GROUP BY with named aggregates, fully vectorized.

    ``aggs``: {out_col: (src_col, fn)} with fn in
    {sum, count, min, max, mean}. ``keys=[]`` → one global row.
    Decomposition: mean ships (sum, count) partials; count ships sizes
    summed in the combine. Replaces Ray's builtin aggregate, whose
    per-key/row Python accumulators cost ~0.45 ms/row (measured).
    """
    GLOBAL = not keys
    gkeys = keys or ["__g"]

    partial_ops = []   # (tmp_col, src, pandas_fn)
    combine_ops = []   # (tmp_col, pandas_fn)
    finalize = []      # (out_col, kind, tmp_cols)
    for out_col, (src, fn) in aggs.items():
        if fn == "count":
            # SQL COUNT(col) semantics: NULLs in src are not counted
            partial_ops.append((f"__{out_col}", src, "count"))
            combine_ops.append((f"__{out_col}", "sum"))
            finalize.append((out_col, "int", [f"__{out_col}"]))
        elif fn in ("sum", "min", "max"):
            partial_ops.append((f"__{out_col}", src, fn))
            combine_ops.append((f"__{out_col}", "sum" if fn == "sum" else fn))
            finalize.append((out_col, "id", [f"__{out_col}"]))
        elif fn == "mean":
            partial_ops.append((f"__{out_col}_s", src, "sum"))
            partial_ops.append((f"__{out_col}_c", src, "count"))  # AVG skips NULLs
            combine_ops.append((f"__{out_col}_s", "sum"))
            combine_ops.append((f"__{out_col}_c", "sum"))
            finalize.append((out_col, "mean", [f"__{out_col}_s", f"__{out_col}_c"]))
        else:
            raise ValueError(fn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if GLOBAL:
            df = df.assign(__g=0)
        gb = df.groupby(gkeys, dropna=False)
        cols = {}
        for tmp, src, fn in partial_ops:
            cols[tmp] = gb[src].count() if fn == "count" else gb[src].agg(fn)
        return pd.DataFrame(cols).reset_index()

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        gb = df.groupby(gkeys, dropna=False)
        cols = {tmp: gb[tmp].agg(fn) for tmp, fn in combine_ops}
        out = pd.DataFrame(cols).reset_index()
        for out_col, kind, tmps in finalize:
            if kind == "int":
                out[out_col] = out[tmps[0]].astype("int64")
            elif kind == "mean":
                out[out_col] = out[tmps[0]] / out[tmps[1]]
            else:
                out[out_col] = out[tmps[0]]
        keep = gkeys + [o for o, _, _ in finalize]
        out = out[keep]
        if GLOBAL:
            out = out.drop(columns=["__g"])
        return out

    return two_phase_agg(ds, partial, combine, combine_partitions)


def grouped_median_discrete(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    out_col: str = "median",
) -> pd.DataFrame:
    """EXACT per-group median via a bounded (keys × value) histogram.

    Median rule (SQL ``median()`` over numerics, which the oracle
    replays): odd n → the middle value; even n → the arithmetic mean of
    the two middle values. NULL values are ignored (SQL aggregate
    semantics); ``n_vals`` is the per-group non-null count.

    Scale shape — the grouped companion to ``exact_quantiles``: one
    two-phase grouped count moves O(#groups × #distinct values) rows
    over the exchange, NOT O(#rows); the final cumsum/rank pick runs on
    the driver over that (small by assumption) histogram. ASSUMES the
    value column has bounded cardinality (quantities, codes, lengths);
    bin a continuous column first or use a sort-based plan.
    """
    import numpy as np

    hist = grouped_agg(ds, keys + [col], {"n": (col, "count")}).to_pandas()
    empty = pd.DataFrame(
        {**{k: pd.Series(dtype=object) for k in keys},
         out_col: pd.Series(dtype="float64"),
         "n_vals": pd.Series(dtype="int64")}
    )
    if hist.empty or col not in hist.columns:
        # 0-row Ray datasets drop their schema on to_pandas (memory
        # gotcha #1) — the histogram frame may arrive column-less
        return empty
    hist = hist[hist[col].notna() & (hist["n"] > 0)]
    hist = hist.sort_values(keys + [col], kind="mergesort").reset_index(drop=True)
    rows = []
    for gkey, g in hist.groupby(keys, dropna=False, sort=True):
        cum = g["n"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        vals = g[col].to_numpy(np.float64)
        lo = vals[int(np.searchsorted(cum, (n + 1) // 2, side="left"))]
        hi = vals[int(np.searchsorted(cum, (n + 2) // 2, side="left"))]
        key_vals = gkey if isinstance(gkey, tuple) else (gkey,)
        rows.append((*key_vals, (lo + hi) / 2.0, n))
    return pd.DataFrame(rows, columns=keys + [out_col, "n_vals"]).astype(
        {out_col: np.float64, "n_vals": np.int64}
    )


def exact_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: list[float],
) -> pd.DataFrame:
    """EXACT distributed quantiles by value histogram.

    Quantile rule (the one the SQL oracle replays): q-quantile = the
    value at ascending rank ``ceil(q * n)`` — i.e. the smallest value v
    with at least ``ceil(q*n)`` rows ≤ v.

    Scale shape: a two-phase grouped count by value — the shuffle moves
    O(#distinct values) rows, NOT O(#rows) — then the (value, count)
    histogram (small by assumption) is cumsum'd on the driver. ASSUMES
    bounded cardinality (ints, codes, lengths); for a continuous column
    bin first (e.g. round) or the histogram itself becomes the data.
    Contrast with a sort-based quantile (full all-to-all over every
    row) or a t-digest (approximate): for discrete columns this is both
    exact and the cheapest exchange.
    """
    import math

    import numpy as np

    hist = (
        grouped_agg(ds, [col], {"n": (col, "count")})
        .to_pandas()
    )
    hist = (  # SQL quantiles ignore NULLs — drop the null-value bucket
        hist[hist[col].notna()].sort_values(col).reset_index(drop=True)
    )
    cum = hist["n"].to_numpy(np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return pd.DataFrame({"q": pd.Series(dtype="float64"),
                             "value": pd.Series(dtype="int64")})
    idxs = [int(np.searchsorted(cum, math.ceil(q * n), side="left")) for q in qs]
    return pd.DataFrame({
        "q": np.asarray(qs, dtype=np.float64),
        "value": hist[col].iloc[idxs].to_numpy(),
    })


def quantiles_cont(
    ds: ray.data.Dataset,
    col: str,
    qs: list[float],
) -> pd.DataFrame:
    """EXACT interpolated quantiles (SQL ``quantile_cont`` semantics,
    which the oracle replays): position p = q*(n-1) over the sorted
    multiset; result = v[floor(p)] + (p - floor(p)) * (v[ceil(p)] -
    v[floor(p)]) — the same IEEE op sequence DuckDB runs, so results
    are bit-identical when both engines see the same doubles.

    Same scale shape as ``exact_quantiles``: one two-phase grouped
    count moving O(#distinct values) rows, histogram cumsum on the
    driver. NULLs ignored. ASSUMES bounded value cardinality."""
    import numpy as np

    hist = grouped_agg(ds, [col], {"n": (col, "count")}).to_pandas()
    if hist.empty or col not in hist.columns:
        return pd.DataFrame({"q": pd.Series(dtype="float64"),
                             "value": pd.Series(dtype="float64")})
    hist = hist[hist[col].notna()].sort_values(col).reset_index(drop=True)
    cum = hist["n"].to_numpy(np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return pd.DataFrame({"q": pd.Series(dtype="float64"),
                             "value": pd.Series(dtype="float64")})
    vals = hist[col].to_numpy(np.float64)
    out = []
    for q in qs:
        p = q * (n - 1)
        lo = int(np.floor(p))
        hi = int(np.ceil(p))
        frac = p - lo
        v_lo = vals[int(np.searchsorted(cum, lo + 1, side="left"))]
        v_hi = vals[int(np.searchsorted(cum, hi + 1, side="left"))]
        out.append(v_lo + frac * (v_hi - v_lo))
    return pd.DataFrame({"q": np.asarray(qs, np.float64),
                         "value": np.asarray(out, np.float64)})
