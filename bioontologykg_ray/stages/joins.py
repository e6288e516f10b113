"""Join strategies (SURVEY.md §2.5 J1-J9).

- ``broadcast_lookup``: small side shipped ONCE via ``ray.put``, looked
  up per batch with a vectorized pandas map — the default for dimension
  tables (J1 node-key resolution, J2 FK stitches, M10 lookups).
- ``semi_join`` / ``anti_join``: broadcast key set + vectorized isin
  (J5 existence checks / skip-already-imported).
- ``cogroup_attach``: both sides large, right side unique-per-key →
  sort-based co-group join with ZERO driver-side state. This is the
  scale path for "attach per-key payload to a big stream" (dedup
  verify stages, canonical-mapping application at web-scale entity
  counts) — the fix for round-1's driver-collected shingle sets.
- ``hash_join``: both sides large, general many-to-many → explicit
  partitioned hash join (vectorized bucket column + co-group).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
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


# ---------------------------------------------------------------------------
# sort-based co-group attach (the de-drivered "join payload onto stream")
# ---------------------------------------------------------------------------

def cogroup_attach(
    left: ray.data.Dataset,
    left_key: str,
    left_spec: dict[str, pa.DataType],
    right: ray.data.Dataset,
    right_key: str,
    right_spec: dict[str, pa.DataType],
    fills: dict,
    post: Callable[[pd.DataFrame], pd.DataFrame],
    empty_out: pd.DataFrame,
    key_type: pa.DataType = pa.int64(),
    how: str = "inner",
) -> ray.data.Dataset:
    """Attach ``right_spec`` columns (from a dataset with AT MOST ONE row
    per key) onto every ``left`` row sharing the key — entirely as a
    distributed sort + per-group vectorized merge. No broadcast, no
    ``ray.put`` of corpus-derived state, no driver materialization: this
    is the 100-TB path for verify joins and mapping application.

    Mechanics: both sides map into one ENVELOPE schema (``__k`` + all
    columns, explicitly Arrow-typed so every block — including empty
    ones — has an identical schema; missing cells get the typed sentinel
    from ``fills``, never NaN — see ADVICE on NaN-padding dtype
    coercion), union, then one range sort on ``__k`` with block-local
    merges (stages/agg.sorted_group_apply contract: complete key groups
    per task, block-edge keys in a second small pass).

    ``post`` runs on the merged frame INSIDE the same task — verify /
    filter / project without another pass over the data. It must accept
    an empty input and return ``empty_out``-shaped frames. With
    ``how='left'`` the right columns contain NaN/None where the key had
    no payload row; ``post`` is responsible for coalescing.
    """
    lcols = list(left_spec)
    rcols = list(right_spec)
    env_fields = (
        [("__k", key_type)]
        + [(c, left_spec[c]) for c in lcols]
        + [(c, right_spec[c]) for c in rcols]
        + [("__p", pa.int8())]
    )

    def _envelope(t: pa.Table, key: str, present: dict, side: int) -> pa.Table:
        n = t.num_rows
        cols = {}
        for name, typ in env_fields:
            if name == "__k":
                cols[name] = t[key].combine_chunks().cast(key_type)
            elif name == "__p":
                cols[name] = pa.array(np.full(n, side, dtype=np.int8))
            elif name in present:
                cols[name] = t[name].combine_chunks().cast(typ)
            else:
                cols[name] = pa.array([fills[name]] * n, typ)
        return pa.table(cols)

    l_env = left.map_batches(
        lambda t: _envelope(t, left_key, left_spec, 0), batch_format="pyarrow"
    )
    r_env = right.map_batches(
        lambda t: _envelope(t, right_key, right_spec, 1), batch_format="pyarrow"
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty_out.copy()
        l = df.loc[df["__p"] == 0, ["__k"] + lcols]
        r = df.loc[df["__p"] == 1, ["__k"] + rcols]
        if l.empty or (r.empty and how == "inner"):
            return empty_out.copy()
        out = l.merge(r, on="__k", how=how).drop(columns="__k")
        return post(out)

    from bioontologykg_ray.stages.agg import sorted_group_apply

    return sorted_group_apply(
        l_env.union(r_env), "__k", merge, empty_out, hash_sort=True
    )


# ---------------------------------------------------------------------------
# partitioned hash join (general many-to-many, both sides large)
# ---------------------------------------------------------------------------

def _arrow_to_nullable(t) -> str:
    """Arrow/numpy dtype → pandas NULLABLE dtype (so padded NA cells
    never coerce int64→float64 and every union block shares one schema).
    Ray reports numpy dtypes (or plain Python types) for pandas-backed
    datasets, arrow DataTypes for arrow-backed ones — handle both."""
    if isinstance(t, pa.DataType):
        if pa.types.is_integer(t):
            return "Int64"
        if pa.types.is_floating(t):
            return "Float64"
        if pa.types.is_boolean(t):
            return "boolean"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "string"
        return "object"
    try:
        dt = np.dtype(t)
    except TypeError:
        return "object"
    if np.issubdtype(dt, np.integer):
        return "Int64"
    if np.issubdtype(dt, np.floating):
        return "Float64"
    if np.issubdtype(dt, np.bool_):
        return "boolean"
    return "object"


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    num_buckets: int | None = None,
    how: str = "inner",
) -> ray.data.Dataset:
    """Partitioned hash join: both sides get a vectorized bucket =
    hash(key) % B column, co-group on bucket, pandas merge per bucket.
    Hot keys can be salted into sub-buckets by raising ``num_buckets``;
    B is the explicit shuffle width and defaults to 4× the cluster CPU
    count (scales with the cluster, not a constant — each bucket task
    holds 1/B of both sides). Prefer ``broadcast_lookup`` whenever one
    side is dimension-sized and ``cogroup_attach`` when the right side
    is unique-per-key.

    Dtype discipline (ADVICE round 1): missing columns are padded with
    typed ``pd.NA`` on pandas NULLABLE dtypes, never ``np.nan`` — so
    int64 join keys are never coerced to float64 (exactness above 2^53)
    and output dtypes match the inputs. Inner joins restore the exact
    input dtypes on output."""
    if num_buckets is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_buckets = max(32, 4 * cpus)

    lschema, rschema = left.schema(), right.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)
    all_cols = list(dict.fromkeys(lcols + rcols))
    dtype_map: dict[str, str] = {}
    for name, typ in zip(lschema.names, lschema.types):
        dtype_map[name] = _arrow_to_nullable(typ)
    for name, typ in zip(rschema.names, rschema.types):
        dtype_map.setdefault(name, _arrow_to_nullable(typ))

    def pad_bucket(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            # vectorized, process-stable bucketing (no per-row Python);
            # integer keys normalize to int64 so both sides hash alike
            key = out[on].to_numpy()
            if np.issubdtype(key.dtype, np.integer):
                key = key.astype(np.int64)
            out["__bucket"] = (
                pd.util.hash_array(key, categorize=False) % num_buckets
            ).astype(np.int64)
            out["__side"] = side
            for c in all_cols:
                if c not in out.columns:
                    out[c] = pd.Series(pd.NA, index=out.index, dtype=dtype_map[c])
                elif dtype_map[c] != "object":
                    out[c] = out[c].astype(dtype_map[c])
            return out[all_cols + ["__bucket", "__side"]]

        return fn

    l = left.map_batches(pad_bucket("l"), batch_format="pandas")
    r = right.map_batches(pad_bucket("r"), batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][lcols]
        rg = g[g["__side"] == "r"][rcols]
        out = lg.merge(rg, on=on, how=how if how != "left_anti" else "left",
                       indicator=(how == "left_anti"))
        if how == "left_anti":
            out = out[out["_merge"] == "left_only"][lcols]
        if how in ("inner", "left_anti"):
            # no NAs can remain → give back plain numpy dtypes
            for c in out.columns:
                if str(out[c].dtype) == "Int64":
                    out[c] = out[c].astype("int64")
                elif str(out[c].dtype) == "Float64":
                    out[c] = out[c].astype("float64")
                elif str(out[c].dtype) == "string":
                    out[c] = out[c].astype(object)
        return out

    u = l.union(r)
    return u.groupby("__bucket").map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# Bloom-prefiltered exact semi-join (filter side too big to broadcast a set)
# ---------------------------------------------------------------------------

def _bloom_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k bit positions per key via double hashing (Kirsch-Mitzenmacher):
    pos_i = (h1 + i*h2) mod m. Shape (len(keys), k)."""
    if np.issubdtype(keys.dtype, np.integer):
        keys = keys.astype(np.int64)
    h1 = pd.util.hash_array(keys, categorize=False)
    h2 = pd.util.hash_array(keys, categorize=False, hash_key="bloomsecond516b") | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def bloom_bitmap(
    keys_ds: ray.data.Dataset, key_col: str, m_bits: int = 1 << 23, k: int = 4
) -> np.ndarray:
    """Bloom filter of a key column as a uint64 word array (m_bits/64
    words, ~m_bits/8 bytes regardless of key count). Per-block partials
    are OR-combined in a fan-in-32 tree of repartition rounds — every
    task and the driver hold O(m_bits) only, never O(#blocks · m)."""
    n_words = m_bits // 64

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words = np.zeros(n_words, dtype=np.uint64)
        if len(df):
            pos = _bloom_positions(df[key_col].to_numpy(), m_bits, k).ravel()
            np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
        return pd.DataFrame({"words": [words.tobytes()]})

    def or_within(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(n_words, dtype=np.uint64)
        for b in df["words"]:
            acc |= np.frombuffer(b, dtype=np.uint64)
        return pd.DataFrame({"words": [acc.tobytes()]})

    parts = keys_ds.map_batches(partial, batch_format="pandas", batch_size=None)
    # tree OR: each round ORs within blocks then shrinks the block count
    # 32×; terminates at one block (log_32(#blocks) rounds)
    while True:
        parts = parts.map_batches(or_within, batch_format="pandas", batch_size=None)
        n_blocks = parts.materialize().num_blocks()
        if n_blocks <= 1:
            break
        parts = parts.repartition(max(1, -(-n_blocks // 32)))
    rows = parts.take_all()  # exactly one m_bits/8-byte row
    acc = np.zeros(n_words, dtype=np.uint64)
    for r in rows:
        acc |= np.frombuffer(r["words"], dtype=np.uint64)
    return acc


def bloom_semi_join(
    left: ray.data.Dataset,
    key_col: str,
    right: ray.data.Dataset,
    right_key: str,
    m_bits: int = 1 << 23,
    k: int = 4,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """EXACT distributed semi-join for a filter side too big to
    broadcast as a key set (the reference's existence joins, J5, at
    corpus scale). A Bloom bitmap of the right keys — bounded at
    m_bits/8 bytes however many keys — is broadcast and probed map-side
    to drop the (typically dominant) non-matching left rows BEFORE any
    shuffle; the bloom-positive survivors then go through an exact
    partitioned hash join against the distinct right keys, so false
    positives cost only residual-join work, never correctness. Classic
    bloom-pushdown from distributed SQL engines, composed from the
    repo's broadcast + hash_join primitives."""
    from bioontologykg_ray.stages.agg import grouped_distinct

    words = bloom_bitmap(right, right_key, m_bits=m_bits, k=k)
    ref = ray.put(words)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        w = ray.get(ref)
        pos = _bloom_positions(df[key_col].to_numpy(), m_bits, k)
        hit = ((w[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)).astype(bool)
        return df[hit.all(axis=1)]

    survivors = left.map_batches(probe, batch_format="pandas")
    keys = grouped_distinct(right.select_columns([right_key]), [right_key])
    if right_key != key_col:
        keys = keys.map_batches(
            lambda df: df.rename(columns={right_key: key_col}), batch_format="pandas"
        )
    return hash_join(survivors, keys, on=key_col, num_buckets=num_buckets, how="inner")
