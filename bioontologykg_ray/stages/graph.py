"""Distributed triangle counting over an edge-list Dataset.

Degree orientation + wedge closing (the MapReduce node-iterator++
scheme): orient every undirected edge from its lower-(degree, id)
endpoint toward the higher one — out-degrees are then bounded by
O(sqrt(m)), so per-source wedge emission is bounded — enumerate wedges
(unordered pairs of out-neighbors) per source, and close each wedge
against the edge set with ONE keyed exchange on a packed 64-bit pair
key. No driver state, no broadcast of graph-derived data: the degree
attach is a distributed cogroup, and the two group passes + final count
combine are the repo's standard sorted-block exchanges.

Reference precedent: the reference's KG cohesion/hub analytics family
(SURVEY §2 A-group; degree/hub queries over canonical edges) — triangle
participation is the standard clustering metric over the same edge
list, and `kg_hub_degrees` already covers the degree half.

Contract: input edges are UNDIRECTED, DISTINCT and loop-free (one row
per unordered pair, u != v); node ids are non-negative int64 < 2^31
(the wedge key packs two ids into one int64 — at web scale, densify ids
first, which the canonicalizer's label mapping already provides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from bioontologykg_ray.stages.agg import grouped_agg, grouped_count, sorted_group_apply
from bioontologykg_ray.stages.joins import cogroup_attach

_I64 = pa.int64()


def triangle_counts(
    ds: ray.data.Dataset,
    u_col: str = "u",
    v_col: str = "v",
    broadcast_threshold: int = 5_000_000,
) -> ray.data.Dataset:
    """Per-node triangle participation counts: (node, n_triangles),
    nodes in >=1 triangle only. Each triangle credits all three
    vertices.

    Degree orientation is size-gated (the canonicalizer's
    ``driver_threshold`` pattern): below ``broadcast_threshold`` nodes
    the degree table ships once via ``ray.put`` and orientation is a
    pure per-batch lookup (saves two sort barriers); above it, two
    distributed cogroups attach the endpoint degrees — no driver
    structure ever scales with the corpus, only with #nodes, and only
    below the gate."""

    # --- degrees (one exchange bounded by #nodes) ---------------------
    def endpoints(t: pa.Table) -> pa.Table:
        u = t[u_col].combine_chunks().cast(_I64)
        v = t[v_col].combine_chunks().cast(_I64)
        return pa.table({"node": pa.concat_arrays([u, v])})

    deg = grouped_count(
        ds.map_batches(endpoints, batch_format="pyarrow"), ["node"], out_col="d"
    ).materialize()

    o_empty = pd.DataFrame(
        {"src": pd.Series(dtype=np.int64), "dst": pd.Series(dtype=np.int64)}
    )

    def orient(m: pd.DataFrame) -> pd.DataFrame:
        if m.empty:
            return o_empty.copy()
        u = m[u_col].to_numpy(np.int64)
        v = m[v_col].to_numpy(np.int64)
        du = m["du"].to_numpy(np.int64)
        dv = m["dv"].to_numpy(np.int64)
        fwd = (du < dv) | ((du == dv) & (u < v))
        return pd.DataFrame(
            {"src": np.where(fwd, u, v), "dst": np.where(fwd, v, u)}
        )

    n_nodes = deg.count()
    if n_nodes == 0:
        # degenerate graph (no edges survived upstream filters): an
        # empty deg dataset has no schema to group on downstream; the
        # arrow block pins the output schema
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], _I64), "n_triangles": pa.array([], _I64)}
            )
        )

    if n_nodes <= broadcast_threshold:
        # degree table is node-bounded and small: one ray.put, zero-copy
        # per task; orientation becomes a single streaming map
        dt = deg.to_pandas()
        order = np.argsort(dt["node"].to_numpy(np.int64), kind="stable")
        ref = ray.put(
            (dt["node"].to_numpy(np.int64)[order], dt["d"].to_numpy(np.int64)[order])
        )

        def orient_bcast(df: pd.DataFrame) -> pd.DataFrame:
            nodes, d = ray.get(ref)
            df = df.copy()
            df["du"] = d[np.searchsorted(nodes, df[u_col].to_numpy(np.int64))]
            df["dv"] = d[np.searchsorted(nodes, df[v_col].to_numpy(np.int64))]
            return orient(df)

        oriented = ds.map_batches(orient_bcast, batch_format="pandas")
    else:
        e_empty = pd.DataFrame(
            {c: pd.Series(dtype=np.int64) for c in (u_col, v_col, "du")}
        )
        with_du = cogroup_attach(
            ds, u_col,
            {u_col: _I64, v_col: _I64},
            deg.map_batches(
                lambda df: df.rename(columns={"d": "du"}), batch_format="pandas"
            ),
            "node", {"du": _I64},
            fills={u_col: -1, v_col: -1, "du": -1},
            post=lambda m: m[[u_col, v_col, "du"]],
            empty_out=e_empty,
        )
        oriented = cogroup_attach(
            with_du, v_col,
            {u_col: _I64, v_col: _I64, "du": _I64},
            deg.map_batches(
                lambda df: df.rename(columns={"d": "dv"}), batch_format="pandas"
            ),
            "node", {"dv": _I64},
            fills={u_col: -1, v_col: -1, "du": -1, "dv": -1},
            post=orient,
            empty_out=o_empty,
        )

    # --- wedge emission per complete src group (out-deg = O(sqrt m)) --
    w_empty = pd.DataFrame(
        {"key": pd.Series(dtype=np.int64), "center": pd.Series(dtype=np.int64)}
    )

    def emit_wedges(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return w_empty.copy()
        m = df.merge(df, on="src")          # block-local self-merge
        m = m[m["dst_x"] < m["dst_y"]]
        key = (m["dst_x"].to_numpy(np.int64) << np.int64(32)) | m[
            "dst_y"
        ].to_numpy(np.int64)
        return pd.DataFrame({"key": key, "center": m["src"].to_numpy(np.int64)})

    wedges = sorted_group_apply(oriented, "src", emit_wedges, empty_like=w_empty)

    # --- edge probe rows: same packed key, center = -1 sentinel -------
    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        s = df["src"].to_numpy(np.int64)
        d = df["dst"].to_numpy(np.int64)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        return pd.DataFrame(
            {
                "key": (lo << np.int64(32)) | hi,
                "center": np.full(len(df), -1, dtype=np.int64),
            }
        )

    probes = oriented.map_batches(edge_rows, batch_format="pandas")

    # --- close wedges: one keyed exchange, vectorized per block -------
    c_empty = pd.DataFrame(
        {"node": pd.Series(dtype=np.int64), "cnt": pd.Series(dtype=np.int64)}
    )

    def close(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return c_empty.copy()
        # a key group holds at most one edge row (edges are distinct);
        # every wedge row in a group that also has the edge is a triangle
        has_edge = df.groupby("key")["center"].transform("min") == -1
        tri = df[has_edge & (df["center"] >= 0)]
        if tri.empty:
            return c_empty.copy()
        key = tri["key"].to_numpy(np.int64)
        nodes = np.concatenate(
            [tri["center"].to_numpy(np.int64), key >> np.int64(32),
             key & np.int64(0xFFFFFFFF)]
        )
        vc = pd.Series(nodes).value_counts()
        return pd.DataFrame(
            {
                "node": vc.index.to_numpy(np.int64),
                "cnt": vc.to_numpy(np.int64),
            }
        )

    credits = sorted_group_apply(
        wedges.union(probes), "key", close, empty_like=c_empty
    )
    return grouped_agg(credits, ["node"], {"n_triangles": ("cnt", "sum")})
