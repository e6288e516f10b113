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
    if n_nodes:
        # the wedge key packs two ids as (a<<32)|b — an id >= 2^32 would
        # silently alias wedge keys into wrong counts (ADVICE round 2);
        # the degree table is already materialized so the check is one
        # cheap node-bounded aggregate
        # one aggregation job for both bounds (ADVICE r3: max()+min()
        # each launched a separate full pass over the degree table)
        from ray.data.aggregate import Max, Min

        bounds = deg.aggregate(Max("node"), Min("node"))
        max_id, min_id = bounds["max(node)"], bounds["min(node)"]
        if max_id >= (1 << 32) or min_id < 0:
            raise ValueError(
                f"triangle_counts requires node ids in [0, 2^32) for the "
                f"packed (a<<32)|b wedge key; got range [{min_id}, {max_id}] "
                "— densify ids first (see the module docstring)"
            )
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

    # consumed twice below (wedges AND probes) — pin it so the
    # orientation pipeline does not re-execute per consumer
    oriented = oriented.materialize()

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


def pagerank_fixedpoint(
    ds: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    scale: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
    broadcast_threshold: int = 5_000_000,
) -> ray.data.Dataset:
    """Fixed-point (integer) PageRank over a directed edge list —
    ``iters`` power iterations in pure int64 arithmetic so the result
    is bit-exact across engines (a float PageRank is ulp-fragile
    between summation orders; fixed-point is the standard trick for
    reproducible large-scale ranking):

        r0(v)  = scale
        r_k(v) = (scale*(den-num))//den
                 + (num * sum_{u->v} r_{k-1}(u) // outdeg(u)) // den

    Dangling-node mass (outdeg 0) is dropped, multi-edges collapse to
    one (both mirrored by the SQL oracle). Node state is O(#nodes):
    below ``broadcast_threshold`` it ships per iteration via ``ray.put``
    (the canonicalizer's driver_threshold contract — entities ≪ corpus);
    above it every iteration is cogroup exchanges with no driver
    structure. Output: (node, pagerank_fp) for every node."""
    S = pa.string()

    def pair_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t[src_col].combine_chunks().cast(S),
                "dst": t[dst_col].combine_chunks().cast(S),
            }
        )

    e = grouped_count(
        ds.map_batches(pair_rows, batch_format="pyarrow"), ["src", "dst"]
    ).select_columns(["src", "dst"])

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                )
            }
        )

    node_ds = grouped_count(
        e.map_batches(endpoints, batch_format="pyarrow"), ["node"]
    ).select_columns(["node"]).materialize()
    outdeg = grouped_count(e, ["src"], out_col="od")

    base = (scale * (damping_den - damping_num)) // damping_den
    n_nodes = node_ds.count()

    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], S), "pagerank_fp": pa.array([], _I64)})
        )

    if n_nodes <= broadcast_threshold:
        nodes_arr = np.sort(node_ds.to_pandas()["node"].to_numpy(dtype=object))
        od_df = outdeg.to_pandas()
        od = np.zeros(n_nodes, dtype=np.int64)
        od[np.searchsorted(nodes_arr, od_df["src"].to_numpy(dtype=object))] = (
            od_df["od"].to_numpy(np.int64)
        )
        r = np.full(n_nodes, scale, dtype=np.int64)
        e = e.materialize()  # iterated over; avoid re-running the dedup
        # nodes + outdegrees ship ONCE through the object store; only the
        # rank vector is re-put per iteration (closure-pickled arrays
        # would re-ship with every task spec)
        static_ref = ray.put((nodes_arr, od))
        for _ in range(iters):
            ref = ray.put(r)

            def contrib(df: pd.DataFrame) -> pd.DataFrame:
                nodes_, od_ = ray.get(static_ref)
                r_ = ray.get(ref)
                si = np.searchsorted(nodes_, df["src"].to_numpy(dtype=object))
                out = pd.DataFrame(
                    {"node": df["dst"].to_numpy(), "c": r_[si] // od_[si]}
                )
                return out.groupby("node", as_index=False)["c"].sum()

            sums = grouped_agg(
                e.map_batches(contrib, batch_format="pandas"),
                ["node"], {"c": ("c", "sum")},
            ).to_pandas()
            full = np.zeros(n_nodes, dtype=np.int64)
            if len(sums):
                full[
                    np.searchsorted(
                        nodes_arr, sums["node"].to_numpy(dtype=object)
                    )
                ] = sums["c"].to_numpy(np.int64)
            r = base + (damping_num * full) // damping_den
        out = pd.DataFrame({"node": nodes_arr, "pagerank_fp": r})
        return ray.data.from_pandas(out)

    # --- distributed route: node state stays a dataset ----------------
    # both are consumed once PER ITERATION — pin them so the corpus-wide
    # dedup/count shuffles run once, not once per consumer
    e = e.materialize()
    outdeg = outdeg.materialize()
    st_empty = pd.DataFrame(
        {"src": pd.Series(dtype="string"), "r_od": pd.Series(dtype=np.int64)}
    )
    c_empty = pd.DataFrame(
        {"node": pd.Series(dtype="string"), "c": pd.Series(dtype=np.int64)}
    )
    r_empty = pd.DataFrame(
        {"node": pd.Series(dtype="string"), "pagerank_fp": pd.Series(dtype=np.int64)}
    )

    # r//od is the only per-source quantity an edge needs; keep the
    # state keyed by src as (src, r) and attach od once per iteration
    r_ds = node_ds.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["node"], "pagerank_fp": np.int64(scale)}
        ),
        batch_format="pandas",
    )
    for _ in range(iters):
        share = cogroup_attach(
            outdeg, "src",
            {"src": S, "od": _I64},
            r_ds.map_batches(
                lambda df: df.rename(
                    columns={"node": "n", "pagerank_fp": "r"}
                ),
                batch_format="pandas",
            ),
            "n", {"r": _I64},
            fills={"src": "", "od": -1, "r": -1},
            post=lambda m: pd.DataFrame(
                {
                    "src": m["src"],
                    "r_od": m["r"].to_numpy(np.int64)
                    // m["od"].to_numpy(np.int64),
                }
            )
            if not m.empty else st_empty.copy(),
            empty_out=st_empty,
            key_type=S,
        )
        contribs = cogroup_attach(
            e, "src",
            {"src": S, "dst": S},
            share, "src", {"r_od": _I64},
            fills={"src": "", "dst": "", "r_od": -1},
            post=lambda m: pd.DataFrame(
                {"node": m["dst"], "c": m["r_od"].to_numpy(np.int64)}
            )
            if not m.empty else c_empty.copy(),
            empty_out=c_empty,
            key_type=S,
        )
        sums = grouped_agg(contribs, ["node"], {"c": ("c", "sum")})
        r_ds = cogroup_attach(
            node_ds, "node",
            {"node": S},
            sums.map_batches(
                lambda df: df.rename(columns={"node": "n"}),
                batch_format="pandas",
            ),
            "n", {"c": _I64},
            fills={"node": "", "c": 0},
            post=lambda m: pd.DataFrame(
                {
                    "node": m["node"],
                    "pagerank_fp": base
                    + (
                        damping_num
                        * m["c"].fillna(0).to_numpy(np.int64)
                    )
                    // damping_den,
                }
            )
            if not m.empty else r_empty.copy(),
            empty_out=r_empty,
            key_type=S,
            how="left",
        ).materialize()
    return r_ds


def bfs_depths(
    ds: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    hops: int = 4,
    broadcast_threshold: int = 5_000_000,
) -> ray.data.Dataset:
    """Fixed-hop BFS minimum-depth labels from a deterministic seed (the
    lexicographically smallest node) over a directed edge list —
    ``hops`` rounds of the unit-weight Bellman-Ford recurrence:

        d_0(seed) = 0
        d_k(v)    = min(d_{k-1}(v), 1 + min_{u->v} d_{k-1}(u))

    Depths only tighten, so after ``hops`` rounds every node within
    ``hops`` directed hops of the seed carries its exact BFS depth.
    Integer-only state → bit-exact across engines (the SQL oracle
    unrolls the identical recurrence level by level). Output:
    (node, depth) for REACHED nodes only.

    Node state follows pagerank_fixedpoint's size gate: below
    ``broadcast_threshold`` the depth vector ships per round via
    ``ray.put``; above it every round is cogroup exchanges + a keyed
    min, with no graph-derived driver structure. Reference precedent:
    the reference's neighborhood/path queries over canonical edges
    (cql traversal family) — depth labeling is their bulk form.
    """
    S = pa.string()
    INF = np.int64(1) << np.int64(62)

    def pair_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t[src_col].combine_chunks().cast(S),
                "dst": t[dst_col].combine_chunks().cast(S),
            }
        )

    e = grouped_count(
        ds.map_batches(pair_rows, batch_format="pyarrow"), ["src", "dst"]
    ).select_columns(["src", "dst"])

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                )
            }
        )

    node_ds = grouped_count(
        e.map_batches(endpoints, batch_format="pyarrow"), ["node"]
    ).select_columns(["node"]).materialize()
    n_nodes = node_ds.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], S), "depth": pa.array([], _I64)})
        )

    c_empty = pd.DataFrame(
        {"node": pd.Series(dtype="string"), "d": pd.Series(dtype=np.int64)}
    )

    if n_nodes <= broadcast_threshold:
        nodes_arr = np.sort(node_ds.to_pandas()["node"].to_numpy(dtype=object))
        d = np.full(n_nodes, INF, dtype=np.int64)
        d[0] = 0  # sorted → index 0 IS the lexicographic-min seed
        e = e.materialize()
        static_ref = ray.put(nodes_arr)
        for _ in range(hops):
            ref = ray.put(d)

            def contrib(df: pd.DataFrame) -> pd.DataFrame:
                nodes_ = ray.get(static_ref)
                d_ = ray.get(ref)
                si = np.searchsorted(nodes_, df["src"].to_numpy(dtype=object))
                du = d_[si]
                m = du < INF
                if not m.any():
                    return c_empty.copy()
                out = pd.DataFrame(
                    {"node": df["dst"].to_numpy(dtype=object)[m], "d": du[m] + 1}
                )
                return out.groupby("node", as_index=False)["d"].min()

            mins = grouped_agg(
                e.map_batches(contrib, batch_format="pandas"),
                ["node"], {"d": ("d", "min")},
            ).to_pandas()
            if len(mins):
                idx = np.searchsorted(
                    nodes_arr, mins["node"].to_numpy(dtype=object)
                )
                np.minimum.at(d, idx, mins["d"].to_numpy(np.int64))
        reached = d < INF
        return ray.data.from_pandas(
            pd.DataFrame({"node": nodes_arr[reached], "depth": d[reached]})
        )

    # --- distributed route: depth state stays a dataset ----------------
    e = e.materialize()
    seed = grouped_agg(node_ds, [], {"s": ("node", "min")}).to_pandas()["s"].iloc[0]
    d_ds = ray.data.from_pandas(
        pd.DataFrame({"node": [seed], "d": np.array([0], np.int64)})
    )
    for _ in range(hops):
        contribs = cogroup_attach(
            e, "src",
            {"src": S, "dst": S},
            d_ds.map_batches(
                lambda df: df.rename(columns={"node": "n"}),
                batch_format="pandas",
            ),
            "n", {"d": _I64},
            fills={"src": "", "dst": "", "d": -1},
            post=lambda m: pd.DataFrame(
                {"node": m["dst"], "d": m["d"].to_numpy(np.int64) + 1}
            )
            if not m.empty else c_empty.copy(),
            empty_out=c_empty,
            key_type=S,
        )
        d_ds = grouped_agg(
            d_ds.union(contribs), ["node"], {"d": ("d", "min")}
        ).materialize()
    return d_ds.map_batches(
        lambda df: df.rename(columns={"d": "depth"}), batch_format="pandas"
    )
