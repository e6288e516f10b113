"""Round-4 continuation (c): ordered string_agg paths, frame-bounded
moving average, sequential funnel, Efraimidis-Spirakis weighted
sampling."""

import numpy as np
import pandas as pd

from bioontologykg_ray.pipelines.queries import (
    _event_paths_apply,
    _funnel_apply,
    _moving_avg_apply,
    _wsample_local_top,
    _WSAMPLE_K,
)


def _ev(rows):
    df = pd.DataFrame(
        rows, columns=["user_id", "event_id", "ts", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"])
    return df


# ---------------------------------------------------------------------------
# ordered event paths (string_agg ORDER BY)
# ---------------------------------------------------------------------------

def test_event_paths_order_and_tiebreak():
    df = _ev(
        [
            (1, 5, "2024-01-01 00:02", "purchase", 1.0),
            (1, 2, "2024-01-01 00:01", "click", 1.0),
            # same ts -> event_id breaks the tie (3 before 4)
            (1, 4, "2024-01-01 00:00", "view", 1.0),
            (1, 3, "2024-01-01 00:00", "signup", 1.0),
            (2, 9, "2024-01-01 00:00", "error", 1.0),
        ]
    )
    out = _event_paths_apply(df).sort_values("user_id").reset_index(drop=True)
    assert out["path"].tolist() == ["signup>view>click>purchase", "error"]
    assert out["n_events"].tolist() == [4, 1]


def test_event_paths_empty_schema():
    out = _event_paths_apply(_ev([]))
    assert list(out.columns) == ["user_id", "path", "n_events"]
    assert len(out) == 0


# ---------------------------------------------------------------------------
# frame-bounded moving average (ROWS 3 PRECEDING..CURRENT)
# ---------------------------------------------------------------------------

def test_moving_avg_frame_and_user_boundary():
    df = _ev(
        [
            (1, 1, "2024-01-01 00:00", "view", 1.00),
            (1, 2, "2024-01-01 00:01", "view", 2.00),
            (1, 3, "2024-01-01 00:02", "view", 3.00),
            (1, 4, "2024-01-01 00:03", "view", 4.00),
            (1, 5, "2024-01-01 00:04", "view", 5.00),  # frame = 2,3,4,5
            (2, 6, "2024-01-01 00:00", "view", 10.00),  # new user resets
        ]
    )
    out = _moving_avg_apply(df)
    assert out["mov_avg"].tolist() == [1.0, 1.5, 2.0, 2.5, 3.5, 10.0]


def test_moving_avg_null_skipped_not_counted():
    df = _ev(
        [
            (1, 1, "2024-01-01 00:00", "view", np.nan),
            (1, 2, "2024-01-01 00:01", "view", 3.00),
            (1, 3, "2024-01-01 00:02", "view", np.nan),
        ]
    )
    out = _moving_avg_apply(df)
    # row1: all-null frame -> NULL; row2: avg(3)=3; row3: avg(3)=3
    assert np.isnan(out["mov_avg"].iloc[0])
    assert out["mov_avg"].tolist()[1:] == [3.0, 3.0]


def test_moving_avg_cent_exactness():
    # 6.55 + 0.01 style sums that are inexact in binary must still match
    # the integer-cent path: avg(6.55, 0.01) = 656/2/100 = 3.28
    df = _ev(
        [
            (1, 1, "2024-01-01 00:00", "view", 6.55),
            (1, 2, "2024-01-01 00:01", "view", 0.01),
        ]
    )
    out = _moving_avg_apply(df)
    assert out["mov_avg"].iloc[1] == 3.28


# ---------------------------------------------------------------------------
# sequential funnel
# ---------------------------------------------------------------------------

def test_funnel_strictly_after_semantics():
    df = _ev(
        [
            # user 1: full funnel in order
            (1, 1, "2024-01-01 00:00", "signup", 0.0),
            (1, 2, "2024-01-01 00:01", "click", 0.0),
            (1, 3, "2024-01-01 00:02", "purchase", 0.0),
            # user 2: click BEFORE signup and purchase AT click-less time
            (2, 4, "2024-01-01 00:01", "click", 0.0),
            (2, 5, "2024-01-01 00:02", "signup", 0.0),
            (2, 6, "2024-01-01 00:03", "purchase", 0.0),
            # user 3: click at SAME ts as signup (not strictly after)
            (3, 7, "2024-01-01 00:00", "signup", 0.0),
            (3, 8, "2024-01-01 00:00", "click", 0.0),
        ]
    )
    out = _funnel_apply(df)
    assert out.iloc[0].tolist() == [3, 1, 1]


def test_funnel_empty_schema():
    out = _funnel_apply(_ev([]))
    assert list(out.columns) == ["n_signup", "n_click_after", "n_purchase_after"]


# ---------------------------------------------------------------------------
# weighted sampling (Efraimidis-Spirakis keys)
# ---------------------------------------------------------------------------

def test_wsample_local_top_is_superset_property():
    # global top-K from the full frame == merge of per-half local top-Ks
    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, 401, dtype=np.int64),
            "o_totalprice": rng.uniform(100, 10000, 400).round(2),
        }
    )
    full = _wsample_local_top(df)
    halves = pd.concat(
        [_wsample_local_top(df.iloc[:200]), _wsample_local_top(df.iloc[200:])]
    )
    merged = (
        halves.sort_values(["es_key", "o_orderkey"], kind="mergesort")
        .head(_WSAMPLE_K)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(full.reset_index(drop=True), merged)


def test_wsample_weight_bias():
    # a weight 1000x larger must win essentially always: make one row
    # hugely heavy and check it is sampled first
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, 51, dtype=np.int64),
            "o_totalprice": [1.0] * 49 + [1e9],
        }
    )
    out = _wsample_local_top(df)
    assert out.iloc[0]["o_orderkey"] == 50


def test_wsample_deterministic():
    df = pd.DataFrame(
        {"o_orderkey": [7, 8, 9], "o_totalprice": [10.0, 20.0, 30.0]}
    )
    a = _wsample_local_top(df)
    b = _wsample_local_top(df.sample(frac=1.0, random_state=1))
    pd.testing.assert_frame_equal(
        a.sort_values("o_orderkey").reset_index(drop=True),
        b.sort_values("o_orderkey").reset_index(drop=True),
    )


# ---------------------------------------------------------------------------
# BM25 scan kernel
# ---------------------------------------------------------------------------

def test_bm25_scan_tf_and_stats_rows():
    from bioontologykg_ray.pipelines.queries import _bm25_scan_batch

    df = pd.DataFrame(
        {
            "doc_id": [10, 11, 12],
            "text": ["spark spark merge", "no match here", ""],
        }
    )
    out = _bm25_scan_batch(df)
    stat = out[out["doc_id"] == -1]
    assert stat["tf"].tolist() == [3]          # batch doc count
    assert stat["dl"].tolist() == [6]          # 3 + 3 + 0 tokens
    tf = out[out["doc_id"] >= 0].sort_values(["doc_id", "term"])
    assert list(zip(tf["doc_id"], tf["term"], tf["tf"], tf["dl"])) == [
        (10, "merge", 1, 3),
        (10, "spark", 2, 3),
    ]


def test_bm25_scan_empty_docs_alignment():
    from bioontologykg_ray.pipelines.queries import _bm25_scan_batch

    # empty/None texts must not shift the doc_id alignment of later rows
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["", None, "scan"]})
    out = _bm25_scan_batch(df)
    tf = out[out["doc_id"] >= 0]
    assert tf["doc_id"].tolist() == [3] and tf["term"].tolist() == ["scan"]


# ---------------------------------------------------------------------------
# BFS depth labeling (both routes)
# ---------------------------------------------------------------------------

def _bfs_ref(edges, hops=4):
    # driver-side reference: unit Bellman-Ford from the min node
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    INF = float("inf")
    d = {n: INF for n in nodes}
    d[nodes[0]] = 0
    for _ in range(hops):
        for u, v in edges:
            if d[u] + 1 < d[v]:
                d[v] = d[u] + 1
    return {n: int(x) for n, x in d.items() if x < INF}


def _bfs_edges_df(edges):
    return pd.DataFrame(
        {"src": [u for u, _ in edges], "dst": [v for _, v in edges]}
    )


_BFS_EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
    ("a", "c"),              # shortcut: c at depth 1, d at 2, e at 3
    ("x", "y"),              # unreachable from 'a'
    ("e", "a"),              # cycle back
    ("b", "b"),              # self-loop must not loop forever
]


def test_bfs_depths_broadcast_route():
    import ray.data as rd
    from bioontologykg_ray.stages.graph import bfs_depths

    out = bfs_depths(rd.from_pandas(_bfs_edges_df(_BFS_EDGES))).to_pandas()
    got = dict(zip(out["node"], out["depth"]))
    assert got == _bfs_ref(_BFS_EDGES)
    assert "x" not in got and "y" not in got


def test_bfs_depths_distributed_route_identical():
    import ray.data as rd
    from bioontologykg_ray.stages.graph import bfs_depths

    a = bfs_depths(rd.from_pandas(_bfs_edges_df(_BFS_EDGES))).to_pandas()
    b = bfs_depths(
        rd.from_pandas(_bfs_edges_df(_BFS_EDGES)), broadcast_threshold=0
    ).to_pandas()
    a = a.sort_values("node").reset_index(drop=True)
    b = b.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_bfs_depths_hop_bound():
    import ray.data as rd
    from bioontologykg_ray.stages.graph import bfs_depths

    chain = [(chr(97 + i), chr(98 + i)) for i in range(6)]  # a->b->...->g
    out = bfs_depths(rd.from_pandas(_bfs_edges_df(chain)), hops=3).to_pandas()
    got = dict(zip(out["node"], out["depth"]))
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}  # e,f,g beyond 3 hops


def test_bfs_depths_empty():
    import ray.data as rd
    from bioontologykg_ray.stages.graph import bfs_depths

    df = pd.DataFrame({"src": pd.Series(dtype=object), "dst": pd.Series(dtype=object)})
    out = bfs_depths(rd.from_pandas(df))
    # Ray to_pandas drops schema on 0-row datasets; check the Dataset
    assert out.count() == 0
    assert out.schema().names == ["node", "depth"]


# ---------------------------------------------------------------------------
# reciprocal-rank fusion
# ---------------------------------------------------------------------------

def test_rrf_fusion_values_and_membership():
    from bioontologykg_ray.pipelines.queries import q_rrf_fusion, _RRF_K0

    out = q_rrf_fusion("/root/testdata/sf0.001")
    # every row carries at least one system rank; docs in both systems
    # score the sum of both reciprocal terms
    assert ((out["rank_bm25"] > 0) | (out["rank_cos"] > 0)).all()
    both = out[(out["rank_bm25"] > 0) & (out["rank_cos"] > 0)]
    if len(both):
        row = both.iloc[0]
        expect = 1.0 / (_RRF_K0 + row["rank_bm25"]) + 1.0 / (
            _RRF_K0 + row["rank_cos"]
        )
        assert abs(row["rrf"] - expect) < 1e-9
    # rank sets are exactly 1..top for each system
    rb = sorted(out.loc[out["rank_bm25"] > 0, "rank_bm25"])
    assert rb == list(range(1, len(rb) + 1))
    rc = sorted(out.loc[out["rank_cos"] > 0, "rank_cos"])
    assert rc == list(range(1, len(rc) + 1))


# ---------------------------------------------------------------------------
# interpolated quantiles + winsorized stats
# ---------------------------------------------------------------------------

def test_quantiles_cont_matches_numpy():
    import ray.data as rd
    from bioontologykg_ray.stages.agg import quantiles_cont

    rng = np.random.RandomState(5)
    v = rng.uniform(0, 100, 500).round(2)
    df = pd.DataFrame({"v": v})
    qs = [0.05, 0.33, 0.5, 0.9]
    out = quantiles_cont(rd.from_pandas(df).repartition(7), "v", qs)
    expect = np.quantile(v, qs, method="linear")
    assert np.allclose(out["value"].to_numpy(), expect, atol=1e-9)


def test_quantiles_cont_nulls_and_duplicates():
    import ray.data as rd
    from bioontologykg_ray.stages.agg import quantiles_cont

    df = pd.DataFrame({"v": [1.0, 1.0, 2.0, None, 2.0]})  # multiset 1,1,2,2
    out = quantiles_cont(rd.from_pandas(df), "v", [0.5])
    # p = 0.5*3 = 1.5 -> between ranks 2 (1.0) and 3 (2.0) -> 1.5
    assert out["value"].tolist() == [1.5]


def test_winsorized_stats_clip_semantics():
    from bioontologykg_ray.pipelines.queries import _winsorize_partial

    df = pd.DataFrame(
        {
            "event_type": ["a", "a", "a", "b"],
            "value": [0.50, 2.00, 9.99, None],
        }
    )
    p = _winsorize_partial(100, 500)  # clip to [1.00, 5.00]
    out = p(df).set_index("event_type")
    # a: 0.50->1.00, 2.00, 9.99->5.00 => cents 100+200+500 = 800
    assert out.loc["a", "s"] == 800
    assert out.loc["a", "n"] == 3
    assert out.loc["a", "n_lo"] == 1 and out.loc["a", "n_hi"] == 1
    assert "b" not in out.index  # all-null group contributes nothing


# ---------------------------------------------------------------------------
# sweep-line concurrency + cross-doc duplicated-gram fraction
# ---------------------------------------------------------------------------

def test_dupgram_pairs_window_and_doc_boundary():
    from bioontologykg_ray.pipelines.queries import _dupgram_pairs_batch

    # doc 1 has exactly 9 tokens -> two 8-gram positions; doc 2 has 8
    # -> one; the window must never span the doc boundary
    t1 = "a b c d e f g h i"
    t2 = "a b c d e f g h"
    out = _dupgram_pairs_batch(pd.DataFrame({"doc_id": [1, 2], "text": [t1, t2]}))
    got = set(zip(out["doc_id"], out["gram"]))
    assert got == {
        (1, "a b c d e f g h"),
        (1, "b c d e f g h i"),
        (2, "a b c d e f g h"),
    }


def test_dupgram_pairs_distinct_within_doc():
    from bioontologykg_ray.pipelines.queries import _dupgram_pairs_batch

    # the same 8-gram occurring twice in one doc emits ONE pair
    text = "x y z w a b c d " * 2 + "x y z w a b c d"
    out = _dupgram_pairs_batch(pd.DataFrame({"doc_id": [7], "text": [text]}))
    assert out["gram"].is_unique


def test_dupgram_short_docs_skipped():
    from bioontologykg_ray.pipelines.queries import _dupgram_pairs_batch

    out = _dupgram_pairs_batch(
        pd.DataFrame({"doc_id": [1, 2], "text": ["only three words", ""]})
    )
    assert len(out) == 0


def test_peak_concurrency_reference():
    import duckdb
    from bioontologykg_ray.pipelines.queries import q_peak_concurrent_users

    out = q_peak_concurrent_users("/root/testdata/sf0.001")
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    # independent reference: count active users at every event boundary
    ref = con.sql(
        """
        WITH iv AS (SELECT user_id, min(epoch_us(ts)) s, max(epoch_us(ts)) e
                    FROM events GROUP BY user_id)
        SELECT max(c) FROM (
          SELECT (SELECT count(*) FROM iv b WHERE b.s <= a.s AND a.s <= b.e) AS c
          FROM iv a)
        """
    ).fetchone()[0]
    assert out["peak_concurrent"].iloc[0] == ref


# ---------------------------------------------------------------------------
# decorrelated subquery + transition matrix kernels
# ---------------------------------------------------------------------------

def test_transition_apply_pairs_and_boundaries():
    from bioontologykg_ray.pipelines.queries import _transition_apply

    df = _ev(
        [
            (1, 1, "2024-01-01 00:00", "signup", 0.0),
            (1, 2, "2024-01-01 00:01", "click", 0.0),
            (1, 3, "2024-01-01 00:02", "click", 0.0),
            (2, 4, "2024-01-01 00:00", "purchase", 0.0),  # no pair alone
        ]
    )
    out = _transition_apply(df).set_index(["from_type", "to_type"])["n"]
    assert out.to_dict() == {("signup", "click"): 1, ("click", "click"): 1}


def test_transition_apply_empty():
    from bioontologykg_ray.pipelines.queries import _transition_apply

    out = _transition_apply(_ev([]))
    assert list(out.columns) == ["from_type", "to_type", "n"] and len(out) == 0


# ---------------------------------------------------------------------------
# two-pass heavy hitters + cohort retention kernels
# ---------------------------------------------------------------------------

def test_freqgram_candidates_superset_and_total():
    from bioontologykg_ray.pipelines.queries import (
        _FREQGRAM_K,
        _freqgram_candidates,
        _freqgram_windows,
    )

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b c d a b c", "a b c x", "z z"],  # 'a b c' x3
        }
    )
    grams = _freqgram_windows(df)
    # windows never cross doc boundaries: doc3 has no trigram
    assert len(grams) == 5 + 2 and "c a b" not in set(grams[:4])
    out = _freqgram_candidates(df)
    total = out[out["gram"].isna()]
    assert total["cnt"].iloc[0] == 7
    cand = set(out["gram"].dropna())
    # every global heavy hitter must be a pass-1 survivor
    vc = pd.Series(grams).value_counts()
    heavy = set(vc[vc * _FREQGRAM_K > len(grams)].index)
    assert heavy <= cand


def test_freqgram_windows_empty_and_short():
    from bioontologykg_ray.pipelines.queries import _freqgram_windows

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["", "one two"]})
    assert len(_freqgram_windows(df)) == 0


def test_cohort_apply_offsets():
    from bioontologykg_ray.pipelines.queries import _cohort_apply

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                [
                    "2024-01-03 08:00",
                    "2024-01-03 23:00",  # same day -> one distinct row
                    "2024-01-05 01:00",
                    "2024-01-04 00:00",
                ]
            ),
        }
    )
    out = _cohort_apply(df).set_index(["cohort_day", "day_offset"])["n_users"]
    assert out.to_dict() == {
        ("2024-01-03", 0): 1,
        ("2024-01-03", 2): 1,
        ("2024-01-04", 0): 1,
    }
