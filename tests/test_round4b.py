"""Round-4 continuation: analytic-window / OLAP widening — per-group
top-N, lag interarrival stats, pivot, grouped exact median (bounded
histogram), ROLLUP grouping sets."""

import numpy as np
import pandas as pd
import ray.data as rd

from bioontologykg_ray.pipelines.queries import (
    _interarrival_apply,
    _top_orders_apply,
)
from bioontologykg_ray.stages.agg import grouped_median_discrete


# ---------------------------------------------------------------------------
# grouped exact median (bounded histogram)
# ---------------------------------------------------------------------------

def test_grouped_median_odd_even_and_nulls():
    df = pd.DataFrame(
        {
            "g": ["a"] * 3 + ["b"] * 4 + ["c"] * 2,
            "v": [3.0, 1.0, 2.0,            # odd: median 2
                  10.0, 40.0, 20.0, 30.0,   # even: (20+30)/2 = 25
                  5.0, None],               # null ignored: median 5, n=1
        }
    )
    out = grouped_median_discrete(
        rd.from_pandas(df).repartition(4), ["g"], "v", out_col="m"
    ).sort_values("g").reset_index(drop=True)
    assert out["m"].tolist() == [2.0, 25.0, 5.0]
    assert out["n_vals"].tolist() == [3, 4, 1]


def test_grouped_median_duplicate_values_cross_batch():
    # duplicated values per group must combine across batches before the
    # rank pick (histogram counts, not distinct rows)
    df = pd.DataFrame({"g": ["x"] * 6, "v": [1.0, 1.0, 1.0, 9.0, 9.0, 2.0]})
    out = grouped_median_discrete(rd.from_pandas(df).repartition(6), ["g"], "v")
    # sorted: 1 1 1 2 9 9 -> even n=6 -> (1+2)/2
    assert out["median"].tolist() == [1.5]


def test_grouped_median_empty_input_schema():
    df = pd.DataFrame({"g": pd.Series(dtype=object), "v": pd.Series(dtype=np.float64)})
    out = grouped_median_discrete(rd.from_pandas(df), ["g"], "v")
    assert list(out.columns) == ["g", "median", "n_vals"]
    assert len(out) == 0


# ---------------------------------------------------------------------------
# per-group top-N window (rank emission + deterministic tie-break)
# ---------------------------------------------------------------------------

def test_top_orders_tiebreak_and_singleton():
    df = pd.DataFrame(
        {
            "o_custkey": [1, 1, 1, 2],
            "o_orderkey": [30, 10, 20, 99],
            "o_totalprice": [50.0, 50.0, 40.0, 7.0],
        }
    )
    out = _top_orders_apply(df).reset_index(drop=True)
    # equal price -> lower orderkey ranks first; singleton keeps rank 1 only
    assert out[["o_custkey", "rank", "o_orderkey"]].values.tolist() == [
        [1, 1, 10], [1, 2, 30], [2, 1, 99]]
    assert out["o_totalprice"].tolist() == [50.0, 50.0, 7.0]


# ---------------------------------------------------------------------------
# lag interarrival stats
# ---------------------------------------------------------------------------

def test_interarrival_gaps_and_singleton_null():
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:10",
         "2024-01-01 00:01:10", "2024-03-01 12:00:00"]
    )
    df = pd.DataFrame(
        {"user_id": [7, 7, 7, 8], "event_id": [1, 2, 3, 4], "ts": ts}
    )
    out = _interarrival_apply(df).set_index("user_id")
    assert out.loc[7, "n_events"] == 3
    # gaps: 10s and 60s -> avg 35s, max 60s (µs)
    assert out.loc[7, "avg_gap_us"] == 35_000_000.0
    assert out.loc[7, "max_gap_us"] == 60_000_000.0
    # single-event user: SQL aggregate-over-empty -> NULL
    assert out.loc[8, "n_events"] == 1
    assert np.isnan(out.loc[8, "avg_gap_us"])
    assert np.isnan(out.loc[8, "max_gap_us"])


def test_interarrival_ties_resolved_by_event_id():
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:00", "2024-01-01 00:00:05"]
    )
    df = pd.DataFrame({"user_id": [1, 1, 1], "event_id": [2, 1, 3], "ts": ts})
    out = _interarrival_apply(df)
    # order: (ts0,e1),(ts0,e2),(ts5,e3) -> gaps 0 and 5s
    assert out["max_gap_us"].tolist() == [5_000_000.0]
    assert out["avg_gap_us"].tolist() == [2_500_000.0]


# ---------------------------------------------------------------------------
# pivot + rollup (registry-level, sf0.001 vs DuckDB oracles)
# ---------------------------------------------------------------------------

SF = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("orders", "customer", "nation", "region", "lineitem", "events"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.sql(sql).df()


def test_order_status_pivot_matches_oracle():
    from bioontologykg_ray.pipelines.queries import (
        SQL_ORDER_STATUS_PIVOT,
        q_order_status_pivot,
    )

    got = q_order_status_pivot(SF).sort_values("year").reset_index(drop=True)
    want = _oracle(SQL_ORDER_STATUS_PIVOT).sort_values("year").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    # pivot is exhaustive: statuses partition the rows
    assert (
        got[["n_open", "n_fulfilled", "n_pending"]].to_numpy().sum()
        == _oracle("SELECT count(*) AS n FROM orders")["n"][0]
    )


# ---------------------------------------------------------------------------
# Gopher-rule quality flags
# ---------------------------------------------------------------------------

def test_quality_flags_rules():
    from bioontologykg_ray.pipelines.queries import _quality_flags_batch

    good = ("the and alpha bravo charlie delta echo foxtrot golf hotel "
            "india juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor")  # 24 distinct toks, 2 stopwords
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                good,                       # passes every rule
                "short text only",          # < 20 tokens
                "zzz " * 30,                # 30 toks but all dupes + no stops
                "",                         # empty
            ],
        }
    )
    out = _quality_flags_batch(df).set_index("doc_id")
    assert bool(out.loc[1, "keep"])
    assert not bool(out.loc[2, "flag_word_count"]) and not bool(out.loc[2, "keep"])
    assert not bool(out.loc[3, "flag_stopword"])
    assert not bool(out.loc[3, "flag_dup"])  # dup_ratio 29/30 > 0.6
    assert out.loc[4, "n_tokens"] == 0 and not bool(out.loc[4, "keep"])
    # ratios are exact int/int divisions
    assert out.loc[3, "dup_ratio"] == round(29 / 30, 6)


def test_quality_flags_empty_batch_schema():
    from bioontologykg_ray.pipelines.queries import (
        _QUALITY_FLAGS_EMPTY,
        _quality_flags_batch,
    )

    out = _quality_flags_batch(pd.DataFrame({"doc_id": [], "text": []}))
    assert list(out.columns) == list(_QUALITY_FLAGS_EMPTY.columns)
    assert len(out) == 0


# ---------------------------------------------------------------------------
# int8 embedding quantization + grouped HLL
# ---------------------------------------------------------------------------

def test_embedding_quantize_math(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bioontologykg_ray.pipelines.queries import q_embedding_quantize

    emb = pa.array(
        [[2.54, -1.27, 0.0, 1.0], [0.0, 0.0, 0.0, 0.0]],
        type=pa.list_(pa.float32()),
    )
    pq.write_table(
        pa.table({"vec_id": pa.array([1, 2], pa.int64()), "embedding": emb}),
        str(tmp_path / "embeddings.parquet"),
    )
    out = (
        q_embedding_quantize(str(tmp_path))
        .to_pandas().set_index("vec_id").sort_index()
    )
    # scale = 2.54/127 = 0.02; q = trunc([127, -63.5, 0, 50]) (float32 ulps
    # may land one off the real-arithmetic value — recompute exactly)
    s = np.float64(np.float32(2.54)) / 127.0
    q = np.trunc(np.array(
        [np.float64(np.float32(v)) for v in (2.54, -1.27, 0.0, 1.0)]) / s)
    assert out.loc[1, "scale"] == s
    assert out.loc[1, "q_sum"] == int(q.sum())
    assert out.loc[1, "q_l1"] == int(np.abs(q).sum())
    assert out.loc[1, "n_sat"] == int((np.abs(q) == 127).sum())
    # zero vector: scale 0, all-zero quantized row
    assert out.loc[2, "scale"] == 0.0
    assert out.loc[2, "q_sum"] == 0 and out.loc[2, "q_l1"] == 0
    assert out.loc[2, "n_sat"] == 0


def test_hll_registers_by_matches_per_group_global():
    from bioontologykg_ray.stages.sketch import (
        hll_estimate,
        hll_registers,
        hll_registers_by,
    )

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "event_type": np.where(rng.random(4000) < 0.5, "a", "b"),
            "user_id": rng.integers(0, 800, 4000),
        }
    )
    got = hll_registers_by(
        rd.from_pandas(df).repartition(5), "event_type", "user_id", p=10
    ).to_pandas()
    for g, sub in df.groupby("event_type"):
        solo = hll_registers(
            rd.from_pandas(sub.reset_index(drop=True)), "user_id", p=10
        ).to_pandas().sort_values("bucket").reset_index(drop=True)
        mine = (
            got[got["event_type"] == g][["bucket", "rho"]]
            .sort_values("bucket").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(mine, solo)
        est = hll_estimate(mine, p=10)
        exact = sub["user_id"].nunique()
        assert abs(est - exact) / exact < 0.15  # ~3σ at p=10


# ---------------------------------------------------------------------------
# edit-distance-1 similarity self-join (FastSS deletion blocking)
# ---------------------------------------------------------------------------

def _lev_dp(a: str, b: str) -> int:
    """Independent reference: full DP levenshtein."""
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def test_edit1_pairs_matches_bruteforce():
    from bioontologykg_ray.stages.neardup import edit1_pairs

    rng = np.random.default_rng(11)
    alphabet = list("abc")
    strs = [
        "".join(rng.choice(alphabet, size=rng.integers(1, 6)))
        for _ in range(150)
    ] + ["", "a"]  # include empty and single-char edge cases
    df = pd.DataFrame({"s": strs})
    got = edit1_pairs(rd.from_pandas(df).repartition(5), "s").to_pandas()
    got_set = set(zip(got["name_a"], got["name_b"]))
    uniq = sorted(set(strs))
    want = {
        (a, b)
        for i, a in enumerate(uniq)
        for b in uniq[i + 1:]
        if _lev_dp(a, b) <= 1
    }
    assert got_set == want
    assert len(want) > 10  # the fixture actually exercises the operator


def test_edit1_pairs_bucket_cap_documented_approximation():
    from bioontologykg_ray.stages.neardup import edit1_pairs

    df = pd.DataFrame({"s": ["ab", "ac", "ad"]})  # all share deletion key "a"
    exact = edit1_pairs(rd.from_pandas(df), "s").to_pandas()
    assert len(exact) == 3
    capped = edit1_pairs(rd.from_pandas(df), "s", max_bucket=1).to_pandas()
    assert len(capped) < 3  # cap skips the hot bucket -> approximate


def test_lev_le1_agrees_with_dp():
    from bioontologykg_ray.stages.neardup import _lev_le1

    rng = np.random.default_rng(3)
    alphabet = list("ab")
    for _ in range(500):
        a = "".join(rng.choice(alphabet, size=rng.integers(0, 5)))
        b = "".join(rng.choice(alphabet, size=rng.integers(0, 5)))
        assert _lev_le1(a, b) == (_lev_dp(a, b) <= 1), (a, b)


def test_customer_rollup_levels_consistent():
    from bioontologykg_ray.pipelines.queries import q_customer_rollup

    out = q_customer_rollup(SF)
    fine = out[out["n_name"].notna()]
    subs = out[out["n_name"].isna() & out["r_name"].notna()]
    total = out[out["r_name"].isna()]
    assert len(total) == 1
    assert int(total["n"].iloc[0]) == int(fine["n"].sum())
    merged = fine.groupby("r_name")["n"].sum().sort_index()
    assert merged.tolist() == subs.sort_values("r_name")["n"].tolist()
