"""Round-4 continuation (e): RANGE-frame trailing window and the
distributed Shannon-entropy decomposition."""

import numpy as np
import pandas as pd

from bioontologykg_ray.pipelines.queries import (
    _TRAIL7_EMPTY,
    _entropy_partials,
    _trailing_7d_apply,
)


def _ev(event_ids, users, ts):
    return pd.DataFrame(
        {
            "event_id": np.asarray(event_ids, np.int64),
            "user_id": np.asarray(users, np.int64),
            "ts": pd.to_datetime(ts),
        }
    )


# ---------------------------------------------------------------------------
# RANGE-frame trailing 7-day count
# ---------------------------------------------------------------------------

def test_trailing_7d_counts_within_window():
    df = _ev(
        [1, 2, 3, 4],
        [7, 7, 7, 7],
        ["2024-01-01", "2024-01-05", "2024-01-08", "2024-01-20"],
    )
    out = _trailing_7d_apply(df).set_index("event_id")["n_trailing_7d"]
    # Jan 1: itself.  Jan 5: Jan 1 + itself.  Jan 8: Jan 1 is exactly
    # 7 days back (inclusive) -> all three.  Jan 20: window empty but self.
    assert out.loc[1] == 1
    assert out.loc[2] == 2
    assert out.loc[3] == 3
    assert out.loc[4] == 1


def test_trailing_7d_is_range_not_rows():
    # ts peers (equal timestamps) must all share the SAME count — the
    # defining difference between a RANGE and a ROWS frame.
    df = _ev([1, 2, 3], [5, 5, 5], ["2024-03-01 12:00"] * 3)
    out = _trailing_7d_apply(df)
    assert out["n_trailing_7d"].tolist() == [3, 3, 3]


def test_trailing_7d_partitions_by_user():
    df = _ev([1, 2], [1, 2], ["2024-01-01", "2024-01-02"])
    out = _trailing_7d_apply(df)
    assert out["n_trailing_7d"].tolist() == [1, 1]


def test_trailing_7d_empty_keeps_schema():
    out = _trailing_7d_apply(_TRAIL7_EMPTY.assign(user_id=[], ts=[]).iloc[:0])
    assert list(out.columns) == ["event_id", "n_trailing_7d"]
    assert len(out) == 0


def test_trailing_7d_exclusive_beyond_seven_days():
    # 7 days + 1 microsecond is outside the frame.
    df = _ev(
        [1, 2],
        [9, 9],
        ["2024-01-01 00:00:00.000001", "2024-01-08 00:00:00.000002"],
    )
    out = _trailing_7d_apply(df).set_index("event_id")["n_trailing_7d"]
    assert out.loc[2] == 1


# ---------------------------------------------------------------------------
# entropy decomposition H = log2(n) - sum(c*log2 c)/n
# ---------------------------------------------------------------------------

def test_entropy_partials_clog():
    df = pd.DataFrame({"user_id": [1, 1], "c": [1, 4]})
    out = _entropy_partials(df)
    assert out["clog"].tolist() == [0.0, 8.0]  # 1*log2(1)=0, 4*log2(4)=8


def test_entropy_decomposition_matches_direct():
    # uniform over 4 types -> exactly 2 bits; single type -> 0 bits
    counts = np.array([3, 3, 3, 3], np.float64)
    n, s = counts.sum(), (counts * np.log2(counts)).sum()
    assert np.isclose(np.log2(n) - s / n, 2.0)
    counts = np.array([17], np.float64)
    n, s = counts.sum(), (counts * np.log2(counts)).sum()
    assert np.isclose(np.log2(n) - s / n, 0.0)


# ---------------------------------------------------------------------------
# Pareto skyline kernel (used per-block AND for the driver merge)
# ---------------------------------------------------------------------------

def _parts(keys, prices, sizes):
    return pd.DataFrame(
        {
            "p_partkey": np.asarray(keys, np.int64),
            "p_retailprice": np.asarray(prices, np.float64),
            "p_size": np.asarray(sizes, np.int64),
        }
    )


def test_skyline_drops_dominated():
    from bioontologykg_ray.pipelines.queries import _pareto_skyline

    # (10, 5) dominates (11, 6); (9, 9) and (10, 5) are incomparable
    df = _parts([1, 2, 3], [10.0, 11.0, 9.0], [5, 6, 9])
    out = _pareto_skyline(df)
    assert sorted(out["p_partkey"]) == [1, 3]


def test_skyline_keeps_exact_duplicates():
    from bioontologykg_ray.pipelines.queries import _pareto_skyline

    # identical points do not dominate each other (no strict axis)
    df = _parts([1, 2], [10.0, 10.0], [5, 5])
    assert sorted(_pareto_skyline(df)["p_partkey"]) == [1, 2]


def test_skyline_equal_price_strict_size():
    from bioontologykg_ray.pipelines.queries import _pareto_skyline

    # same price, smaller size dominates
    df = _parts([1, 2], [10.0, 10.0], [5, 6])
    assert _pareto_skyline(df)["p_partkey"].tolist() == [1]


def test_skyline_closure_under_union():
    from bioontologykg_ray.pipelines.queries import _pareto_skyline

    # global skyline == skyline(union of block skylines) for any split
    rng = np.random.RandomState(7)
    df = _parts(
        np.arange(200), rng.randint(1, 40, 200).astype(float), rng.randint(1, 40, 200)
    )
    direct = _pareto_skyline(df)["p_partkey"].tolist()
    blocks = [df.iloc[i::3] for i in range(3)]
    cand = pd.concat([_pareto_skyline(b) for b in blocks])
    merged = _pareto_skyline(cand)["p_partkey"].tolist()
    assert sorted(direct) == sorted(merged)


# ---------------------------------------------------------------------------
# banded range-join probe
# ---------------------------------------------------------------------------

def test_band_partials_edges_inclusive_lo_exclusive_hi():
    from bioontologykg_ray.pipelines.queries import _band_partials

    df = pd.DataFrame({"o_totalprice": [0.0, 49999.99, 50000.0, 350000.0, 999999.0]})
    out = _band_partials(df).set_index("band_idx")
    assert out.loc[0, "n_orders"] == 2      # [0, 50k)
    assert out.loc[1, "n_orders"] == 1      # 50000.0 lands in band_2
    assert out.loc[4, "n_orders"] == 2      # open-ended top band


def test_band_partials_exact_cent_sums():
    from bioontologykg_ray.pipelines.queries import _band_partials

    df = pd.DataFrame({"o_totalprice": [10.01, 20.02]})
    out = _band_partials(df)
    assert out["sum_cents"].tolist() == [3003]


# ---------------------------------------------------------------------------
# gaps-and-islands longest streak
# ---------------------------------------------------------------------------

def _streak_days(users, ts):
    from bioontologykg_ray.pipelines.queries import _event_days

    return _event_days(
        pd.DataFrame(
            {"user_id": np.asarray(users, np.int64), "ts": pd.to_datetime(ts)}
        ),
        keep_user=True,
    )


def test_streak_counts_consecutive_days():
    from bioontologykg_ray.pipelines.queries import _streak_apply

    df = _streak_days(
        [7, 7, 7, 7, 7],
        ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-10", "2024-01-11"],
    )
    out = _streak_apply(df)
    assert out.set_index("user_id").loc[7, "longest_streak"] == 3


def test_streak_same_day_events_collapse():
    from bioontologykg_ray.pipelines.queries import _streak_apply

    # same-day duplicates survive the per-block dedup only across block
    # fragments; the apply re-dedups them
    df = _streak_days(
        [9, 9, 9],
        ["2024-01-01 08:00", "2024-01-01 20:00", "2024-01-02 00:00"],
    )
    out = _streak_apply(df)
    assert out.set_index("user_id").loc[9, "longest_streak"] == 2


def test_streak_multiple_users_independent():
    from bioontologykg_ray.pipelines.queries import _streak_apply

    df = _streak_days([1, 2, 2], ["2024-01-01", "2024-01-05", "2024-01-06"])
    out = _streak_apply(df).set_index("user_id")["longest_streak"]
    assert out.loc[1] == 1 and out.loc[2] == 2


# ---------------------------------------------------------------------------
# arg_max latest event per user
# ---------------------------------------------------------------------------

def test_latest_event_tie_breaks_on_event_id():
    from bioontologykg_ray.pipelines.queries import _latest_apply

    df = _ev([3, 5, 4], [1, 1, 1], ["2024-01-02"] * 3)
    df["event_type"] = ["a", "b", "c"]
    df["value"] = [1.0, 2.0, 3.0]
    out = _latest_apply(df)
    # equal ts -> max event_id wins
    assert out["event_id"].tolist() == [5]
    assert out["event_type"].tolist() == ["b"]


def test_latest_event_picks_max_ts_per_user():
    from bioontologykg_ray.pipelines.queries import _latest_apply

    df = _ev([1, 2, 3], [1, 1, 2], ["2024-01-01", "2024-02-01", "2024-01-15"])
    df["event_type"] = ["x", "y", "z"]
    df["value"] = [0.0, 0.0, 0.0]
    out = _latest_apply(df).set_index("user_id")
    assert out.loc[1, "event_id"] == 2
    assert out.loc[2, "event_id"] == 3


# ---------------------------------------------------------------------------
# corr/regr_slope sufficient statistics
# ---------------------------------------------------------------------------

def test_corr_partials_additive():
    from bioontologykg_ray.pipelines.queries import _corr_partials

    df = pd.DataFrame(
        {
            "l_returnflag": ["A", "A", "B"],
            "l_quantity": [1.0, 2.0, 3.0],
            "l_extendedprice": [10.0, 20.0, 30.0],
        }
    )
    whole = _corr_partials(df).set_index("l_returnflag")
    halves = pd.concat([_corr_partials(df.iloc[:1]), _corr_partials(df.iloc[1:])])
    merged = halves.groupby("l_returnflag").sum()
    pd.testing.assert_frame_equal(whole.sort_index(), merged.sort_index())


def test_corr_perfect_linear_relation():
    from bioontologykg_ray.pipelines.queries import _corr_partials
    import numpy as np

    df = pd.DataFrame(
        {
            "l_returnflag": ["A"] * 4,
            "l_quantity": [1.0, 2.0, 3.0, 4.0],
            "l_extendedprice": [5.0, 10.0, 15.0, 20.0],  # y = 5x
        }
    )
    g = _corr_partials(df).iloc[0]
    n, sx, sy, sxy, sxx, syy = g["n"], g["sx"], g["sy"], g["sxy"], g["sxx"], g["syy"]
    cov, varx, vary = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    assert np.isclose(cov / np.sqrt(varx * vary), 1.0)
    assert np.isclose(cov / varx, 5.0)


# ---------------------------------------------------------------------------
# set-intersection flags
# ---------------------------------------------------------------------------

def test_intersect_flags_one_hot():
    from bioontologykg_ray.pipelines.queries import _intersect_flags

    df = pd.DataFrame(
        {"user_id": [1, 1, 2], "event_type": ["signup", "error", "signup"]}
    )
    out = _intersect_flags(df)
    assert out["has_signup"].tolist() == [1, 0, 1]
    assert out["has_error"].tolist() == [0, 1, 0]


# ---------------------------------------------------------------------------
# rank-family windows (NTILE / PERCENT_RANK / CUME_DIST)
# ---------------------------------------------------------------------------

def _orders(custs, keys, prices):
    return pd.DataFrame(
        {
            "o_custkey": np.asarray(custs, np.int64),
            "o_orderkey": np.asarray(keys, np.int64),
            "o_totalprice": np.asarray(prices, np.float64),
        }
    )


def test_ntile_uneven_groups_front_loaded():
    from bioontologykg_ray.pipelines.queries import _order_positions_apply

    # 6 rows, 4 tiles -> sizes 2,2,1,1
    df = _orders([1] * 6, range(1, 7), [10, 20, 30, 40, 50, 60])
    out = _order_positions_apply(df).sort_values("o_orderkey")
    assert out["ntile4"].tolist() == [1, 1, 2, 2, 3, 4]


def test_ntile_fewer_rows_than_tiles():
    from bioontologykg_ray.pipelines.queries import _order_positions_apply

    df = _orders([1, 1], [1, 2], [10.0, 20.0])
    out = _order_positions_apply(df).sort_values("o_orderkey")
    assert out["ntile4"].tolist() == [1, 2]


def test_percent_rank_and_cume_dist_tie_semantics():
    from bioontologykg_ray.pipelines.queries import _order_positions_apply

    # prices 10,10,20: PERCENT_RANK uses min-rank -> 0,0,1;
    # CUME_DIST uses max-rank -> 2/3, 2/3, 1
    df = _orders([1, 1, 1], [1, 2, 3], [10.0, 10.0, 20.0])
    out = _order_positions_apply(df).sort_values("o_orderkey")
    assert out["prank"].tolist() == [0.0, 0.0, 1.0]
    assert out["cdist"].round(6).tolist() == [0.666667, 0.666667, 1.0]


def test_single_row_group_percent_rank_zero():
    from bioontologykg_ray.pipelines.queries import _order_positions_apply

    out = _order_positions_apply(_orders([1], [1], [10.0]))
    assert out["prank"].tolist() == [0.0]
    assert out["cdist"].tolist() == [1.0]


# ---------------------------------------------------------------------------
# per-group mode
# ---------------------------------------------------------------------------

def test_modal_tie_breaks_lexicographically():
    from bioontologykg_ray.pipelines.queries import _modal_apply

    df = pd.DataFrame(
        {"user_id": [1, 1], "event_type": ["view", "click"], "c": [3, 3]}
    )
    out = _modal_apply(df)
    assert out["modal_type"].tolist() == ["click"]
    assert out["n"].tolist() == [3]


def test_modal_picks_highest_count():
    from bioontologykg_ray.pipelines.queries import _modal_apply

    df = pd.DataFrame(
        {"user_id": [1, 1, 2], "event_type": ["a", "b", "z"], "c": [2, 5, 1]}
    )
    out = _modal_apply(df).set_index("user_id")
    assert out.loc[1, "modal_type"] == "b"
    assert out.loc[2, "modal_type"] == "z"


# ---------------------------------------------------------------------------
# market-basket pair expansion
# ---------------------------------------------------------------------------

def test_type_pairs_unordered_and_within_user():
    from bioontologykg_ray.pipelines.queries import _type_pairs_apply

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "event_type": ["view", "click", "buy", "view"],
            "c": [3, 1, 1, 2],
        }
    )
    out = _type_pairs_apply(df)
    pairs = set(zip(out["type_a"], out["type_b"]))
    # 3 types for user 1 -> 3 pairs, each lexicographically ordered;
    # user 2 has one type -> no pairs
    assert pairs == {("buy", "click"), ("buy", "view"), ("click", "view")}
    assert (out["user_id"] == 1).all()


def test_type_pairs_empty_schema():
    from bioontologykg_ray.pipelines.queries import _PAIR_EMPTY, _type_pairs_apply

    out = _type_pairs_apply(_PAIR_EMPTY.assign(event_type=[], c=[]).iloc[:0])
    assert list(out.columns) == ["user_id", "type_a", "type_b"]


# ---------------------------------------------------------------------------
# CUBE margins (driver fold over the dimension-sized base)
# ---------------------------------------------------------------------------

def test_order_cube_margins_consistent(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from bioontologykg_ray.pipelines.queries import q_order_cube

    df = pd.DataFrame(
        {
            "o_orderstatus": ["O", "O", "F"],
            "o_orderpriority": ["1-URGENT", "2-HIGH", "1-URGENT"],
            "o_totalprice": [10.00, 20.00, 30.00],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "orders.parquet")
    out = q_order_cube(str(tmp_path))
    # 3 fine rows + 2 status margins + 2 priority margins + grand total
    assert len(out) == 8
    grand = out[out["o_orderstatus"].isna() & out["o_orderpriority"].isna()]
    assert grand["n"].tolist() == [3]
    assert grand["sum_price"].tolist() == [60.0]
    st = out[(out["o_orderstatus"] == "O") & out["o_orderpriority"].isna()]
    assert st["sum_price"].tolist() == [30.0]


# ---------------------------------------------------------------------------
# FIRST_VALUE day-open delta
# ---------------------------------------------------------------------------

def test_day_open_delta_per_user_day():
    from bioontologykg_ray.pipelines.queries import _day_open_apply

    df = _ev(
        [1, 2, 3, 4],
        [7, 7, 7, 7],
        [
            "2024-01-01 08:00",
            "2024-01-01 12:00",
            "2024-01-02 09:00",
            "2024-01-02 10:00",
        ],
    )
    df["value"] = [10.00, 12.50, 5.00, 4.25]
    out = _day_open_apply(df).set_index("event_id")["day_open_delta"]
    assert out.loc[1] == 0.0            # day open
    assert out.loc[2] == 2.5
    assert out.loc[3] == 0.0            # new day resets the frame
    assert out.loc[4] == -0.75


def test_day_open_first_tie_breaks_on_event_id():
    from bioontologykg_ray.pipelines.queries import _day_open_apply

    df = _ev([5, 2], [1, 1], ["2024-01-01 08:00", "2024-01-01 08:00"])
    df["value"] = [3.0, 1.0]
    out = _day_open_apply(df).set_index("event_id")["day_open_delta"]
    # equal ts: event_id 2 is the opener
    assert out.loc[2] == 0.0
    assert out.loc[5] == 2.0


# ---------------------------------------------------------------------------
# per-doc character entropy
# ---------------------------------------------------------------------------

def test_char_entropy_uniform_and_degenerate():
    from bioontologykg_ray.pipelines.queries import _char_entropy_batch

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["abcd", "aaaa"]})
    out = _char_entropy_batch(df).set_index("doc_id")
    assert out.loc[1, "char_entropy"] == 2.0   # 4 distinct chars, uniform
    assert out.loc[2, "char_entropy"] == 0.0   # single repeated char
    assert out["n_chars"].tolist() == [4, 4]


def test_char_entropy_skips_empty_docs():
    from bioontologykg_ray.pipelines.queries import _char_entropy_batch

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["", "ab"]})
    out = _char_entropy_batch(df)
    assert out["doc_id"].tolist() == [2]
    assert out["char_entropy"].tolist() == [1.0]


def test_char_entropy_isolated_per_doc():
    from bioontologykg_ray.pipelines.queries import _char_entropy_batch

    # same total char mix, split differently -> different entropies
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["ab", "ab"]})
    out = _char_entropy_batch(df)
    assert out["char_entropy"].tolist() == [1.0, 1.0]


# ---------------------------------------------------------------------------
# grouped z-score sufficient statistics
# ---------------------------------------------------------------------------

def test_balance_partials_additive():
    from bioontologykg_ray.pipelines.queries import _balance_partials

    df = pd.DataFrame(
        {"s_nationkey": [1, 1, 2], "s_acctbal": [10.0, 30.0, 5.0]}
    )
    whole = _balance_partials(df).set_index("s_nationkey")
    halves = pd.concat(
        [_balance_partials(df.iloc[:1]), _balance_partials(df.iloc[1:])]
    ).groupby("s_nationkey").sum()
    pd.testing.assert_frame_equal(whole.sort_index(), halves.sort_index())
    assert whole.loc[1, "sx"] == 40.0 and whole.loc[1, "sxx"] == 1000.0


# ---------------------------------------------------------------------------
# ratio-to-report + global dense rank (end-to-end on tiny fixtures)
# ---------------------------------------------------------------------------

def test_share_and_dense_rank_tiny(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from bioontologykg_ray.pipelines.queries import (
        q_order_share_of_customer,
        q_orders_price_dense_rank,
    )

    df = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [10, 10, 20, 20],
            "o_totalprice": [25.00, 75.00, 40.00, 40.00],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "orders.parquet")
    share = q_order_share_of_customer(str(tmp_path)).set_index("o_orderkey")
    assert share.loc[1, "spend_share"] == 0.25
    assert share.loc[2, "spend_share"] == 0.75
    assert share.loc[3, "spend_share"] == 0.5
    rank = q_orders_price_dense_rank(str(tmp_path)).set_index("o_orderkey")
    # dense: 75 -> 1, 40 -> 2 (both), 25 -> 3
    assert rank.loc[2, "price_rank"] == 1
    assert rank.loc[3, "price_rank"] == 2
    assert rank.loc[4, "price_rank"] == 2
    assert rank.loc[1, "price_rank"] == 3


# ---------------------------------------------------------------------------
# wedge emission for common-neighbor counts
# ---------------------------------------------------------------------------

def test_wedge_pairs_around_center():
    from bioontologykg_ray.pipelines.queries import _wedge_pairs_apply

    # center c adjacent to a, b, d -> 3 unordered pairs
    df = pd.DataFrame({"v": ["c"] * 3, "u": ["a", "b", "d"]})
    out = _wedge_pairs_apply(df)
    assert set(zip(out["x"], out["y"])) == {("a", "b"), ("a", "d"), ("b", "d")}


def test_wedge_pairs_respect_center_boundaries():
    from bioontologykg_ray.pipelines.queries import _wedge_pairs_apply

    # two centers: pairs never cross centers
    df = pd.DataFrame({"v": ["c1", "c1", "c2", "c2"], "u": ["a", "b", "a", "z"]})
    out = _wedge_pairs_apply(df)
    assert set(zip(out["x"], out["y"])) == {("a", "b"), ("a", "z")}


# ---------------------------------------------------------------------------
# bigram extraction + sessionized bounce partials
# ---------------------------------------------------------------------------

def test_bigram_partials_adjacent_within_doc():
    from bioontologykg_ray.pipelines.queries import _bigram_partials

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "c a"]})
    out = _bigram_partials(df).set_index(["a", "b"])["c"]
    # doc boundaries break adjacency: no ("c","c") pair
    assert out.loc[("a", "b")] == 1
    assert out.loc[("b", "c")] == 1
    assert out.loc[("c", "a")] == 1
    assert len(out) == 3


def test_bigram_partials_counts_repeats():
    from bioontologykg_ray.pipelines.queries import _bigram_partials

    df = pd.DataFrame({"doc_id": [1], "text": ["x y x y"]})
    out = _bigram_partials(df).set_index(["a", "b"])["c"]
    assert out.loc[("x", "y")] == 2
    assert out.loc[("y", "x")] == 1


def test_bounce_partials_sessions_and_days():
    from bioontologykg_ray.pipelines.queries import _bounce_partials

    df = _ev(
        [1, 2, 3, 4],
        [7, 7, 7, 9],
        [
            "2024-01-01 08:00",  # session 1 (2 events, 10 min apart)
            "2024-01-01 08:10",
            "2024-01-01 12:00",  # session 2 (bounce: > 30 min gap)
            "2024-01-02 09:00",  # user 9, own session (bounce)
        ],
    )
    out = _bounce_partials(df).set_index("day_i")
    days = sorted(out.index)
    assert out.loc[days[0], "n_sessions"] == 2
    assert out.loc[days[0], "n_bounces"] == 1
    assert out.loc[days[1], "n_sessions"] == 1
    assert out.loc[days[1], "n_bounces"] == 1


def test_bounce_session_keyed_by_start_day():
    from bioontologykg_ray.pipelines.queries import _bounce_partials

    # session starts 23:50 Jan 1, second event 00:05 Jan 2 (15 min gap):
    # ONE session, keyed to Jan 1
    df = _ev([1, 2], [5, 5], ["2024-01-01 23:50", "2024-01-02 00:05"])
    out = _bounce_partials(df)
    assert len(out) == 1
    assert out["n_sessions"].tolist() == [1]
    assert out["n_bounces"].tolist() == [0]


# ---------------------------------------------------------------------------
# conversion latency + centroid partials
# ---------------------------------------------------------------------------

def test_conversion_strictly_after_signup():
    from bioontologykg_ray.pipelines.queries import _conversion_apply

    df = _ev(
        [1, 2, 3, 4],
        [7, 7, 8, 8],
        ["2024-01-05 10:00", "2024-01-08 10:00", "2024-01-05 10:00", "2024-01-04 10:00"],
    )
    df["event_type"] = ["signup", "purchase", "signup", "purchase"]
    out = _conversion_apply(df)
    # user 7 converts in 3 days; user 8's purchase PRECEDES signup -> dropped
    assert out["user_id"].tolist() == [7]
    assert out["days_to_purchase"].tolist() == [3]


def test_conversion_picks_first_of_each():
    from bioontologykg_ray.pipelines.queries import _conversion_apply

    df = _ev(
        [1, 2, 3, 4],
        [9, 9, 9, 9],
        ["2024-01-01 08:00", "2024-01-02 08:00", "2024-01-03 08:00", "2024-01-10 08:00"],
    )
    df["event_type"] = ["signup", "signup", "purchase", "purchase"]
    out = _conversion_apply(df)
    assert out["days_to_purchase"].tolist() == [2]  # first signup -> first purchase


def test_centroid_partials_long_form_additive():
    from bioontologykg_ray.pipelines.queries import _centroid_partials

    df = pd.DataFrame(
        {
            "label": pd.Series([1, 1, 2], dtype="int64"),
            "embedding": [
                np.array([1.0, 0.0], np.float32),
                np.array([3.0, 2.0], np.float32),
                np.array([0.0, 5.0], np.float32),
            ],
        }
    )
    out = _centroid_partials(df).set_index(["label", "dim"])
    assert out.loc[(1, 1), "s"] == 4.0 and out.loc[(1, 2), "s"] == 2.0
    assert out.loc[(1, 1), "n"] == 2 and out.loc[(2, 1), "n"] == 1


# ---------------------------------------------------------------------------
# Adamic-Adar wedge weights + weekday/hour keys
# ---------------------------------------------------------------------------

def test_aa_wedge_weight_is_inverse_log_degree():
    from bioontologykg_ray.pipelines.queries import _aa_wedge_apply

    # center c has 3 neighbors -> weight 1/ln(3) on each pair
    df = pd.DataFrame({"v": ["c"] * 3, "u": ["a", "b", "d"]})
    out = _aa_wedge_apply(df)
    assert len(out) == 3
    assert np.allclose(out["w"], 1.0 / np.log(3.0))


def test_aa_degree_is_per_center():
    from bioontologykg_ray.pipelines.queries import _aa_wedge_apply

    df = pd.DataFrame(
        {"v": ["c1", "c1", "c2", "c2", "c2"], "u": ["a", "b", "a", "b", "d"]}
    )
    out = _aa_wedge_apply(df)
    w = dict(zip(zip(out["x"], out["y"]), out["w"]))
    # pair (a,b) appears under both centers with different degrees
    assert len(out) == 4  # 1 pair from c1 + 3 from c2
    assert np.isclose(out[out["w"] == 1.0 / np.log(2.0)]["w"].iloc[0], 1.0 / np.log(2.0))


def test_weekday_epoch_anchor():
    # 1970-01-01 was a Thursday: isodow 4
    us = np.array(["1970-01-01T12:00:00"], dtype="datetime64[us]").astype(np.int64)
    day_i = us // (86_400 * 1_000_000)
    assert (((day_i + 3) % 7) + 1).tolist() == [4]
    # 2024-01-01 was a Monday: isodow 1
    us = np.array(["2024-01-01T00:30:00"], dtype="datetime64[us]").astype(np.int64)
    day_i = us // (86_400 * 1_000_000)
    assert (((day_i + 3) % 7) + 1).tolist() == [1]


# ---------------------------------------------------------------------------
# sliding-window COUNT DISTINCT coverage deltas
# ---------------------------------------------------------------------------

def _days_df(users, day_is):
    return pd.DataFrame(
        {
            "user_id": np.asarray(users, np.int64),
            "day_i": np.asarray(day_is, np.int64),
        }
    )


def test_coverage_merges_overlapping_intervals():
    from bioontologykg_ray.pipelines.queries import _coverage_deltas_apply

    # active days 10 and 13 (gap 3 <= 6): ONE merged interval [10, 19]
    out = _coverage_deltas_apply(_days_df([1, 1], [10, 13]))
    d = dict(zip(out["day_i"], out["delta"]))
    assert d == {10: 1, 20: -1}


def test_coverage_splits_distant_intervals():
    from bioontologykg_ray.pipelines.queries import _coverage_deltas_apply

    # gap 7 > 6: two intervals [10,16] -> (10,+1),(17,-1) and
    # [17,23] -> (17,+1),(24,-1); the day-17 rows cancel in the grouped sum
    out = _coverage_deltas_apply(_days_df([1, 1], [10, 17]))
    assert sorted(zip(out["day_i"], out["delta"])) == [
        (10, 1), (17, -1), (17, 1), (24, -1),
    ]


def test_coverage_per_user_independent():
    from bioontologykg_ray.pipelines.queries import _coverage_deltas_apply

    out = _coverage_deltas_apply(_days_df([1, 2], [10, 10]))
    # two users, same day: two +1 deltas at 10 (distinct count 2)
    assert (out[out["delta"] == 1]["day_i"] == 10).all()
    assert len(out[out["delta"] == 1]) == 2


def test_coverage_dedups_same_day_events():
    from bioontologykg_ray.pipelines.queries import _coverage_deltas_apply

    out = _coverage_deltas_apply(_days_df([1, 1, 1], [10, 10, 10]))
    assert sorted(zip(out["day_i"], out["delta"])) == [(10, 1), (17, -1)]


# ---------------------------------------------------------------------------
# MoM truncating division parity
# ---------------------------------------------------------------------------

def test_trunc_division_matches_duckdb_semantics():
    import duckdb

    num = np.array([-7_000_000, 7_000_000, -1], np.int64)
    den = np.array([2, 2, 3], np.int64)
    ours = np.sign(num) * (np.abs(num) // den)
    theirs = [
        duckdb.sql(f"SELECT {int(a)} // {int(b)}").fetchone()[0]
        for a, b in zip(num, den)
    ]
    assert ours.tolist() == theirs


# ---------------------------------------------------------------------------
# feature hashing + chi-square cells
# ---------------------------------------------------------------------------

def test_hash_features_counts_and_buckets():
    from bioontologykg_ray.functions.hashing import md5_low64
    from bioontologykg_ray.pipelines.queries import _hash_feature_partials

    df = pd.DataFrame({"doc_id": [1], "text": ["cat cat dog"]})
    out = _hash_feature_partials(df).set_index("bucket")["n"]
    assert out.loc[md5_low64("cat") % 64] == 2
    assert out.loc[md5_low64("dog") % 64] == 1


def test_hash_features_doc_isolation():
    from bioontologykg_ray.pipelines.queries import _hash_feature_partials

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["x", "x"]})
    out = _hash_feature_partials(df)
    assert len(out) == 2 and set(out["doc_id"]) == {1, 2}
    assert (out["n"] == 1).all()


def test_chi2_expected_matches_margins(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from bioontologykg_ray.pipelines.queries import q_lang_source_chi2

    df = pd.DataFrame(
        {
            "lang": ["en", "en", "de", "de"],
            "source": ["web", "web", "web", "book"],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    out = q_lang_source_chi2(str(tmp_path)).set_index(["lang", "source"])
    # en/web: rt=2, ct=3, tot=4 -> expected 1.5, contrib (2-1.5)^2/1.5
    assert out.loc[("en", "web"), "expected"] == 1.5
    assert out.loc[("en", "web"), "contrib"] == round(0.25 / 1.5, 6)


# ---------------------------------------------------------------------------
# RFM quintiles
# ---------------------------------------------------------------------------

def test_rfm_tiny(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from bioontologykg_ray.pipelines.queries import q_user_rfm_scores

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-10", "2024-01-02", "2024-01-05", "2024-01-01"]
            ),
            "value": [10.0, 5.0, 100.0, 1.0],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_user_rfm_scores(str(tmp_path)).set_index("user_id")
    # user 1: most recent + most frequent + mid monetary
    assert out.loc[1, "r_score"] == 1 and out.loc[1, "f_score"] == 1
    # user 2: highest monetary
    assert out.loc[2, "m_score"] == 1
    # user 3: least recent, least valuable
    assert out.loc[3, "r_score"] == 3 and out.loc[3, "m_score"] == 3


# ---------------------------------------------------------------------------
# group-size quantile rank rule + set algebra
# ---------------------------------------------------------------------------

def test_group_size_quantiles_tiny(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from bioontologykg_ray.pipelines.queries import q_orders_per_cust_quantiles

    # per-customer counts: [1, 1, 2, 4] -> p50 = 2nd smallest = 1,
    # p90 = ceil(3.6)=4th = 4, p99 = 4th = 4
    df = pd.DataFrame({"o_custkey": [1, 2, 3, 3, 4, 4, 4, 4]})
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "orders.parquet")
    out = q_orders_per_cust_quantiles(str(tmp_path)).iloc[0]
    assert out["n_customers"] == 4
    assert out["p50"] == 1 and out["p90"] == 4 and out["p99"] == 4


def test_engaged_non_purchasers_tiny(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from bioontologykg_ray.pipelines.queries import q_engaged_non_purchasers

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3],
            "event_type": [
                "signup", "click", "purchase",   # user 1: bought -> out
                "signup", "click",               # user 2: engaged, no buy
                "signup",                        # user 3: no click -> out
            ],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_engaged_non_purchasers(str(tmp_path))
    assert out["user_id"].tolist() == [2]


# ---------------------------------------------------------------------------
# debounce + k-means assignment kernels
# ---------------------------------------------------------------------------

def test_debounce_collapses_fast_repeats():
    from bioontologykg_ray.pipelines.queries import _debounce_partials

    df = _ev(
        [1, 2, 3, 4],
        [7, 7, 7, 7],
        [
            "2024-01-01 10:00:00.000000",
            "2024-01-01 10:00:00.500000",   # 0.5 s later: debounced
            "2024-01-01 10:00:02.000000",   # 1.5 s after prev: kept
            "2024-01-01 10:00:02.500000",   # 0.5 s later: debounced
        ],
    )
    df["event_type"] = ["click"] * 4
    out = _debounce_partials(df).set_index("event_type")
    assert out.loc["click", "n_raw"] == 4
    assert out.loc["click", "n_debounced"] == 2


def test_debounce_type_streams_independent():
    from bioontologykg_ray.pipelines.queries import _debounce_partials

    df = _ev([1, 2], [7, 7], ["2024-01-01 10:00:00.000000"] * 2)
    df["event_type"] = ["click", "view"]
    out = _debounce_partials(df)
    assert (out["n_debounced"] == 1).all() and len(out) == 2


def test_kmeans_assignment_tiny(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from bioontologykg_ray.pipelines.queries import q_kmeans_assign_counts

    # 8 seed vectors on the unit axes x0..x7; two extra vectors near
    # seed 0 and seed 3
    vecs = [np.eye(8, dtype=np.float32)[i] for i in range(8)]
    vecs.append(np.array([0.9] + [0.0] * 7, np.float32))
    vecs.append((np.eye(8, dtype=np.float32)[3] * 1.1).astype(np.float32))
    df = pd.DataFrame(
        {"vec_id": range(10), "embedding": [list(v) for v in vecs]}
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "embeddings.parquet")
    out = q_kmeans_assign_counts(str(tmp_path)).set_index("centroid_id")
    assert out.loc[0, "n_vecs"] == 2
    assert out.loc[3, "n_vecs"] == 2
    assert out["n_vecs"].sum() == 10


# ---------------------------------------------------------------------------
# Benford digit extraction
# ---------------------------------------------------------------------------

def test_benford_digit_extraction_and_zero_drop():
    from bioontologykg_ray.pipelines.queries import _benford_partials

    df = pd.DataFrame({"value": [0.00, 1.23, 9.87, 0.05, 123.45]})
    out = _benford_partials(df).set_index("digit")["n"]
    # cents: 0 (dropped), 123 -> 1, 987 -> 9, 5 -> 5, 12345 -> 1
    assert out.loc[1] == 2
    assert out.loc[9] == 1
    assert out.loc[5] == 1
    assert out.sum() == 4


# ---------------------------------------------------------------------------
# multi-grain rollup week anchor
# ---------------------------------------------------------------------------

def test_week_anchor_is_monday():
    # 2024-01-03 was a Wednesday; its ISO week starts Monday 2024-01-01
    di = np.array(["2024-01-03"], dtype="datetime64[D]").astype(np.int64)
    ws = di - ((di + 3) % 7)
    assert ws.astype("datetime64[D]").astype(str).tolist() == ["2024-01-01"]
    # a Monday anchors to itself
    di = np.array(["2024-01-01"], dtype="datetime64[D]").astype(np.int64)
    assert (di - ((di + 3) % 7)).tolist() == di.tolist()


# ---------------------------------------------------------------------------
# LOCF run expansion
# ---------------------------------------------------------------------------

def test_locf_fills_gaps_with_previous_value():
    from bioontologykg_ray.pipelines.queries import _locf_apply

    df = _ev([1, 2], [7, 7], ["2024-01-01", "2024-01-04"])
    df["value"] = [10.00, 2.50]
    out = _locf_apply(df).sort_values("day_i")
    # days 1,2,3 carry 1000 cents; day 4 carries 250
    assert out["locf_cents"].tolist() == [1000, 1000, 1000, 250]
    assert len(out) == 4


def test_locf_sums_same_day_and_respects_user_boundaries():
    from bioontologykg_ray.pipelines.queries import _locf_apply

    df = _ev([1, 2, 3], [7, 7, 9], ["2024-01-01", "2024-01-01", "2024-01-05"])
    df["value"] = [1.00, 2.00, 9.00]
    out = _locf_apply(df)
    u7 = out[out["user_id"] == 7]
    # same-day values sum; single-day users emit exactly one row
    assert u7["locf_cents"].tolist() == [300]
    assert out[out["user_id"] == 9]["locf_cents"].tolist() == [900]


# ---------------------------------------------------------------------------
# registry invariants
# ---------------------------------------------------------------------------

def test_registry_oracle_coverage_invariant():
    """Every queries() entry either carries an exact DuckDB oracle or is
    one of the documented rows-only (approximate / model-output)
    entries — no silent oracle gaps."""
    from bioontologykg_ray.pipelines.queries import ORACLE, QUERIES

    ROWS_ONLY = {
        "ann_topk_lsh", "ann_topk_ivf", "ann_topk_ivf_indexed",
        "ann_topk_filtered_indexed", "doc_embeddings",
        "value_quantile_sketch",
    }
    missing = set(QUERIES) - set(ORACLE)
    assert missing == ROWS_ONLY
    # and no orphan oracles for queries that do not exist
    assert set(ORACLE) <= set(QUERIES)


# ---------------------------------------------------------------------------
# anomaly fence + 80/20 concentration
# ---------------------------------------------------------------------------

def test_anomaly_fence_tiny(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from bioontologykg_ray.pipelines.queries import q_anomalous_event_days

    # six quiet days of 10 events, one day of 100: the spike is > 3 MADs
    ts = []
    for d in range(1, 7):
        ts += [f"2024-01-0{d} 10:00"] * 10
    ts += ["2024-01-07 10:00"] * 100
    df = pd.DataFrame({"ts": pd.to_datetime(ts)})
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_anomalous_event_days(str(tmp_path)).set_index("day")
    assert bool(out.loc["2024-01-07", "is_anomaly"])
    assert not out.loc["2024-01-01", "is_anomaly"]


def test_concentration_8020_tiny(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from bioontologykg_ray.pipelines.queries import q_value_concentration_8020

    # values 80, 10, 10: user 1 alone covers exactly 80%
    df = pd.DataFrame(
        {"user_id": [1, 2, 3], "value": [80.00, 10.00, 10.00]}
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_value_concentration_8020(str(tmp_path)).iloc[0]
    assert out["n_users"] == 3
    assert out["n_users_80pct"] == 1
    assert out["top_share_ppm"] == 800000


# ---------------------------------------------------------------------------
# Welch t + autocorrelation closed forms
# ---------------------------------------------------------------------------

def test_welch_t_zero_for_identical_halves(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from bioontologykg_ray.pipelines.queries import q_value_halves_ttest

    ts = (["2024-01-01 10:00"] * 4 + ["2024-01-01 11:00"] * 0
          + ["2024-01-05 10:00"] * 4)
    vals = [1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0]
    df = pd.DataFrame({"ts": pd.to_datetime(ts), "value": vals})
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_value_halves_ttest(str(tmp_path)).iloc[0]
    assert out["mean_before"] == out["mean_after"] == 2.5
    assert out["welch_t"] == 0.0
    assert out["n_before"] == 4 and out["n_after"] == 4


def test_autocorr_alternating_series_is_negative(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from bioontologykg_ray.pipelines.queries import q_events_autocorr_lag1

    # counts 2,1,2,1,2,1 -> strong negative lag-1 autocorrelation
    ts = []
    for d in range(1, 7):
        ts += [f"2024-01-0{d} 09:00"] * (2 if d % 2 else 1)
    df = pd.DataFrame({"ts": pd.to_datetime(ts)})
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_events_autocorr_lag1(str(tmp_path)).iloc[0]
    assert out["n_days"] == 6
    assert out["autocorr_lag1"] < -0.9
