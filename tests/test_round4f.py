"""Round-4 continuation (f): SCD interval compression, interval
self-overlap sweep, exact-integer CUSUM changepoint scan."""

import numpy as np
import pandas as pd

from bioontologykg_ray.pipelines.queries import (
    _OVERLAP_EMPTY,
    _STATUS_EMPTY,
    _overlap_apply,
    _status_apply,
)


# ---------------------------------------------------------------------------
# SCD-style run-length interval compression
# ---------------------------------------------------------------------------

def _events(users, types, ts, ids=None):
    n = len(users)
    return pd.DataFrame(
        {
            "user_id": np.asarray(users, np.int64),
            "event_id": np.asarray(ids if ids is not None else range(1, n + 1),
                                   np.int64),
            "ts": pd.to_datetime(ts),
            "event_type": types,
        }
    )


def test_status_intervals_collapse_consecutive_runs():
    df = _events(
        [1, 1, 1, 1],
        ["view", "view", "click", "view"],
        ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"],
    )
    out = _status_apply(df)
    assert out["event_type"].tolist() == ["view", "click", "view"]
    assert out["n_events"].tolist() == [2, 1, 1]
    assert out.iloc[0]["valid_from"] == pd.Timestamp("2024-01-01")
    assert out.iloc[0]["valid_to"] == pd.Timestamp("2024-01-02")


def test_status_intervals_do_not_merge_across_users():
    # Same type on both sides of a user boundary must stay two islands.
    df = _events([1, 2], ["view", "view"], ["2024-01-01", "2024-01-01"])
    out = _status_apply(df)
    assert len(out) == 2
    assert sorted(out["user_id"].tolist()) == [1, 2]


def test_status_intervals_tiebreak_by_event_id():
    # Two events at the SAME ts: event_id orders them, so the run
    # structure is deterministic (type changes at event_id order).
    df = _events(
        [1, 1, 1],
        ["a", "b", "a"],
        ["2024-01-01"] * 3,
        ids=[3, 1, 2],
    )
    out = _status_apply(df)
    # order by (ts, event_id): ids 1(b), 2(a), 3(a) -> runs b, aa
    assert out["event_type"].tolist() == ["b", "a"]
    assert out["n_events"].tolist() == [1, 2]


def test_status_intervals_empty_keeps_schema():
    out = _status_apply(_STATUS_EMPTY.copy())
    assert list(out.columns) == list(_STATUS_EMPTY.columns)
    assert len(out) == 0


# ---------------------------------------------------------------------------
# interval overlap sweep
# ---------------------------------------------------------------------------

def _orders(custs, days):
    return pd.DataFrame(
        {
            "o_custkey": np.asarray(custs, np.int64),
            "day_i": np.asarray(days, np.int64),
        }
    )


def test_overlap_pairs_counts_within_7_days():
    # days 0, 3, 6, 20: pairs (0,3),(0,6),(3,6) overlap; 20 is isolated.
    out = _overlap_apply(_orders([1] * 4, [0, 3, 6, 20]))
    assert out["n_overlap_pairs"].tolist() == [3]


def test_overlap_boundary_exactly_7_days_is_disjoint():
    # [d, d+7) and [d+7, d+14) share no day -> NOT an overlap.
    out = _overlap_apply(_orders([1, 1], [0, 7]))
    assert len(out) == 0


def test_overlap_same_day_counts():
    out = _overlap_apply(_orders([1, 1], [5, 5]))
    assert out["n_overlap_pairs"].tolist() == [1]


def test_overlap_never_crosses_customers():
    out = _overlap_apply(_orders([1, 2], [0, 1]))
    assert len(out) == 0


def test_overlap_empty_keeps_schema():
    out = _overlap_apply(_OVERLAP_EMPTY.copy())
    assert list(out.columns) == list(_OVERLAP_EMPTY.columns)
    assert len(out) == 0


def test_overlap_matches_quadratic_reference():
    rng = np.random.RandomState(7)
    custs = rng.randint(0, 20, 300)
    days = rng.randint(0, 60, 300).astype(np.int64) + 9000
    out = _overlap_apply(_orders(custs, days)).set_index("o_custkey")

    ref = {}
    for c in np.unique(custs):
        d = np.sort(days[custs == c])
        n = sum(
            1
            for i in range(len(d))
            for j in range(i + 1, len(d))
            if abs(int(d[j]) - int(d[i])) < 7
        )
        if n:
            ref[int(c)] = n
    assert out["n_overlap_pairs"].to_dict() == ref


# ---------------------------------------------------------------------------
# CUSUM scaled-integer deviation identity
# ---------------------------------------------------------------------------

def test_cusum_scaled_deviation_matches_float_cusum():
    # D_k = N*S_k - C_k*T must equal N * (S_k - C_k * mean).
    s = np.array([100, 250, 50, 400], np.int64)
    c = np.array([2, 3, 1, 4], np.int64)
    S, C = np.cumsum(s), np.cumsum(c)
    T, N = s.sum(), c.sum()
    d_int = N * S - C * T
    d_float = N * (S - C * (T / N))
    assert np.allclose(d_int.astype(float), d_float)
    # and the final cumulative deviation is exactly zero
    assert d_int[-1] == 0
