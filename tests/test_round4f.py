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


# ---------------------------------------------------------------------------
# pairwise KS statistic (exact integer numerator)
# ---------------------------------------------------------------------------

def test_ks_pairs_matches_bruteforce_ecdf():
    from bioontologykg_ray.pipelines.queries import _ks_pairs

    rng = np.random.RandomState(3)
    rows = []
    samples = {}
    for s in ["a", "b", "c"]:
        vals = rng.randint(0, 15, rng.randint(5, 40))
        samples[s] = vals
        u, c = np.unique(vals, return_counts=True)
        rows += [(s, int(v), int(n)) for v, n in zip(u, c)]
    counts = pd.DataFrame(rows, columns=["source", "n_chars", "n"])
    out = _ks_pairs(counts).set_index(["source_a", "source_b"])

    grid = np.unique(np.concatenate(list(samples.values())))
    for a, b in [("a", "b"), ("a", "c"), ("b", "c")]:
        xa, xb = np.sort(samples[a]), np.sort(samples[b])
        fa = np.searchsorted(xa, grid, side="right") / len(xa)
        fb = np.searchsorted(xb, grid, side="right") / len(xb)
        d = np.abs(fa - fb).max()
        row = out.loc[(a, b)]
        assert row["n_a"] == len(xa) and row["n_b"] == len(xb)
        assert abs(row["ks_d"] - d) < 1e-12
        assert row["d_num"] == round(d * len(xa) * len(xb))


def test_ks_identical_distributions_give_zero():
    from bioontologykg_ray.pipelines.queries import _ks_pairs

    counts = pd.DataFrame(
        {"source": ["a", "a", "b", "b"], "n_chars": [1, 2, 1, 2], "n": [3, 5, 3, 5]}
    )
    out = _ks_pairs(counts)
    assert out["d_num"].tolist() == [0]
    assert out["ks_d"].tolist() == [0.0]


# ---------------------------------------------------------------------------
# Mann-Whitney doubled U
# ---------------------------------------------------------------------------

def _mwu_brute(a, b):
    # 2U_a = 2*#(b<a pairs) + #(b==a pairs)
    a = np.asarray(a)[:, None]
    b = np.asarray(b)[None, :]
    return int(2 * (b < a).sum() + (b == a).sum())


def test_mwu_matches_bruteforce_with_ties():
    from bioontologykg_ray.pipelines.queries import _mwu_from_counts

    rng = np.random.RandomState(11)
    a = rng.randint(0, 10, 37)
    b = rng.randint(2, 12, 53)
    values = np.unique(np.concatenate([a, b]))
    na = np.array([(a == v).sum() for v in values], np.int64)
    nb = np.array([(b == v).sum() for v in values], np.int64)
    u2_a, u2_b = _mwu_from_counts(na, nb)
    assert u2_a == _mwu_brute(a, b)
    assert u2_b == _mwu_brute(b, a)
    assert u2_a + u2_b == 2 * len(a) * len(b)


def test_mwu_disjoint_supports():
    from bioontologykg_ray.pipelines.queries import _mwu_from_counts

    # all of b above all of a -> U_a = 0, U_b = n_a*n_b
    na = np.array([2, 3, 0, 0], np.int64)
    nb = np.array([0, 0, 4, 1], np.int64)
    u2_a, u2_b = _mwu_from_counts(na, nb)
    assert u2_b == 0 or u2_a == 0
    assert u2_a + u2_b == 2 * 5 * 5


# ---------------------------------------------------------------------------
# mergeable equi-depth quantile summary
# ---------------------------------------------------------------------------

def test_quantile_sketch_rank_error_within_bound():
    from bioontologykg_ray.stages.sketch import (
        quantile_summary_partial,
        quantile_summary_query,
    )

    rng = np.random.RandomState(5)
    # adversarial mix: heavy ties + lognormal tail, split into uneven blocks
    data = np.concatenate(
        [np.full(3000, 7.0), rng.lognormal(0, 2, 5000), rng.uniform(0, 1, 2000)]
    )
    rng.shuffle(data)
    blocks = np.array_split(data, [1234, 2000, 6500, 9000])
    k = 256
    merged = pd.concat(
        [quantile_summary_partial(pd.Series(b), k=k) for b in blocks],
        ignore_index=True,
    )
    n = len(data)
    assert len(merged) <= len(blocks) * k
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    est = quantile_summary_query(merged, qs)
    s = np.sort(data)
    for q, v in zip(est["q"], est["value"]):
        # rank error: distance from the target rank q*n to the pivot's
        # rank interval [lo, hi] (a tie-run containing the target is exact)
        lo = np.searchsorted(s, v, side="left")
        hi = np.searchsorted(s, v, side="right")
        err = max(0.0, lo - q * n, q * n - hi)
        assert err <= n / (2 * k) + len(blocks), (q, err)


def test_quantile_sketch_exact_when_blocks_small():
    from bioontologykg_ray.stages.sketch import (
        quantile_summary_partial,
        quantile_summary_query,
    )

    # blocks smaller than k keep every value at weight 1 -> exact medians
    vals = pd.Series(np.arange(100, dtype=np.float64))
    summ = quantile_summary_partial(vals, k=256)
    assert len(summ) == 100
    assert (summ["q_weight"] == 1.0).all()
    out = quantile_summary_query(summ, [0.5])
    assert abs(out["value"].iloc[0] - 49.0) <= 1.0


def test_quantile_sketch_empty_and_nan():
    from bioontologykg_ray.stages.sketch import (
        _QSUMMARY_EMPTY,
        quantile_summary_partial,
        quantile_summary_query,
    )

    assert quantile_summary_partial(pd.Series([], dtype=float)).empty
    assert quantile_summary_partial(pd.Series([np.nan, np.nan])).empty
    out = quantile_summary_query(_QSUMMARY_EMPTY.copy(), [0.5])
    assert np.isnan(out["value"].iloc[0])


# ---------------------------------------------------------------------------
# Gini identity
# ---------------------------------------------------------------------------

def test_gini_formula_matches_mean_absolute_difference():
    # gini = sum_ij |xi - xj| / (2 n sum x) must equal the rank formula.
    rng = np.random.RandomState(13)
    x = rng.randint(1, 1000, 200).astype(np.int64)
    xs = np.sort(x)
    n = len(xs)
    rank = np.arange(1, n + 1, dtype=np.int64)
    num = 2 * int((rank * xs).sum()) - (n + 1) * int(xs.sum())
    den = n * int(xs.sum())
    mad = np.abs(x[:, None] - x[None, :]).sum()
    assert num / den == mad / (2 * n * x.sum())


def test_gini_extremes():
    # all-equal -> 0; one-holder -> (n-1)/n
    xs = np.full(10, 5, np.int64)
    rank = np.arange(1, 11, dtype=np.int64)
    assert 2 * (rank * xs).sum() - 11 * xs.sum() == 0
    xs = np.zeros(10, np.int64); xs[-1] = 100
    num = 2 * int((rank * xs).sum()) - 11 * int(xs.sum())
    assert num / (10 * xs.sum()) == 9 / 10
