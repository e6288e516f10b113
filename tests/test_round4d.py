"""Round-4 continuation (d): date-spine time series, cumulative distinct
growth, and the k-anonymity privacy audit."""

import numpy as np
import pandas as pd

from bioontologykg_ray.pipelines.queries import _day_str, _event_days


def _ev(ts, users=None):
    df = pd.DataFrame({"ts": pd.to_datetime(ts)})
    if users is not None:
        df["user_id"] = np.asarray(users, np.int64)
    return df


# ---------------------------------------------------------------------------
# ts → integer-day projection (shared by both time-series queries)
# ---------------------------------------------------------------------------

def test_event_days_truncates_to_day():
    df = _ev(
        ["2024-01-01 00:00:00", "2024-01-01 23:59:59", "2024-01-02 12:00:00"],
        users=[7, 7, 8],
    )
    out = _event_days(df, keep_user=True)
    # one day apart, same day collapses
    assert out["day_i"].tolist()[0] == out["day_i"].tolist()[1]
    assert out["day_i"].tolist()[2] == out["day_i"].tolist()[0] + 1
    assert out["user_id"].tolist() == [7, 7, 8]
    # keep_user=False drops the column entirely
    assert list(_event_days(df, keep_user=False).columns) == ["day_i"]


def test_day_str_roundtrip():
    day_i = _event_days(_ev(["2024-02-29 10:30"]), keep_user=False)["day_i"]
    assert _day_str(day_i.to_numpy()).tolist() == ["2024-02-29"]


# ---------------------------------------------------------------------------
# end-to-end vs DuckDB on the tiny fixture (the driver gate analogue runs
# the sf0.01 conformance; this pins the sf0.001 behavior in-suite)
# ---------------------------------------------------------------------------

def _oracle(sf_dir, sql):
    import duckdb

    con = duckdb.connect()
    for t in ("events", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


SF = "/root/testdata/sf0.001"


def test_daily_events_gapfilled_spine_is_continuous(ray_session):
    from bioontologykg_ray.pipelines.queries import (
        SQL_DAILY_EVENTS_GAPFILLED,
        q_daily_events_gapfilled,
    )

    got = q_daily_events_gapfilled(SF)
    days = pd.to_datetime(got["day"])
    # contiguous spine: every calendar day between min and max present once
    assert (days.diff().dropna() == pd.Timedelta(days=1)).all()
    want = _oracle(SF, SQL_DAILY_EVENTS_GAPFILLED).sort_values("day")
    pd.testing.assert_frame_equal(
        got.sort_values("day").reset_index(drop=True),
        want.reset_index(drop=True),
        check_dtype=False,
    )


def test_daily_active_cumulative_monotone(ray_session):
    from bioontologykg_ray.pipelines.queries import q_daily_active_cumulative

    got = q_daily_active_cumulative(SF)
    assert (np.diff(got["cum_users"].to_numpy()) > 0).all() or len(got) == 1
    # last cumulative value == total distinct users
    import duckdb

    n = _oracle(SF, "SELECT count(DISTINCT user_id) AS n FROM events")["n"].iloc[0]
    assert got["cum_users"].iloc[-1] == n


def test_k_anonymity_flag_threshold(ray_session):
    from bioontologykg_ray.pipelines.queries import q_quasi_id_k_anonymity

    got = q_quasi_id_k_anonymity(SF)
    assert (got["k_anonymous"] == (got["n_rows"] >= 5)).all()
    # group sizes sum to the table row count
    n = _oracle(SF, "SELECT count(*) AS n FROM customer")["n"].iloc[0]
    assert got["n_rows"].sum() == n
