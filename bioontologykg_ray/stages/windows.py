"""Stream-shaped operators over the events log.

The reference has no true streaming (SURVEY.md §2.10), but its
deterministic-pagination + ordered-scan patterns map to the standard
Ray Data treatment of a log table: partition by key, sort by ts within
the partition, window with vectorized pandas inside ``map_groups``.
Ordering assumption: ts is unique enough per user that (ts, event_id)
is a total order — the tie-break is explicit everywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _window_combine(df: pd.DataFrame) -> pd.DataFrame:
    """Shared (user_id, window) partial combiner for tumbling/sliding.
    dropna=False: SQL GROUP BY keeps a NULL-user group — so do we."""
    out = df.groupby(["user_id", "window"], as_index=False, dropna=False).agg(
        n=("n", "sum"), value_sum=("value_sum", "sum")
    )
    out["value_sum"] = out["value_sum"].round(3)
    out["n"] = out["n"].astype(np.int64)
    return out


def tumbling_window_agg(ds: ray.data.Dataset, width_s: int = 3600) -> ray.data.Dataset:
    """Per (user_id, window) count + value sum; window = floor(epoch/width).
    Pure map-side bucketing + one pre-aggregated groupby — no per-group
    Python at all."""

    from bioontologykg_ray.stages.agg import two_phase_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts_ns = df["ts"].astype("datetime64[ns]").astype("int64")
        w = (ts_ns // (width_s * 1_000_000_000)).astype(np.int64)
        return (
            pd.DataFrame({"user_id": df["user_id"], "window": w, "value": df["value"]})
            .groupby(["user_id", "window"], as_index=False, dropna=False)
            .agg(n=("value", "size"), value_sum=("value", "sum"))
        )

    return two_phase_agg(ds, partial, _window_combine)


def sliding_window_agg(
    ds: ray.data.Dataset, width_s: int = 3600, slide_s: int = 900
) -> ray.data.Dataset:
    """Per (user_id, window) count + value sum for SLIDING event-time
    windows: width ``width_s``, hop ``slide_s`` (width must be a
    multiple of slide). An event at t belongs to the width/slide
    consecutive windows ending at or after it — the map side EXPLODES
    each event to its window indices (batch-local numpy repeat, output
    ×(width/slide)) and pre-aggregates before the keyed combine, so the
    exchange moves per-(user, window) partials, never the exploded rows.
    Window k covers [k*slide, k*slide + width)."""
    if width_s % slide_s:
        raise ValueError("width_s must be a multiple of slide_s")
    k = width_s // slide_s

    from bioontologykg_ray.stages.agg import two_phase_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts_ns = df["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        last = ts_ns // (slide_s * 1_000_000_000)  # newest window holding t
        win = np.repeat(last, k) - np.tile(np.arange(k, dtype=np.int64), len(last))
        return (
            pd.DataFrame(
                {
                    "user_id": np.repeat(df["user_id"].to_numpy(), k),
                    "window": win,
                    "value": np.repeat(df["value"].to_numpy(), k),
                }
            )
            .groupby(["user_id", "window"], as_index=False, dropna=False)
            .agg(n=("value", "size"), value_sum=("value", "sum"))
        )

    return two_phase_agg(ds, partial, _window_combine)


def session_counts(ds: ray.data.Dataset, gap_s: int = 1800) -> ray.data.Dataset:
    """#sessions per user with a session gap of ``gap_s`` seconds —
    groupby(user).map_groups over the ts-sorted group (lag + threshold),
    mirroring the SQL lag()/cumsum window formulation."""

    from bioontologykg_ray.stages.agg import sorted_group_apply

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        # complete user groups per chunk (sorted-block contract);
        # session starts computed vectorized across ALL users at once
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = df["ts"].astype("datetime64[ns]").astype("int64")
        same_user = df["user_id"].eq(df["user_id"].shift())
        gap = (ts.diff() > gap_s * 1_000_000_000) & same_user
        out = (
            df.assign(__gap=gap.astype(np.int64))
            .groupby("user_id", as_index=False)
            .agg(n_events=("user_id", "size"), __gaps=("__gap", "sum"))
        )
        out["n_sessions"] = (1 + out["__gaps"]).astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out[["user_id", "n_events", "n_sessions"]]

    empty = pd.DataFrame(
        {"user_id": pd.Series(dtype=np.int64),
         "n_events": pd.Series(dtype=np.int64),
         "n_sessions": pd.Series(dtype=np.int64)}
    )
    return sorted_group_apply(ds, "user_id", apply, empty)


def asof_join_prior(
    ds: ray.data.Dataset,
    left_type: str,
    right_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """AS-OF JOIN — an operator Ray Data lacks natively: for every
    ``left_type`` event, attach the most recent prior-or-equal
    ``right_type`` event of the SAME user (classic backward as-of;
    e.g. purchase → its governing signup). Partitioning assumption: one
    range sort on the user key gives complete user groups per block
    (stages/agg.sorted_group_apply contract); within a block the match
    is ONE vectorized ``pd.merge_asof(by=user)`` — no per-user Python.
    Ties (equal ts) resolve to the highest event_id, mirrored exactly
    by the SQL oracle's ORDER BY ts DESC, event_id DESC LIMIT 1."""

    empty = pd.DataFrame(
        {
            "event_id": pd.Series(dtype=np.int64),
            "user_id": pd.Series(dtype=np.int64),
            "ts_us": pd.Series(dtype=np.int64),
            "right_event_id": pd.Series(dtype="Int64"),
            "right_ts_us": pd.Series(dtype="Int64"),
        }
    )

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        left = df.loc[df["event_type"] == left_type,
                      [user_col, ts_col, "event_id"]]
        right = df.loc[df["event_type"] == right_type,
                       [user_col, ts_col, "event_id"]].rename(
            columns={"event_id": "right_event_id"}
        )
        if left.empty:
            return empty.copy()
        right = right.rename(columns={ts_col: "r_ts"})
        # nullable Int64 BEFORE the merge: unmatched lefts otherwise
        # coerce right_event_id through float64 (lossy above 2^53)
        right["right_event_id"] = right["right_event_id"].astype("Int64")
        left = left.sort_values([ts_col, "event_id"], kind="mergesort")
        right = right.sort_values(["r_ts", "right_event_id"], kind="mergesort")
        m = pd.merge_asof(
            left, right, left_on=ts_col, right_on="r_ts", by=user_col,
            direction="backward", allow_exact_matches=True,
        )
        r_ns = m["r_ts"].astype("datetime64[ns]")
        # numpy view, not Series.view (deprecated in pandas 2.2,
        # removed in 3.0); NaT's sentinel is masked right after
        r_i8 = r_ns.to_numpy(dtype="datetime64[ns]").view("i8")
        r_us = pd.Series(r_i8 // 1000, index=m.index, dtype="Int64").mask(r_ns.isna())
        return pd.DataFrame(
            {
                "event_id": m["event_id"].to_numpy(np.int64),
                "user_id": m[user_col].to_numpy(np.int64),
                "ts_us": (
                    m[ts_col].astype("datetime64[ns]").astype("int64") // 1000
                ),
                "right_event_id": m["right_event_id"].astype("Int64"),
                "right_ts_us": r_us,
            }
        )

    from bioontologykg_ray.stages.agg import sorted_group_apply

    return sorted_group_apply(ds, user_col, apply, empty)


def range_count_after(
    ds: ray.data.Dataset,
    left_type: str,
    right_type: str,
    window_s: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """RANGE (interval) JOIN — count, per ``left_type`` event, the same
    user's ``right_type`` events in the window (t, t + window_s]. Built
    without any per-pair work: the right stream carries a per-user
    cumulative count, and two vectorized backward ``merge_asof`` probes
    (at t + w and at t) difference to the interval count — the standard
    prefix-sum formulation of a range join. One user-key range sort;
    complete user groups per block (sorted_group_apply contract)."""

    empty = pd.DataFrame(
        {
            "event_id": pd.Series(dtype=np.int64),
            "user_id": pd.Series(dtype=np.int64),
            "ts_us": pd.Series(dtype=np.int64),
            "n_right": pd.Series(dtype=np.int64),
        }
    )
    w_us = window_s * 1_000_000

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.copy()
        d = df.copy()
        d["ts_us"] = d[ts_col].astype("datetime64[ns]").astype("int64") // 1000
        left = d.loc[d["event_type"] == left_type, [user_col, "ts_us", "event_id"]]
        if left.empty:
            return empty.copy()
        right = d.loc[d["event_type"] == right_type, [user_col, "ts_us"]].rename(
            columns={"ts_us": "r_us"}
        )
        right = right.sort_values([user_col, "r_us"], kind="mergesort")
        right["cum"] = right.groupby(user_col).cumcount() + 1
        right = right.sort_values(["r_us", "cum"], kind="mergesort")

        def probe(at: pd.Series) -> np.ndarray:
            probe_df = pd.DataFrame(
                {user_col: left[user_col].to_numpy(), "k": at.to_numpy(),
                 "event_id": left["event_id"].to_numpy()}
            ).sort_values(["k", "event_id"], kind="mergesort")
            m = pd.merge_asof(
                probe_df, right[[user_col, "r_us", "cum"]],
                left_on="k", right_on="r_us", by=user_col,
                direction="backward", allow_exact_matches=True,
            )
            return (
                m.set_index("event_id")["cum"].fillna(0).astype(np.int64)
            )

        hi = probe(left["ts_us"] + w_us)
        lo = probe(left["ts_us"])
        n = (hi - lo).reindex(left["event_id"].to_numpy()).to_numpy()
        return pd.DataFrame(
            {
                "event_id": left["event_id"].to_numpy(np.int64),
                "user_id": left[user_col].to_numpy(np.int64),
                "ts_us": left["ts_us"].to_numpy(np.int64),
                "n_right": n.astype(np.int64),
            }
        )

    from bioontologykg_ray.stages.agg import sorted_group_apply

    return sorted_group_apply(ds, user_col, apply, empty)
