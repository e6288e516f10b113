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
            .groupby(["user_id", "window"], as_index=False)
            .agg(n=("value", "size"), value_sum=("value", "sum"))
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["user_id", "window"], as_index=False).agg(
            n=("n", "sum"), value_sum=("value_sum", "sum")
        )
        out["value_sum"] = out["value_sum"].round(3)
        out["n"] = out["n"].astype(np.int64)
        return out

    return two_phase_agg(ds, partial, combine)


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
