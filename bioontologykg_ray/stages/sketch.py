"""Mergeable distinct-count sketch (HyperLogLog) as a Ray Data
two-phase combine.

The reference counts distinct keys with exact Cypher aggregation over
an indexed store (SURVEY A1 — e.g. distinct gene/term ids during
import QA). At 100 TB an exact global distinct is a full shuffle of
every key; the mergeable-sketch form ships ONE bounded register array
per batch instead: per-batch partials emit (bucket, rho) maxima —
at most 2^p rows per batch regardless of batch size — and the global
combine is an elementwise max, associative and order-independent, so
Ray can tree-combine partials in any order. Flajolet et al. 2007
(HyperLogLog) with the standard small-range (linear counting) and
large-range corrections.

Determinism / oracle contract: the hash is ``md5_low64`` (bit-equal to
DuckDB's ``md5_number_lower``), bucket = h >> (64-p), and
rho = number of leading zeros of the remaining (64-p)-bit suffix + 1 —
all integer arithmetic, so the full register table is replayable
exactly in SQL (``rho = CASE WHEN w = 0 THEN 64-p+1 ELSE 64-p+1 -
length(bin(w)) END``). The float estimate is derived driver-side from
the integer registers in O(2^p).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from bioontologykg_ray.functions.hashing import md5_low64
from bioontologykg_ray.stages.agg import grouped_agg


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (float log2 is inexact past
    2^53 — six masked binary-search steps stay exact)."""
    w = w.copy()
    out = np.zeros(w.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        m = w >= (np.uint64(1) << np.uint64(shift))
        out[m] += shift
        w[m] >>= np.uint64(shift)
    out[w > 0] += 1
    return out


def _bucket_rho(values: pd.Series, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Shared HLL kernel: md5_low64 hash → (bucket, rho) arrays."""
    h = np.fromiter(
        (md5_low64(str(v)) for v in values), dtype=np.uint64, count=len(values)
    )
    width = 64 - p
    bucket = (h >> np.uint64(width)).astype(np.int64)
    w = h & np.uint64((1 << width) - 1)
    rho = (width + 1 - _bit_length_u64(w)).astype(np.int64)  # w=0 → width+1
    return bucket, rho


def hll_partial(values: pd.Series, p: int = 12) -> pd.DataFrame:
    """(bucket, rho) maxima for one batch — ≤ 2^p rows."""
    bucket, rho = _bucket_rho(values, p)
    df = pd.DataFrame({"bucket": bucket, "rho": rho})
    return df.groupby("bucket", as_index=False)["rho"].max()


def hll_registers(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> ray.data.Dataset:
    """Global HLL register table for a column: one (bucket, rho) row per
    non-empty bucket. The shuffle moves ≤ 2^p rows per batch."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return hll_partial(df[col], p=p)

    return grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["bucket"],
        {"rho": ("rho", "max")},
    )


def hll_registers_by(
    ds: ray.data.Dataset, group_col: str, col: str, p: int = 12
) -> ray.data.Dataset:
    """GROUPED HLL register tables: one (group, bucket, rho) row per
    non-empty bucket per group — approximate COUNT(DISTINCT col) GROUP BY
    group_col as a mergeable sketch. Per-batch partials are vectorized
    across ALL groups at once (one hash pass + one grouped max); the
    exchange moves ≤ #groups × 2^p rows per batch regardless of data
    size — the sketch alternative to an exact grouped distinct when the
    group count is modest but per-group key cardinality is huge.
    Per-group estimates come from ``hll_estimate`` over each group's
    slice."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bucket, rho = _bucket_rho(df[col], p)
        out = pd.DataFrame(
            {group_col: df[group_col].to_numpy(), "bucket": bucket, "rho": rho}
        )
        return out.groupby([group_col, "bucket"], as_index=False)["rho"].max()

    return grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        [group_col, "bucket"],
        {"rho": ("rho", "max")},
    )


def hll_estimate(registers: pd.DataFrame, p: int = 12) -> float:
    """Distinct-count estimate from a (bucket, rho) register table,
    with the standard HLL range corrections."""
    m = 1 << p
    reg = np.zeros(m, dtype=np.int64)
    reg[registers["bucket"].to_numpy()] = registers["rho"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.sum(reg == 0))
        if zeros:
            return m * np.log(m / zeros)  # linear counting
    # NOTE: no large-range correction — that correction compensates for
    # 32-BIT hash saturation; md5_low64 is 64-bit, which never saturates
    # at attainable cardinalities (applying it would inflate estimates
    # above ~143M and NaN past 2^32).
    return float(est)


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable heavy-hitter frequency registers
# ---------------------------------------------------------------------------

def cms_partial(values: pd.Series, depth: int = 4, width: int = 1024) -> pd.DataFrame:
    """(row, cell, cnt) partial counts for one batch — ≤ depth*width
    rows regardless of batch size. Hash_j(v) = md5_low64(f"{j}:{v}") %
    width (bit-equal to DuckDB md5_number_lower, so the whole register
    table is SQL-replayable)."""
    parts = []
    svals = values.astype(str)
    for j in range(depth):
        cell = np.fromiter(
            (md5_low64(f"{j}:{v}") % width for v in svals),
            dtype=np.int64, count=len(svals),
        )
        c = pd.Series(cell).value_counts()
        parts.append(
            pd.DataFrame(
                {
                    "row": np.full(len(c), j, dtype=np.int64),
                    "cell": c.index.to_numpy(np.int64),
                    "cnt": c.to_numpy(np.int64),
                }
            )
        )
    return pd.concat(parts, ignore_index=True)


def cms_registers(
    ds: ray.data.Dataset, col: str, depth: int = 4, width: int = 1024
) -> ray.data.Dataset:
    """Global count-min register table: (row, cell, cnt) with cnt summed
    over the whole column. Mergeable (elementwise sum — associative and
    order-free, so Ray tree-combines partials); the exchange moves
    ≤ depth*width rows per batch — the bounded-sketch alternative to an
    exact all-to-all frequency count at 100 TB. Cormode & Muthukrishnan
    2005. Integer-exact registers → exact SQL oracle; the (over-)
    estimate for a key is min_j(reg[j][hash_j(key)]), derived from the
    registers in O(depth)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return cms_partial(df[col], depth=depth, width=width)

    return grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["row", "cell"],
        {"cnt": ("cnt", "sum")},
    )


def cms_estimate(
    registers: pd.DataFrame, key, depth: int = 4, width: int = 1024
) -> int:
    """Point frequency (over-)estimate for one key: min over rows.
    Probes only the ``depth`` addressed cells (no full-table scan per
    query — batch callers should still prebuild their own lookup)."""
    if depth < 1:
        raise ValueError("depth must be >= 1")
    rows = registers["row"].to_numpy()
    cells = registers["cell"].to_numpy()
    cnts = registers["cnt"].to_numpy()
    est = None
    for j in range(depth):
        cell = md5_low64(f"{j}:{key}") % width
        hit = cnts[(rows == j) & (cells == cell)]
        v = int(hit[0]) if len(hit) else 0
        est = v if est is None else min(est, v)
    return int(est)


# ---------------------------------------------------------------------------
# mergeable equi-depth quantile summary (deterministic)
# ---------------------------------------------------------------------------

_QSUMMARY_EMPTY = pd.DataFrame(
    {
        "q_value": pd.Series(dtype=np.float64),
        "q_weight": pd.Series(dtype=np.float64),
    }
)


def quantile_summary_partial(values: pd.Series, k: int = 256) -> pd.DataFrame:
    """Per-block equi-depth quantile summary: sort the block's values
    and emit ``m = min(k, n)`` pivots at the midpoints of m equal-mass
    strata, each carrying weight n/m.  Deterministic (no sampling), and
    the block's summary mis-ranks any threshold by at most n/(2k) rows
    (half a stratum).  Summaries merge by CONCATENATION — weights add —
    so the merged rank error is additive: ≤ N/(2k) total, independent
    of block count or merge order (the mergeability property KLL/GK
    sketches trade determinism for; this is the deterministic
    equi-depth variant).  One bounded row-set per block: ≤ k rows
    regardless of block size."""
    v = values.to_numpy(np.float64)
    v = np.sort(v[~np.isnan(v)])
    n = len(v)
    if n == 0:
        return _QSUMMARY_EMPTY.copy()
    m = min(int(k), n)
    idx = np.minimum(((np.arange(m) + 0.5) * n / m).astype(np.int64), n - 1)
    return pd.DataFrame(
        {"q_value": v[idx], "q_weight": np.full(m, n / m, np.float64)}
    )


def quantile_summary_query(
    summary: pd.DataFrame, qs: "list[float]"
) -> pd.DataFrame:
    """Evaluate quantiles from a merged (q_value, q_weight) summary:
    sort by value, walk cumulative weight, return the first pivot whose
    cumulative mass reaches q·W (lower quantile convention)."""
    if summary.empty:
        return pd.DataFrame({"q": qs, "value": [np.nan] * len(qs)})
    s = summary.sort_values("q_value")
    vals = s["q_value"].to_numpy(np.float64)
    cum = s["q_weight"].to_numpy(np.float64).cumsum()
    total = cum[-1]
    pos = np.searchsorted(cum, np.asarray(qs, np.float64) * total, side="left")
    pos = np.minimum(pos, len(vals) - 1)
    return pd.DataFrame({"q": np.asarray(qs, np.float64), "value": vals[pos]})
