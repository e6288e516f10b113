"""Property-style randomized cross-checks: distributed operators vs
brute-force pandas references, and engine hashing vs DuckDB kernels
(the SQL-oracle contracts, verified without the conformance harness)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _random_events(seed: int, n: int = 400, users: int = 12) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.randint(0, 3_600_000, size=n), unit="s"
    )
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.randint(0, users, size=n).astype(np.int64),
            "event_type": rng.choice(["purchase", "signup", "error"], size=n),
        }
    )


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_asof_join_matches_bruteforce(seed):
    from bioontologykg_ray.stages.windows import asof_join_prior

    df = _random_events(seed)
    out = (
        asof_join_prior(rd.from_pandas(df).repartition(5), "purchase", "signup")
        .to_pandas().set_index("event_id").sort_index()
    )
    purchases = df[df["event_type"] == "purchase"]
    signups = df[df["event_type"] == "signup"]
    assert len(out) == len(purchases)
    for _, p in purchases.iterrows():
        cand = signups[
            (signups["user_id"] == p["user_id"]) & (signups["ts"] <= p["ts"])
        ].sort_values(["ts", "event_id"])
        got = out.loc[p["event_id"], "right_event_id"]
        if cand.empty:
            assert pd.isna(got)
        else:
            assert got == cand.iloc[-1]["event_id"]


@pytest.mark.parametrize("seed", [4, 5])
def test_range_count_matches_bruteforce(seed):
    from bioontologykg_ray.stages.windows import range_count_after

    df = _random_events(seed)
    w_us = 600 * 1_000_000
    out = (
        range_count_after(
            rd.from_pandas(df).repartition(4), "signup", "error", window_s=600
        )
        .to_pandas().set_index("event_id").sort_index()
    )
    us = df["ts"].astype("datetime64[ns]").astype("int64") // 1000
    df = df.assign(us=us)
    signups = df[df["event_type"] == "signup"]
    errors = df[df["event_type"] == "error"]
    assert len(out) == len(signups)
    for _, s in signups.iterrows():
        n = int(
            (
                (errors["user_id"] == s["user_id"])
                & (errors["us"] > s["us"])
                & (errors["us"] <= s["us"] + w_us)
            ).sum()
        )
        assert int(out.loc[s["event_id"], "n_right"]) == n


def test_simhash_and_rolling_match_duckdb_kernels():
    """The two hash contracts the SQL oracles rely on, checked directly:
    md5_low64 == md5_number_lower, and the engine's rolling min-hash ==
    the SQL polynomial-lattice formulation, on random-ish strings."""
    import bioontologykg_ray.functions.hashing as H
    from bioontologykg_ray.functions.textstats import rolling_min_hash

    rng = np.random.RandomState(7)
    words = ["alpha", "beta", "x1", "Zz", "kinase-9", "...", "a'b"]
    texts = [
        " ".join(rng.choice(words, size=rng.randint(0, 30)))
        for _ in range(40)
    ] + ["", "short", "x" * 15, "y" * 16, "z" * 17]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    toks = con.sql(
        "SELECT doc_id, md5_number_lower(unnest(regexp_extract_all(text, '\\S+'))) AS h FROM t"
    ).df()
    for did, g in toks.groupby("doc_id"):
        eng = [H.md5_low64(tk) for tk in texts[did].split()]
        assert [int(x) for x in g["h"]] == eng
    roll = con.sql("""
WITH RECURSIVE pw(j, p) AS (
  SELECT 0, 1::UBIGINT UNION ALL SELECT j + 1, (p * 257) % 2147483647 FROM pw WHERE j < 15),
d AS (SELECT doc_id, text, length(text) AS n FROM t),
win AS (SELECT doc_id, i.i, least(16, n) AS k FROM d,
        LATERAL (SELECT unnest(generate_series(1, greatest(n - 16 + 1, 1))) AS i) i),
ch AS (SELECT w.doc_id, w.i, j.j, ord(substr(d.text, w.i + j.j, 1))::UBIGINT AS c, w.k
       FROM win w JOIN d USING (doc_id),
            LATERAL (SELECT unnest(generate_series(0, w.k - 1)) AS j) j),
h AS (SELECT doc_id, i, sum(c * p.p) % 2147483647 AS hv
      FROM ch JOIN pw p ON p.j = ch.k - 1 - ch.j GROUP BY doc_id, i)
SELECT d.doc_id, CAST(coalesce(min(h.hv), 0) AS BIGINT) AS fp
FROM d LEFT JOIN h USING (doc_id) GROUP BY d.doc_id
""").df().set_index("doc_id")["fp"]
    for did, text in enumerate(texts):
        assert int(roll.loc[did]) == rolling_min_hash(text)


@pytest.mark.parametrize("seed", [11, 12])
def test_cogroup_attach_matches_pandas_merge(seed):
    from bioontologykg_ray.stages.joins import cogroup_attach

    rng = np.random.RandomState(seed)
    left = pd.DataFrame(
        {
            "a": rng.randint(0, 30, size=200).astype(np.int64),
            "b": rng.randint(0, 1000, size=200).astype(np.int64),
        }
    )
    keys = np.arange(0, 30, 2, dtype=np.int64)  # only even keys have payload
    payload = pd.DataFrame({"doc_id": keys, "sz": (keys * 7).astype(np.int64)})
    i64 = pa.int64()
    empty = pd.DataFrame({c: pd.Series(dtype=np.int64) for c in ("a", "b", "sz")})
    out = (
        cogroup_attach(
            rd.from_pandas(left).repartition(6), "a", {"a": i64, "b": i64},
            rd.from_pandas(payload).repartition(3), "doc_id", {"sz": i64},
            fills={"a": -1, "b": -1, "sz": -1},
            post=lambda df: df.astype(np.int64) if not df.empty else empty.copy(),
            empty_out=empty,
        )
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    want = (
        left.merge(payload.rename(columns={"doc_id": "a"}), on="a", how="inner")
        .sort_values(["a", "b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_word_ngram_kernel_matches_duckdb(seed):
    """The decontamination n-gram kernel (vectorized shifted-concat +
    md5_low64) against DuckDB's array_to_string n-gram construction +
    md5_number_lower — the exact contract SQL_DECONTAMINATE relies on."""
    from bioontologykg_ray.stages.curation import _word_ngram_hashes

    rng = np.random.RandomState(seed)
    vocab = ["aa", "b", "ccc", "dd", "e", "longword", "x1"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(0, 12)))
        for _ in range(60)
    ]
    for n in (2, 3, 5):
        rows, h = _word_ngram_hashes(pd.Series(texts), n)
        got = sorted(zip(rows.tolist(), (int(x) for x in h)))
        sql = duckdb.sql(
            f"""
            WITH d AS (
              SELECT i, string_split_regex(trim(t), '\\s+') AS l
              FROM (SELECT unnest(range(len($texts))) AS i,
                           unnest($texts) AS t)
              WHERE trim(t) <> ''),
            ng AS (
              SELECT DISTINCT i,
                md5_number_lower(array_to_string(l[j:j+{n-1}], ' ')) AS h
              FROM d, UNNEST(generate_series(1, len(l) - {n-1})) AS t(j))
            SELECT i, h FROM ng ORDER BY i, h
            """,
            params={"texts": texts},
        ).fetchall()
        want = [(int(a), int(b)) for a, b in sql]
        assert got == want, f"n={n}"


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_pii_regexes_match_duckdb_re2(seed):
    """The PII rule strings behave identically under Python `re` (the
    engine) and DuckDB's RE2 (the oracle) — counts AND the sequentially
    redacted text — on adversarial near-miss inputs. The exact contract
    SQL_PII_REDACTION relies on."""
    import re as _re

    from bioontologykg_ray.stages.curation import PII_RULES

    rng = np.random.RandomState(seed)
    frags = [
        "a@b.co", "a@b.c", "user.name+x@mail.example.com", "x@1.2.3.4",
        "555-123-4567", "5555-123-4567", "555-123-45678", "1-555-123-4567",
        "1.2.3.4", "999.999.999.999", "1.2.3", "10.0.0.1.5", "3.14",
        "v1.2.3.4beta", "word", "a-b", "@", ".", "e@e.ee.", "-",
    ]
    texts = [
        " ".join(rng.choice(frags, size=rng.randint(0, 10))) for _ in range(80)
    ]
    for text in texts:
        py, sql_expr = text, "t"
        py_counts = []
        for _name, pat, repl in PII_RULES:
            py_counts.append(len(_re.findall(pat, py)))
            py = _re.sub(pat, repl, py)
            sql_expr = f"regexp_replace({sql_expr}, '{pat}', '{repl}', 'g')"
        count_exprs = []
        inner = "t"
        for _name, pat, _repl in PII_RULES:
            count_exprs.append(f"len(regexp_extract_all({inner}, '{pat}'))")
            inner = f"regexp_replace({inner}, '{pat}', '{_repl}', 'g')"
        row = duckdb.sql(
            f"SELECT {sql_expr}, {', '.join(count_exprs)} FROM (SELECT $t AS t)",
            params={"t": text},
        ).fetchone()
        assert row[0] == py, f"redacted text diverges on {text!r}"
        assert list(row[1:]) == py_counts, f"counts diverge on {text!r}"


@pytest.mark.parametrize("seed", [31, 32])
def test_triangle_counts_match_adjacency_bruteforce(seed):
    """Random G(n, p): distributed triangle counts equal the dense
    adjacency-matrix count diag(A^3)/2 per node."""
    import ray.data as rd

    from bioontologykg_ray.stages.graph import triangle_counts

    rng = np.random.RandomState(seed)
    n = 30
    A = (rng.rand(n, n) < 0.2).astype(np.int64)
    A = np.triu(A, 1)
    A = A + A.T
    edges = [(int(u), int(v)) for u, v in zip(*np.nonzero(np.triu(A, 1)))]
    ds = rd.from_items([{"u": u, "v": v} for u, v in edges]).repartition(3)
    out = triangle_counts(ds).to_pandas()
    got = dict(zip(out["node"], out["n_triangles"]))
    per_node = np.diag(A @ A @ A) // 2
    want = {i: int(c) for i, c in enumerate(per_node) if c > 0}
    assert got == want


@pytest.mark.parametrize("seed", [41, 42])
def test_pagerank_fixedpoint_matches_bruteforce(seed):
    """Random digraph (with dangling nodes and duplicate edge rows):
    the distributed fixed-point PageRank equals a dict-based replay of
    the documented integer recurrence."""
    import ray.data as rd

    from bioontologykg_ray.stages.graph import pagerank_fixedpoint

    rng = np.random.RandomState(seed)
    n = 25
    raw = [
        (f"n{rng.randint(n)}", f"n{rng.randint(n)}")
        for _ in range(80)
    ]
    raw = [(s, d) for s, d in raw if s != d]
    raw += raw[:7]  # duplicate rows must collapse
    ds = rd.from_items([{"src": s, "dst": d} for s, d in raw]).repartition(4)

    dedup = sorted(set(raw))
    nodes = sorted({x for e in dedup for x in e})
    od = {u: sum(1 for s, _ in dedup if s == u) for u in nodes}
    r = {u: 1_000_000 for u in nodes}
    for _ in range(3):
        c = {u: 0 for u in nodes}
        for s, d in dedup:
            c[d] += r[s] // od[s]
        r = {u: 150_000 + (85 * c[u]) // 100 for u in nodes}

    out = pagerank_fixedpoint(ds).to_pandas()
    got = dict(zip(out["node"], out["pagerank_fp"]))
    assert got == r


@pytest.mark.parametrize("n,shards", [(97, 4), (64, 8)])
def test_global_shuffle_is_bijective(n, shards):
    """(shard, pos_in_shard) is a bijection onto global slots 0..n-1,
    shards are balanced to within one row, and the global order is the
    hash order."""
    import ray.data as rd

    from bioontologykg_ray.functions.hashing import md5_low64
    from bioontologykg_ray.stages.curation import global_shuffle

    ds = rd.from_items([{"doc_id": i} for i in range(n)]).repartition(5)
    out = global_shuffle(ds, n_shards=shards).to_pandas()
    slots = (out["pos_in_shard"] * shards + out["shard"]).to_numpy()
    assert sorted(slots) == list(range(n))
    sizes = out.groupby("shard").size()
    assert sizes.max() - sizes.min() <= 1
    by_slot = out.assign(slot=slots).sort_values("slot")["doc_id"].tolist()
    want = sorted(range(n), key=lambda i: md5_low64(str(i)))
    assert by_slot == want
