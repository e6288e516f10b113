"""Unit tests for the distributed stage library: aggregation strategies,
joins, windows, near-dup, ANN, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from bioontologykg_ray.stages.agg import (
    grouped_agg,
    grouped_count,
    grouped_distinct,
    sorted_group_apply,
    two_phase_agg,
)
from bioontologykg_ray.stages import joins as J
from bioontologykg_ray.stages import multimodal as MM
from bioontologykg_ray.stages import windows as W
from bioontologykg_ray.stages.dedup import dedup_first_by_key


def _events_df(n=500, seed=3):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "user_id": rng.randint(0, 20, n),
            "event_id": np.arange(n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(np.sort(rng.randint(0, 86400 * 3, n)), unit="s"),
            "value": rng.uniform(0, 10, n).round(2),
            "key": rng.randint(0, 37, n),
        }
    )


def test_grouped_agg_matches_pandas():
    df = _events_df()
    ds = rd.from_pandas(df).repartition(7)
    out = grouped_agg(
        ds, ["user_id"],
        {"n": ("value", "count"), "s": ("value", "sum"),
         "m": ("value", "mean"), "mx": ("value", "max")},
    ).to_pandas().sort_values("user_id").reset_index(drop=True)
    want = (
        df.groupby("user_id", as_index=False)
        .agg(n=("value", "size"), s=("value", "sum"),
             m=("value", "mean"), mx=("value", "max"))
        .sort_values("user_id").reset_index(drop=True)
    )
    want["n"] = want["n"].astype("int64")
    pd.testing.assert_frame_equal(out, want, check_like=True, atol=1e-9)


def test_grouped_agg_global():
    df = _events_df()
    ds = rd.from_pandas(df).repartition(5)
    out = grouped_agg(ds, [], {"n": ("value", "count"), "s": ("value", "sum")}).to_pandas()
    assert len(out) == 1
    assert out["n"][0] == len(df)
    assert out["s"][0] == pytest.approx(df["value"].sum())


def test_sorted_group_apply_exact_with_hot_keys():
    """Keys straddling block boundaries (incl. a hot key spanning many
    blocks) must be aggregated exactly once."""
    rng = np.random.RandomState(7)
    keys = np.concatenate([rng.randint(0, 50, 2000), np.full(3000, 25)])  # hot key 25
    df = pd.DataFrame({"k": [f"key-{x:03d}" for x in keys], "v": np.ones(len(keys), np.int64)})
    ds = rd.from_pandas(df).repartition(11)

    def apply(d: pd.DataFrame) -> pd.DataFrame:
        return d.groupby("k", as_index=False)["v"].sum()

    out = sorted_group_apply(ds, "k", apply).to_pandas()
    got = out.groupby("k")["v"].sum().to_dict()  # second groupby = safety net only
    want = df.groupby("k")["v"].sum().to_dict()
    # each key must appear EXACTLY once in the output (no double counting)
    assert out["k"].is_unique
    assert got == want


def test_grouped_count_sorted_combine():
    df = _events_df(2000)
    ds = rd.from_pandas(df).repartition(9)
    out = grouped_count(ds, ["key"], sorted_combine=True).to_pandas()
    want = df.groupby("key").size()
    assert out["key"].is_unique
    assert dict(zip(out["key"], out["n"])) == want.to_dict()


def test_dedup_first_by_key():
    df = _events_df(300)
    ds = rd.from_pandas(df).repartition(6)
    out = dedup_first_by_key(ds, ["user_id"], ["ts", "event_id"]).to_pandas()
    want = (
        df.sort_values(["ts", "event_id"]).drop_duplicates("user_id")
    )
    assert set(out["event_id"]) == set(want["event_id"])


def test_hash_join_matches_pandas_merge():
    left = pd.DataFrame({"k": [1, 2, 2, 3, 5], "l": ["a", "b", "c", "d", "e"]})
    right = pd.DataFrame({"k": [2, 2, 3, 4], "r": [10, 20, 30, 40]})
    out = (
        J.hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k", num_buckets=4)
        .to_pandas()
        .sort_values(["k", "l", "r"])
        .reset_index(drop=True)
    )
    want = left.merge(right, on="k").sort_values(["k", "l", "r"]).reset_index(drop=True)
    # hash_join floats the key through NaN padding; compare values loosely
    assert len(out) == len(want)
    assert out["r"].astype(int).tolist() == want["r"].tolist()


def test_session_counts_crafted():
    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 02:00",  # user 1: 2 sessions
         "2024-01-01 05:00"]                                          # user 2: 1 session
    )
    df = pd.DataFrame({"user_id": [1, 1, 1, 2], "event_id": [0, 1, 2, 3], "ts": ts})
    out = W.session_counts(rd.from_pandas(df), gap_s=1800).to_pandas()
    d = out.set_index("user_id")
    assert d.loc[1, "n_sessions"] == 2 and d.loc[1, "n_events"] == 3
    assert d.loc[2, "n_sessions"] == 1


def test_multimodal_plumbing():
    docs = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2], "text": ["x" * 100, "y" * 300]}))
    media = MM.attach_payload(docs)
    meta = MM.decode_image_metadata(media).to_pandas().set_index("media_id")
    assert meta.loc[1, "width"] == 100 % 640 + 16
    assert meta.loc[1, "n_pixels"] == meta.loc[1, "width"] * meta.loc[1, "height"]
    frames = MM.sample_frames(MM.attach_payload(docs), stride=4).to_pandas()
    # doc 2: 300//64 = 4 frames, stride 4 → sampled frame 0 only
    assert len(frames[frames["media_id"] == 2]) == 1


def test_real_decoder_gated():
    with pytest.raises(NotImplementedError):
        MM.RealImageDecoder()


def test_ann_lsh_is_subset_quality():
    """LSH results must be drawn from the same scoring rule: every
    (query, vec) pair it returns appears in the brute-force full ranking
    with the same rounded cosine."""
    from bioontologykg_ray.stages.ann import ann_topk_bruteforce, ann_topk_lsh

    rng = np.random.RandomState(5)
    n, dim = 200, 16
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(emb)})
    ds = rd.from_pandas(df).repartition(4)
    bf = ann_topk_bruteforce(ds, [0, 1], k=200).to_pandas()  # full ranking
    lsh = ann_topk_lsh(ds, [0, 1], k=10, nbits=3, dim=dim).to_pandas()
    bf_cos = {(q, v): c for q, v, c in bf[["query_id", "vec_id", "cos"]].itertuples(index=False)}
    for q, v, c in lsh[["query_id", "vec_id", "cos"]].itertuples(index=False):
        assert bf_cos[(q, v)] == pytest.approx(c, abs=2e-6)


def test_cogroup_attach_inner_and_left():
    """Sort-based co-group attach: payload joined onto a keyed stream
    with zero driver state; inner drops missing keys, left keeps them."""
    pairs = rd.from_pandas(pd.DataFrame({"a": [1, 1, 2, 9], "b": [2, 3, 3, 9]}))
    payload = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2, 3], "sz": [10, 20, 30]}))
    i64 = pa.int64()
    empty = pd.DataFrame({c: pd.Series(dtype=np.int64) for c in ("a", "b", "sz")})
    out = J.cogroup_attach(
        pairs, "a", {"a": i64, "b": i64},
        payload, "doc_id", {"sz": i64},
        fills={"a": -1, "b": -1, "sz": -1},
        post=lambda df: df.astype(np.int64) if not df.empty else empty.copy(),
        empty_out=empty,
    ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    want = pd.DataFrame(
        {"a": [1, 1, 2], "b": [2, 3, 3], "sz": [10, 10, 20]}
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)

    def post_left(df):
        if df.empty:
            return empty.copy()
        df = df.copy()
        df["sz"] = df["sz"].fillna(-7)
        return df.astype(np.int64)

    out_l = J.cogroup_attach(
        pairs, "a", {"a": i64, "b": i64},
        payload, "doc_id", {"sz": i64},
        fills={"a": -1, "b": -1, "sz": -1},
        post=post_left, empty_out=empty, how="left",
    ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert out_l[out_l["a"] == 9]["sz"].tolist() == [-7]
    assert len(out_l) == 4


def test_prefix_sum_matches_pandas():
    """Distributed two-phase scan == pandas cumsum on the ordered frame,
    regardless of on-disk shuffle or block boundaries."""
    import numpy as np
    import pandas as pd
    import ray.data

    from bioontologykg_ray.stages.scan import pack_by_budget, prefix_sum

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {"k": rng.permutation(n), "v": rng.integers(1, 500, n).astype("int64")}
    )
    ds = ray.data.from_pandas(df).repartition(9)
    got = prefix_sum(ds, "k", "v", out_col="c").to_pandas().sort_values("k")
    want = df.sort_values("k").reset_index(drop=True)
    want["c"] = want["v"].cumsum().astype("float64")
    assert np.allclose(got["c"].to_numpy(), want["c"].to_numpy())

    packed = pack_by_budget(ds, "k", "v", budget=1000.0).to_pandas().sort_values("k")
    excl = want["c"].to_numpy() - want["v"].to_numpy()
    assert (packed["bin"].to_numpy() == np.floor(excl / 1000.0).astype("int64")).all()
    # bins are contiguous in k order and non-decreasing
    assert (np.diff(packed["bin"].to_numpy()) >= 0).all()


def test_repetition_frame_edges():
    import pandas as pd

    from bioontologykg_ray.functions.textstats import repetition_frame

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["solo", "a a a a", "x y x y x", "  spaced   out  "],
    })
    out = repetition_frame(df).set_index("doc_id")
    assert out.loc[1].tolist() == [1, 1, 1, 0, 0.0]
    # "a a a a": 4 tokens, 1 distinct, top token 4, top bigram "a a" ×3
    assert out.loc[2].tolist() == [4, 1, 4, 3, 0.75]
    # "x y x y x": top bigram "x y" ×2
    r3 = out.loc[3]
    assert (r3["n_tokens"], r3["n_distinct"], r3["top_token_n"],
            r3["top_bigram_n"]) == (5, 2, 3, 2)
    assert out.loc[4]["n_tokens"] == 2  # whitespace runs collapse


def test_exact_quantiles_matches_rank_rule():
    import math

    import numpy as np
    import pandas as pd
    import ray.data

    from bioontologykg_ray.stages.agg import exact_quantiles

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50, 997).astype("int64")  # heavy ties
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(7)
    qs = [0.01, 0.1, 0.5, 0.9, 0.99, 1.0]
    out = exact_quantiles(ds, "v", qs).set_index("q")
    srt = np.sort(vals)
    for q in qs:
        assert out.loc[q, "value"] == srt[math.ceil(q * len(vals)) - 1]


def test_hll_estimate_accuracy():
    """HLL estimate within ~3*1.04/sqrt(m) of the exact distinct count
    across cardinality regimes (linear-counting and raw ranges)."""
    import numpy as np
    import pandas as pd

    from bioontologykg_ray.stages.sketch import hll_estimate, hll_partial

    m = 1 << 12
    rse = 1.04 / np.sqrt(m)  # ~1.6%
    for n in (100, 3_000, 50_000):
        vals = pd.Series([f"user-{i}" for i in range(n)])
        regs = hll_partial(vals, p=12)
        est = hll_estimate(regs, p=12)
        assert abs(est - n) / n < 3 * rse + 0.01, (n, est)


def test_hll_registers_merge_equals_single_pass(ray_session):
    """Distributed register table (many batches, tree combine) equals
    the single-pass partial — merge is exact, order-independent."""
    import pandas as pd
    import ray.data as rd

    from bioontologykg_ray.stages.sketch import hll_partial, hll_registers

    vals = [f"u{i % 700}" for i in range(5_000)]  # repeats across batches
    ds = rd.from_pandas(pd.DataFrame({"user_id": vals})).repartition(8)
    dist = (
        hll_registers(ds, "user_id", p=10)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    single = (
        hll_partial(pd.Series(vals), p=10)
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(dist, single)


def test_bloom_semi_join_exact_under_false_positives(ray_session):
    """bloom_semi_join equals the broadcast semi-join even with a TINY
    bitmap (high false-positive rate) — the residual hash join restores
    exactness; and the bloom prefilter actually drops rows map-side."""
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    from bioontologykg_ray.stages.joins import (
        bloom_bitmap, bloom_semi_join, semi_join, _bloom_positions,
    )

    rng_l = np.arange(20_000, dtype=np.int64)          # left keys 0..19999
    right_keys = np.arange(0, 20_000, 7, dtype=np.int64)  # every 7th
    left = rd.from_pandas(
        pd.DataFrame({"key": rng_l, "payload": rng_l * 2})
    ).repartition(6)
    right = rd.from_pandas(pd.DataFrame({"rk": right_keys})).repartition(4)

    out = (
        bloom_semi_join(left, "key", right, "rk", m_bits=1 << 12, k=3)
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    exact = (
        semi_join(left, set(right_keys.tolist()), "key")
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["key", "payload"]], exact[["key", "payload"]])

    # prefilter selectivity: with a sanely-sized bitmap the bloom keeps
    # ~matches + fp, well under the full left side
    words = bloom_bitmap(right, "rk", m_bits=1 << 18, k=4)
    pos = _bloom_positions(rng_l, 1 << 18, 4)
    hit = ((words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)).astype(bool).all(axis=1)
    assert hit.sum() < 2 * len(right_keys)  # ≈ matches, few fp
    assert hit[::7].all()                   # no false negatives


def test_sliding_window_membership(ray_session):
    """An event belongs to exactly width/slide consecutive windows, and
    each window's count equals the events inside [k*slide, k*slide+w)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bioontologykg_ray.stages.windows import sliding_window_agg

    base = pd.Timestamp("2026-01-01 00:00:00")
    ts = [base, base + pd.Timedelta(minutes=14), base + pd.Timedelta(minutes=61)]
    df = pd.DataFrame({"user_id": [1, 1, 1], "ts": ts, "value": [1.0, 2.0, 4.0]})
    out = (
        sliding_window_agg(rd.from_pandas(df), width_s=3600, slide_s=900)
        .to_pandas()
        .sort_values("window")
        .reset_index(drop=True)
    )
    # every event appears in exactly 4 windows
    assert out["n"].sum() == 3 * 4
    k0 = int(base.value // (900 * 1_000_000_000))  # slide slot of events 0+1
    w = dict(zip(out["window"], out["value_sum"]))
    n = dict(zip(out["window"], out["n"]))
    # events 0 and 1 share the slide slot (14 min < 15 min hop), so all
    # four of their windows k0-3..k0 hold both
    for k in range(k0 - 3, k0 + 1):
        assert w[k] == 3.0 and n[k] == 2
    # event 2 at +61 min is 4 slots later; its windows k0+1..k0+4 start
    # at >= +15 min, after events 0 and 1 — it sits alone in all four
    for k in range(k0 + 1, k0 + 5):
        assert w[k] == 4.0 and n[k] == 1


def test_segment_dedup_global_invariant(ray_session):
    """Sum of n_kept over all docs == number of DISTINCT segments in
    the corpus (each distinct segment survives exactly once)."""
    import pandas as pd
    import ray.data as rd

    from bioontologykg_ray.stages.curation import segment_dedup, segment_explode

    rng = __import__("numpy").random.default_rng(7)
    words = [f"w{i}" for i in range(30)]
    docs = [
        {"doc_id": i, "text": " ".join(rng.choice(words, size=25))}
        for i in range(40)
    ]
    ds = rd.from_items(docs)
    out = segment_dedup(ds, window=5).to_pandas()
    distinct = (
        segment_explode(ds, window=5).to_pandas()["seg"].nunique()
    )
    assert int(out["n_kept"].sum()) == distinct
    assert int(out["n_segments"].sum()) == 40 * 5


def test_resize_nearest_samples_exact_pixels():
    import numpy as np

    from bioontologykg_ray.stages.multimodal import (
        decode_bmp, encode_bmp, resize_nearest,
    )

    h, w = 5, 8
    y, x = np.mgrid[0:h, 0:w]
    v = ((3 * x + 7 * y) % 256).astype(np.uint8)
    px = np.stack([v, v, v], axis=-1)
    r = resize_nearest(decode_bmp(encode_bmp(px))[:, :, 0], 3, 4)
    ys = (np.arange(3) * h) // 3
    xs = (np.arange(4) * w) // 4
    assert (r == v[ys][:, xs]).all()
    assert r.shape == (3, 4)


def test_triangle_counts_known_graph():
    """K4 on {0,1,2,3} (4 triangles, every vertex in 3) plus a pendant
    edge (4-5: no triangles) and an isolated triangle {6,7,8}."""
    import ray.data as rd

    from bioontologykg_ray.stages.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = k4 + [(4, 5), (6, 7), (7, 8), (6, 8)]
    ds = rd.from_items([{"u": u, "v": v} for u, v in edges])
    exp = pd.DataFrame(
        {"node": [0, 1, 2, 3, 6, 7, 8], "n_triangles": [3, 3, 3, 3, 1, 1, 1]}
    )
    # both orientation routes: broadcast (default) and distributed cogroup
    for thresh in (5_000_000, 0):
        out = (
            triangle_counts(ds, broadcast_threshold=thresh)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_triangle_counts_degenerate_graphs():
    """Empty edge set and triangle-free graphs must return an empty
    (node, n_triangles) frame, not error."""
    import ray.data as rd

    from bioontologykg_ray.stages.graph import triangle_counts

    empty = rd.from_items([{"u": 1, "v": 2}]).filter(lambda r: False)
    res = triangle_counts(empty)
    assert res.count() == 0
    assert res.schema().names == ["node", "n_triangles"]

    path = rd.from_items([{"u": 0, "v": 1}, {"u": 1, "v": 2}])  # no triangle
    out2 = triangle_counts(path).to_pandas()
    assert len(out2) == 0


def test_pagerank_fixedpoint_both_routes():
    """Integer PageRank matches a brute-force fixed-point replay on a
    small directed graph (with a dangling node and a multi-edge), via
    both the broadcast and the distributed cogroup routes."""
    import ray.data as rd

    from bioontologykg_ray.stages.graph import pagerank_fixedpoint

    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "a"), ("a", "b")]
    ds = rd.from_items([{"src": s, "dst": d} for s, d in edges])

    # brute replay of the documented recurrence (distinct edges,
    # dangling mass dropped)
    dedup = sorted(set(edges))
    nodes = sorted({x for e in dedup for x in e})
    od = {n: sum(1 for s, _ in dedup if s == n) for n in nodes}
    r = {n: 1_000_000 for n in nodes}
    for _ in range(3):
        c = {n: 0 for n in nodes}
        for s, d in dedup:
            c[d] += r[s] // od[s]
        r = {n: 150_000 + (85 * c[n]) // 100 for n in nodes}

    for thresh in (5_000_000, 0):
        out = (
            pagerank_fixedpoint(ds, broadcast_threshold=thresh)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert out["node"].tolist() == nodes, f"thresh={thresh}"
        assert out["pagerank_fp"].tolist() == [r[n] for n in nodes], (
            f"thresh={thresh}"
        )


def test_cms_estimate_bounds():
    """CMS point estimates never undercount, and for a clear heavy
    hitter with depth 4 / width 1024 over a small key space the
    estimate is exact."""
    import ray.data as rd

    from bioontologykg_ray.stages.sketch import cms_estimate, cms_registers

    vals = [7] * 500 + list(range(100, 400))  # heavy hitter 7
    ds = rd.from_items([{"k": v} for v in vals]).repartition(5)
    reg = cms_registers(ds, "k", depth=4, width=1024).to_pandas()
    exact = {7: 500}
    for v in range(100, 400):
        exact[v] = 1
    for k, true_n in list(exact.items())[:50] + [(7, 500)]:
        est = cms_estimate(reg, k, depth=4, width=1024)
        assert est >= true_n
    assert cms_estimate(reg, 7, depth=4, width=1024) >= 500
    # 301 distinct keys over 4x1024 cells: the hitter's min-row is
    # almost surely collision-free; allow tiny over-estimate
    assert cms_estimate(reg, 7, depth=4, width=1024) <= 505
    # absent key estimates stay near zero
    assert cms_estimate(reg, "never-seen", depth=4, width=1024) <= 5


def test_minhash_skips_shingleless_docs():
    """Docs with no shingles (empty/whitespace text) must produce NO
    candidate pairs — the exact-Jaccard oracle emits nothing for them
    (the all-max sentinel signature used to bucket every empty doc
    together and emit spurious jaccard=1.0 pairs)."""
    from bioontologykg_ray.stages.neardup import minhash_lsh_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta"
    ds = rd.from_items(
        [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base},          # true duplicate pair
            {"doc_id": 3, "text": ""},            # no shingles
            {"doc_id": 4, "text": "   "},         # no shingles
            {"doc_id": 5, "text": "xy"},          # shorter than n-gram
        ]
    )
    out = minhash_lsh_pairs(ds, n=3, tau=0.5).to_pandas()
    assert set(map(tuple, out[["doc_a", "doc_b"]].to_numpy())) == {(1, 2)}


def test_ann_missing_query_id_raises():
    from bioontologykg_ray.stages.ann import ann_topk_bruteforce

    emb = np.eye(4, dtype=np.float32)
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(4, dtype=np.int64), "embedding": list(emb)})
    )
    with pytest.raises(ValueError, match="not present"):
        ann_topk_bruteforce(ds, [0, 99], k=2)


def test_grouped_distinct_multiblock_combine_is_global():
    """combine_partitions>1 must still be GLOBALLY distinct — the same
    key arriving via different partial blocks may not survive twice."""
    df = pd.DataFrame({"a": np.arange(1000) % 7, "b": np.arange(1000) % 11})
    ds = rd.from_pandas(df).repartition(13)
    out = grouped_distinct(ds, ["a", "b"], combine_partitions=2).to_pandas()
    assert len(out) == len(df.drop_duplicates(["a", "b"]))
    assert not out.duplicated(["a", "b"]).any()
