"""Curation stages: eval-set decontamination + stratified sampling."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from bioontologykg_ray.functions.hashing import md5_low64
from bioontologykg_ray.stages.curation import (
    _word_ngram_hashes,
    contamination_flags,
    eval_ngram_hashes,
    stratified_sample,
)


def brute_ngrams(text: str, n: int) -> set[str]:
    t = text.split()
    return {" ".join(t[i: i + n]) for i in range(len(t) - n + 1)}


def test_word_ngram_hashes_matches_brute():
    texts = pd.Series([
        "a b c d e", "a b c", "x", "", "a a a a a a", "p q r s p q r s",
    ])
    rows, h = _word_ngram_hashes(texts, 3)
    got = {}
    for r, hh in zip(rows, h):
        got.setdefault(int(r), set()).add(int(hh))
    for i, t in enumerate(texts):
        want = {md5_low64(g) for g in brute_ngrams(t, 3)}
        assert got.get(i, set()) == want, f"row {i}"


def test_word_ngram_hashes_empty_and_short():
    assert _word_ngram_hashes(pd.Series([], dtype=object), 3)[0].size == 0
    rows, h = _word_ngram_hashes(pd.Series(["one two"]), 3)
    assert rows.size == 0 and h.size == 0


def test_contamination_flags_counts_distinct_hits():
    eval_docs = ray.data.from_items([
        {"doc_id": 100, "text": "the quick brown fox jumps"},
        {"doc_id": 101, "text": "pack my box with jugs"},
    ])
    corpus = ray.data.from_items([
        # shares "the quick brown" and "quick brown fox" and "brown fox jumps"
        {"doc_id": 1, "text": "so the quick brown fox jumps high"},
        # repeated shared trigram counts ONCE (distinct)
        {"doc_id": 2, "text": "pack my box pack my box"},
        {"doc_id": 3, "text": "nothing in common here at all"},
        {"doc_id": 4, "text": "tiny"},
    ])
    ev = eval_ngram_hashes(eval_docs, n=3)
    out = (
        contamination_flags(corpus, ray.put(ev), n=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3, 4]
    assert out["n_hits"].tolist() == [3, 1, 0, 0]


def test_stratified_sample_deterministic_and_stable_under_append():
    rows = [{"doc_id": i, "source": f"s{i % 2}"} for i in range(400)]
    rates = {"s0": 0.5, "s1": 0.1}
    a = stratified_sample(ray.data.from_items(rows), rates).to_pandas()
    b = stratified_sample(ray.data.from_items(rows), rates).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )
    # appending new rows never resamples prior survivors
    more = rows + [{"doc_id": 1000 + i, "source": "s0"} for i in range(50)]
    c = stratified_sample(ray.data.from_items(more), rates).to_pandas()
    assert set(a["doc_id"]) == set(c[c["doc_id"] < 1000]["doc_id"])
    # survivor rule is exactly the documented hash threshold
    for _, r in a.iterrows():
        assert md5_low64("sample:" + str(r["doc_id"])) % 10000 < rates[r["source"]] * 10000
    # rough rate sanity: s0 keeps about half, s1 about a tenth
    n0 = (a["source"] == "s0").sum()
    n1 = (a["source"] == "s1").sum()
    assert 60 <= n0 <= 140 and n1 <= 45


def test_stratified_sample_default_rate_drops_unknown_groups():
    ds = ray.data.from_items(
        [{"doc_id": i, "source": "mystery"} for i in range(50)]
    )
    out = stratified_sample(ds, {"known": 1.0}).to_pandas()
    assert len(out) == 0


def test_fuzzy_dedup_min_root_crosses_digit_lengths(tmp_path):
    """Survivor = NUMERIC min of each duplicate cluster even when ids
    span digit lengths (the zero-pad contract: lexicographic min over
    padded strings == numeric min; unpadded '100' < '99' would keep the
    wrong doc)."""
    import pyarrow.parquet as pq
    import pyarrow as pa
    from bioontologykg_ray.pipelines import queries as Q

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    # cluster across 99/100/101 (identical text → Jaccard 1.0)
    for i in (99, 100, 101):
        rows.append({"doc_id": i, "text": base})
    # singleton
    rows.append({"doc_id": 7, "text": "one two three four five six seven"})
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))

    out = Q.q_fuzzy_dedup_survivors(str(tmp_path)).to_pandas()
    got = set(out["doc_id"])
    # corpus = originals + 80%-truncated copies (+2e6); the truncated
    # copies of the identical texts join the same cluster
    assert 99 in got and 100 not in got and 101 not in got
    assert 7 in got  # singleton untouched


def test_segment_dedup_semantics():
    """Corpus-level keep-first: a 10-word segment shared across docs
    survives only at its min (doc_id, seg_idx); within-doc repeats keep
    only the first; docs losing everything still appear with ''."""
    import ray.data as rd

    from bioontologykg_ray.stages.curation import segment_dedup

    w10 = " ".join(f"w{i}" for i in range(10))       # shared segment
    u10 = " ".join(f"u{i}" for i in range(10))       # unique to doc 1
    ds = rd.from_items(
        [
            {"doc_id": 1, "text": w10 + " " + u10 + " " + w10},  # w10 twice
            {"doc_id": 2, "text": w10},                          # all dup
            {"doc_id": 3, "text": "short text"},                 # no full seg
        ]
    )
    out = (
        segment_dedup(ds, window=10)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 2]  # doc 3 has no full segment
    d1 = out.iloc[0]
    assert d1["n_segments"] == 3 and d1["n_kept"] == 2
    assert d1["clean_text"] == w10 + " " + u10  # second w10 dropped
    d2 = out.iloc[1]
    assert d2["n_segments"] == 1 and d2["n_kept"] == 0
    assert d2["clean_text"] == ""


def test_entity_degrees_self_loop_counts_once():
    import pandas as pd

    import ray.data as rd

    from bioontologykg_ray.pipelines.queries import q_entity_degrees  # noqa: F401
    from bioontologykg_ray.stages.agg import grouped_agg

    # exercise the endpoint-explode kernel directly via a tiny frame
    import pyarrow as pa
    import pyarrow.compute as pc

    t = pa.table(
        {
            "src": ["a", "b", "c"],
            "dst": ["b", "b", "a"],
            "n_mentions": [3, 5, 2],
        }
    )
    src, dst = t["src"].combine_chunks(), t["dst"].combine_chunks()
    nm = t["n_mentions"].combine_chunks().cast(pa.int64())
    keep = pc.not_equal(dst, src)
    eps = pa.table(
        {
            "node": pa.concat_arrays([src, dst.filter(keep)]),
            "n_mentions": pa.concat_arrays([nm, nm.filter(keep)]),
        }
    )
    out = (
        grouped_agg(
            rd.from_arrow(eps), ["node"],
            {"n_edges": ("n_mentions", "count"),
             "total_mentions": ("n_mentions", "sum")},
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    # b: src once (b->b self-loop counted ONCE) + dst of a->b = 2 edges
    exp = pd.DataFrame(
        {
            "node": ["a", "b", "c"],
            "n_edges": [2, 2, 1],
            "total_mentions": [5, 8, 2],
        }
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_redact_pii_rules_and_order():
    """Counts are per rule on the text that rule sees, rules apply in
    declared order, non-matches pass through untouched. A numeric-host
    address (c@1.2.3.4) is NOT an email under the rule (alphabetic TLD
    required) — its host redacts as an IPv4 instead."""
    import ray.data as rd

    from bioontologykg_ray.stages.curation import redact_pii

    ds = rd.from_items(
        [
            {"text": "mail a.b@x.io and c@1.2.3.4 now"},
            {"text": "call 555-123-4567 or 555-000-1111 from 10.0.0.1"},
            {"text": "no pii here, just 3.14 and v1.2.3"},
        ]
    )
    # index by input text: Ray Data does not guarantee block order
    # (execution_options.preserve_order defaults off), so positional
    # .loc asserts were flaky
    out = redact_pii(ds).to_pandas().set_index("text")
    r = out.loc["mail a.b@x.io and c@1.2.3.4 now"]
    assert r["clean_text"] == "mail <EMAIL> and c@<IP> now"
    assert (r[["n_email", "n_phone", "n_ipv4"]] == [1, 0, 1]).all()
    r = out.loc["call 555-123-4567 or 555-000-1111 from 10.0.0.1"]
    assert r["clean_text"] == "call <PHONE> or <PHONE> from <IP>"
    assert (r[["n_email", "n_phone", "n_ipv4"]] == [0, 2, 1]).all()
    r = out.loc["no pii here, just 3.14 and v1.2.3"]
    assert r["clean_text"] == "no pii here, just 3.14 and v1.2.3"
    assert (r[["n_email", "n_phone", "n_ipv4"]] == [0, 0, 0]).all()


def test_global_shuffle_stable_under_append():
    """The hash order is a pure function of ids: appending rows
    preserves the relative order of pre-existing rows, and shards are
    balanced round-robin."""
    import ray.data as rd

    from bioontologykg_ray.stages.curation import global_shuffle

    base = [{"doc_id": i} for i in range(40)]
    extra = [{"doc_id": i} for i in range(40, 60)]
    a = global_shuffle(rd.from_items(base), n_shards=4).to_pandas()
    b = global_shuffle(rd.from_items(base + extra), n_shards=4).to_pandas()

    def order(df):
        df = df.copy()
        df["g"] = df["pos_in_shard"] * 4 + df["shard"]
        return df.sort_values("g")["doc_id"].tolist()

    oa, ob = order(a), order(b)
    assert [i for i in ob if i < 40] == oa
    assert sorted(a.groupby("shard").size()) == [10, 10, 10, 10]


def test_sample_and_split_hashes_are_independent():
    """The round-2 review finding: with an UNSALTED shared hash, any
    sample rate <= 0.9% forces every survivor into the split's 'train'
    bucket (survivor <=> h%10000 < thresh ==> h%100 < 90). With purpose
    salts the decisions are independent: a low-rate sample must still
    contain val and test docs."""
    rows = [{"doc_id": i, "source": "s"} for i in range(100_000)]
    kept = stratified_sample(
        ray.data.from_items(rows), {"s": 0.005}
    ).to_pandas()
    assert 300 <= len(kept) <= 700  # ~500 expected
    buckets = np.array(
        [md5_low64("split:" + str(i)) % 100 for i in kept["doc_id"]]
    )
    assert (buckets >= 90).sum() > 0   # val+test not emptied
    assert (buckets >= 95).sum() > 0   # test not emptied
