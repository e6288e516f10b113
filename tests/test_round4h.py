"""Round-4 continuation (h): relation cardinality typing, corpus
unigram-LM surprisal scoring, per-source token-distribution KL."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


# ---------------------------------------------------------------------------
# relation cardinality
# ---------------------------------------------------------------------------

def test_cardinality_labels_integer_rule():
    from bioontologykg_ray.pipelines.queries import _cardinality_labels

    n = np.array([10, 10, 10, 10, 3], dtype=np.int64)
    heads = np.array([10, 5, 10, 5, 2], dtype=np.int64)
    tails = np.array([10, 10, 5, 5, 2], dtype=np.int64)
    out = list(_cardinality_labels(n, heads, tails))
    # 2n vs 3h / 3t: exactly-1.5 multiplicity counts as "many"
    assert out == ["1-1", "1-N", "N-1", "N-N", "N-N"]


def test_cardinality_boundary_is_inclusive():
    from bioontologykg_ray.pipelines.queries import _cardinality_labels

    # 2*3 == 3*2 -> ratio exactly 1.5 -> classified as the N side
    n = np.array([3, 3], dtype=np.int64)
    heads = np.array([2, 3], dtype=np.int64)
    tails = np.array([3, 3], dtype=np.int64)
    assert list(_cardinality_labels(n, heads, tails)) == ["1-N", "1-1"]


def test_kg_relation_cardinality_internal_consistency(ray_session):
    from bioontologykg_ray.pipelines.queries import q_kg_relation_cardinality

    out = q_kg_relation_cardinality("/root/testdata/sf0.001")
    assert len(out) >= 1
    assert set(out["cardinality"]) <= {"1-1", "1-N", "N-1", "N-N"}
    # counts are coherent: every head/tail appears in >=1 triple
    assert (out["n_heads"] <= out["n_triples"]).all()
    assert (out["n_tails"] <= out["n_triples"]).all()
    # the label re-derives from the published counts
    from bioontologykg_ray.pipelines.queries import _cardinality_labels

    re_lab = _cardinality_labels(
        out["n_triples"].to_numpy(np.int64),
        out["n_heads"].to_numpy(np.int64),
        out["n_tails"].to_numpy(np.int64),
    )
    assert list(re_lab) == list(out["cardinality"])


# ---------------------------------------------------------------------------
# unigram surprisal
# ---------------------------------------------------------------------------

def _write_docs(tmp_path, rows):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_doc_unigram_surprisal_hand_computed(ray_session, tmp_path):
    from bioontologykg_ray.pipelines.queries import q_doc_unigram_surprisal

    d = _write_docs(tmp_path, [(0, "a a b", "s"), (1, "b c", "s")])
    out = q_doc_unigram_surprisal(d).set_index("doc_id")
    # corpus: a=2 b=2 c=1, N=5
    # doc0: log2(5) - (2*log2(2) + 1*log2(2))/3 = log2(5) - 1
    # doc1: log2(5) - (log2(2) + log2(1))/2    = log2(5) - 0.5
    assert out.loc[0, "n_tokens"] == 3 and out.loc[1, "n_tokens"] == 2
    assert out.loc[0, "mean_surprisal"] == round(np.log2(5) - 1.0, 6)
    assert out.loc[1, "mean_surprisal"] == round(np.log2(5) - 0.5, 6)


def test_doc_unigram_surprisal_uniform_corpus_is_flat(ray_session, tmp_path):
    from bioontologykg_ray.pipelines.queries import q_doc_unigram_surprisal

    # every token unique -> every doc scores exactly log2(N)
    d = _write_docs(tmp_path, [(0, "a b", "s"), (1, "c d e", "s")])
    out = q_doc_unigram_surprisal(d)
    assert (out["mean_surprisal"] == round(np.log2(5), 6)).all()


# ---------------------------------------------------------------------------
# source KL
# ---------------------------------------------------------------------------

def test_source_token_kl_identical_source_is_zero(ray_session, tmp_path):
    from bioontologykg_ray.pipelines.queries import q_source_token_kl

    d = _write_docs(tmp_path, [(0, "a b a", "only"), (1, "b a b", "only")])
    out = q_source_token_kl(d)
    assert list(out["source"]) == ["only"]
    assert out.loc[0, "kl_bits"] == 0.0
    assert out.loc[0, "n_tokens"] == 6


def test_source_token_kl_disjoint_sources(ray_session, tmp_path):
    from bioontologykg_ray.pipelines.queries import q_source_token_kl

    # s1 all 'a', s2 all 'b', equal mass: each source's distribution is a
    # point mass where the corpus puts 1/2 -> KL = log2(2) = 1 bit
    d = _write_docs(tmp_path, [(0, "a a", "s1"), (1, "b b", "s2")])
    out = q_source_token_kl(d).set_index("source")
    assert out.loc["s1", "kl_bits"] == 1.0
    assert out.loc["s2", "kl_bits"] == 1.0


# ---------------------------------------------------------------------------
# relation composition + component sizes
# ---------------------------------------------------------------------------

def test_comp_wedge_apply_cross_product_counts():
    from bioontologykg_ray.pipelines.queries import _comp_wedge_apply

    # middle m: 2 incoming A, 1 incoming B, 3 outgoing C
    df = pd.DataFrame(
        {
            "m": ["m"] * 6,
            "p": ["A", "A", "B", "C", "C", "C"],
            "d": np.array([0, 0, 0, 1, 1, 1], dtype=np.int8),
        }
    )
    out = _comp_wedge_apply(df).set_index(["p1", "p2"])
    assert out.loc[("A", "C"), "n"] == 6  # 2 * 3
    assert out.loc[("B", "C"), "n"] == 3  # 1 * 3
    assert len(out) == 2  # no out-only/in-only pairs


def test_comp_wedge_apply_in_only_middle_emits_nothing():
    from bioontologykg_ray.pipelines.queries import _comp_wedge_apply

    df = pd.DataFrame(
        {"m": ["m", "m"], "p": ["A", "B"], "d": np.array([0, 0], dtype=np.int8)}
    )
    assert _comp_wedge_apply(df).empty


def test_kg_relation_composition_matches_naive_self_join(ray_session):
    from bioontologykg_ray.pipelines.queries import (
        _kg_pd, q_kg_relation_composition,
    )

    out = q_kg_relation_composition("/root/testdata/sf0.001")
    e = _kg_pd("/root/testdata/sf0.001", "edges", ["src", "predicate", "dst"])
    naive = (
        e.merge(e, left_on="dst", right_on="src", suffixes=("_1", "_2"))
        .groupby(["predicate_1", "predicate_2"], as_index=False)
        .size()
        .rename(
            columns={"predicate_1": "p1", "predicate_2": "p2", "size": "n_paths"}
        )
        .sort_values(["p1", "p2"])
        .reset_index(drop=True)
    )
    naive["n_paths"] = naive["n_paths"].astype(np.int64)
    pd.testing.assert_frame_equal(out, naive)


def test_kg_component_sizes_mass_balance(ray_session):
    from bioontologykg_ray.pipelines.queries import (
        _kg_pd, q_kg_component_sizes,
    )

    out = q_kg_component_sizes("/root/testdata/sf0.001")
    labels = _kg_pd("/root/testdata/sf0.001", "labels")
    # total node mass across the histogram equals the label table
    assert int((out["component_size"] * out["n_components"]).sum()) == len(labels)
    # every same-as component has at least 2 members (an isolated node
    # never enters the labels table)
    assert (out["component_size"] >= 2).all()
