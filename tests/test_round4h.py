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
