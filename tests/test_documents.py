"""Nested-document operators (M1/M2/D7 + child-table explodes) over the
FIXTURES.md F5 `documents` shape."""

import pyarrow as pa

from bioontologykg_ray.functions import documents as D


def _nested_docs() -> pa.Table:
    authors = [
        [
            {"last_name": "Smith", "first_name": "Jane", "initials": "J",
             "affiliation": "MIT"},
            {"last_name": "Doe", "first_name": "Al", "initials": "A",
             "affiliation": "MIT"},
            {"last_name": "Wu", "first_name": "Li", "initials": "L",
             "affiliation": "ETH"},
        ],
        [],
    ]
    sections = [
        [{"label": "BACKGROUND", "text": "context here"},
         {"label": "RESULTS", "text": "we found things"}],
        [{"label": "", "text": "plain abstract"}],
    ]
    mesh = [
        [{"descriptor": "Neoplasms", "major_topic": True},
         {"descriptor": "Genes", "major_topic": False}],
        [],
    ]
    return pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "title": pa.array(["T1", "T2"], pa.string()),
            "year": pa.array(["2021", "1999"], pa.string()),
            "authors": pa.array(authors),
            "sections": pa.array(sections),
            "mesh_terms": pa.array(mesh),
        }
    )


def test_flatten_documents():
    out = D.flatten_documents(_nested_docs()).to_pandas().set_index("doc_id")
    # M1: label-prefixed abstract concat ("LABEL: text" join)
    assert out.loc[1, "abstract"] == "BACKGROUND: context here RESULTS: we found things"
    assert out.loc[2, "abstract"] == "plain abstract"
    # M2: first-author projection "first last"
    assert out.loc[1, "first_author"] == "Jane Smith"
    assert out.loc[2, "first_author"] == ""
    # D7: affiliation set-dedup within doc
    assert list(out.loc[1, "affiliations"]) == ["MIT", "ETH"]


def test_explode_authors_positions():
    out = D.explode_authors(_nested_docs()).to_pandas()
    assert len(out) == 3
    assert out[out["last_name"] == "Doe"]["position"].iloc[0] == 1


def test_explode_mesh_major_topic():
    out = D.explode_mesh(_nested_docs()).to_pandas()
    assert len(out) == 2
    assert bool(out[out["descriptor"] == "Neoplasms"]["major_topic"].iloc[0]) is True


def test_embedder_stage_pooling():
    import numpy as np

    from bioontologykg_ray.stages.embed import HashEmbedder

    t = pa.table({"text": pa.array(["alpha beta", "alpha beta", ""], pa.string())})
    mean_e = HashEmbedder(dim=16, pooling="mean")(t)
    max_e = HashEmbedder(dim=16, pooling="max")(t)
    m = np.asarray(mean_e["embedding"].combine_chunks().flatten()).reshape(3, 16)
    x = np.asarray(max_e["embedding"].combine_chunks().flatten()).reshape(3, 16)
    assert np.array_equal(m[0], m[1])          # deterministic
    assert not np.array_equal(m[0], x[0])      # pooling flag matters
    assert np.all(m[2] == 0)                   # empty text → zero vector
    assert mean_e["embedding_model"][0].as_py() == "hash-bow-v1"
