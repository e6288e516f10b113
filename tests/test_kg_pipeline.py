"""End-to-end conformance of the KG pipeline vs the single-process oracle
(FIXTURES.md F4 invariants 1-3)."""

import os

import pyarrow as pa
import pytest
import ray.data

from bioontologykg_ray import synth
from bioontologykg_ray.config import PipelineConfig
from bioontologykg_ray.oracle import oracle_triples, precision_recall
from bioontologykg_ray.pipelines.kg import run_kg_pipeline
from bioontologykg_ray.stages.ordering import order_conversations

SF = 0.001
# link_stateless=False keeps the actor-pool linking path under test;
# the default stateless-task path is exercised by test_resume's CFG and
# the conformance queries
CFG = PipelineConfig(link_concurrency=2, link_stateless=False,
                     extract_batch_size=512, link_batch_size=512)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = synth.ensure_synth(SF)
    return {
        "transcripts": os.path.join(d, "transcripts"),
        "ontology": os.path.join(d, "ontology_terms.parquet"),
    }


@pytest.fixture(scope="module")
def gold(corpus):
    import pyarrow.parquet as pq
    import glob

    tbl = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(corpus["transcripts"] + "/*.parquet"))]
    )
    ont = pq.read_table(corpus["ontology"])
    return oracle_triples(tbl, ont, dim=CFG.embedding_dim)


@pytest.fixture(scope="module")
def result(corpus):
    return run_kg_pipeline(corpus["transcripts"], corpus["ontology"], CFG)


def test_per_turn_text_equality(corpus):
    """Invariant 2: re-emitting (conv_id, turn_idx, text) after the
    ordering stage matches the input exactly (north-star invariant)."""
    ds = ray.data.read_parquet(corpus["transcripts"])
    ordered = order_conversations(ds).select_columns(["conv_id", "turn_idx", "text"])
    got = ordered.to_pandas()
    want = (
        ray.data.read_parquet(corpus["transcripts"])
        .select_columns(["conv_id", "turn_idx", "text"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # ordered output must already BE in (conv_id, turn_idx) order
    assert got["conv_id"].is_monotonic_increasing or (
        got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).equals(got)
    )
    assert got.reset_index(drop=True).equals(want)


def test_linked_triples_match_oracle(result, gold):
    sys_rows = set(
        map(
            tuple,
            result["linked"]
            .to_pandas()[["subj", "pred", "obj", "conv_id", "turn_idx"]]
            .itertuples(index=False),
        )
    )
    gold_rows = set(gold["linked"])
    p, r = precision_recall(sys_rows, gold_rows)
    assert p >= 0.95 and r >= 0.95, (p, r, len(sys_rows), len(gold_rows))
    # in fact the pipelines are exactly equivalent:
    assert sys_rows == gold_rows


def test_canonical_edges_match_oracle(result, gold):
    df = result["edges"].to_pandas()
    sys_edges = {
        (s, p, d): n
        for s, p, d, n in df[["src", "predicate", "dst", "n_mentions"]].itertuples(
            index=False
        )
    }
    p, r = precision_recall(set(sys_edges), set(gold["edges"]))
    assert p >= 0.95 and r >= 0.95, (p, r)
    assert sys_edges == gold["edges"]


def test_nodes_unique_and_match(result, gold):
    df = result["nodes"].to_pandas()
    assert df["node_id"].is_unique  # invariant 3: key uniqueness (D1)
    assert set(df["node_id"]) == gold["nodes"]


def test_no_reciprocal_symmetric_duplicates(result):
    """Invariant 3: zero reciprocal duplicates for symmetric predicates
    (mirrors uniprot_intact.cql:55-58)."""
    df = result["edges"].to_pandas()
    sym = df[df["predicate"].isin(["INTERACTS_WITH", "SAME_AS"])]
    keys = set(map(tuple, sym[["src", "predicate", "dst"]].itertuples(index=False)))
    for s, p, d in keys:
        assert (d, p, s) not in keys or s == d
    # canonical order enforced
    assert (sym["src"] <= sym["dst"]).all()


def test_obsolete_terms_never_link(result, corpus):
    import pyarrow.parquet as pq

    ont = pq.read_table(corpus["ontology"])
    obsolete = {
        t
        for t, o in zip(ont["term_id"].to_pylist(), ont["is_obsolete"].to_pylist())
        if o
    }
    df = result["linked"].to_pandas()
    assert not (set(df["subj"]) | set(df["obj"])) & obsolete


def test_dead_letter_present(result, gold):
    assert result["dead_letter"].count() == gold["dead"]


def test_distributed_union_find_matches_driver_path(corpus):
    """Force the distributed min-label/pointer-jump loop
    (driver_threshold=0) and check it against the driver-side
    union-find on the same edge set."""
    import pyarrow.parquet as pq
    import ray

    from bioontologykg_ray.pipelines.kg import ontology_same_as_pairs
    from bioontologykg_ray.stages.canonicalize import connected_components

    ont = pq.read_table(corpus["ontology"])
    edges = ray.data.from_arrow(ontology_same_as_pairs(ont))
    dist = connected_components(edges, max_iters=12, salt=2, driver_threshold=0)
    drv = connected_components(edges, driver_threshold=10**9)
    d1 = dist.to_pandas().set_index("node")["root"].to_dict()
    d2 = drv.to_pandas().set_index("node")["root"].to_dict()
    assert d1 == d2 and len(d1) > 0


@pytest.mark.parametrize(
    "topology",
    ["chain", "star", "mixed"],
    ids=["chain-16-deep", "hub-star-80", "random-mixed"],
)
def test_union_find_fixpoint_topologies(topology):
    """Fixpoint proof (SURVEY §7.5): the distributed loop must converge
    within max_iters=12 on (a) a 16-deep chain — needs the pointer-jump
    O(log D) acceleration, (b) an 80-edge hub star — needs salting to
    spread fan-in, (c) a random mix — and must equal the driver path."""
    import random

    import pyarrow as pa
    import ray

    from bioontologykg_ray.stages.canonicalize import connected_components

    if topology == "chain":
        pairs = [(f"N:{i:04d}", f"N:{i+1:04d}") for i in range(16)]
    elif topology == "star":
        pairs = [("N:9999", f"N:{i:04d}") for i in range(80)]
    else:
        rng = random.Random(13)
        pairs = [
            (f"N:{rng.randrange(120):04d}", f"N:{rng.randrange(120):04d}")
            for _ in range(150)
        ]
    tbl = pa.table(
        {"a": pa.array([p[0] for p in pairs]), "b": pa.array([p[1] for p in pairs])}
    )
    dist = connected_components(
        ray.data.from_arrow(tbl), max_iters=12, salt=2, driver_threshold=0
    ).to_pandas()
    drv = connected_components(
        ray.data.from_arrow(tbl), driver_threshold=10**9
    ).to_pandas()
    d1 = dict(zip(dist["node"], dist["root"]))
    d2 = dict(zip(drv["node"], drv["root"]))
    assert d1 == d2
    if topology == "chain":
        assert set(d1.values()) == {"N:0000"}
    if topology == "star":
        assert set(d1.values()) == {"N:0000"}


def test_ordering_commute_equality(corpus, result):
    """The physical-plan commute (extract off the unsorted read) must
    produce EXACTLY the same edge table as strict physical ordering
    (extract after the (conv_id, turn_idx) sort): extraction is per-turn
    and every triple carries its provenance, so the sort and the
    extraction commute."""
    import dataclasses

    import pandas as pd

    strict = run_kg_pipeline(
        corpus["transcripts"], corpus["ontology"],
        dataclasses.replace(CFG, strict_ordering=True),
    )
    cols = ["src", "predicate", "dst", "n_mentions"]
    a = result["edges"].to_pandas()[cols].sort_values(cols).reset_index(drop=True)
    b = strict["edges"].to_pandas()[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # linked triple multisets identical too
    lc = ["subj", "pred", "obj", "conv_id", "turn_idx"]
    la = result["linked"].to_pandas()[lc].sort_values(lc).reset_index(drop=True)
    lb = strict["linked"].to_pandas()[lc].sort_values(lc).reset_index(drop=True)
    pd.testing.assert_frame_equal(la, lb)


def test_alias_index_same_term_duplicates_not_ambiguous():
    """A surface listed twice for ONE term (name repeated as a synonym)
    must stay on the unambiguous fast path; a surface shared by TWO
    terms must stay ambiguous."""
    import numpy as np
    import pyarrow as pa

    from bioontologykg_ray.stages.linker import build_alias_index

    dim = 4
    tbl = pa.table(
        {
            "term_id": ["T:1", "T:2"],
            "name": ["p53", "shared"],
            "synonyms": [["P53", "shared"], []],
            "definition": ["a", "b"],
            "is_obsolete": [False, False],
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(np.zeros(2 * dim, np.float32)), dim
            ),
        }
    )
    idx = build_alias_index(tbl)
    unamb = dict(zip(idx["unamb_keys"].to_pylist(), idx["unamb_vals"].to_pylist()))
    assert unamb.get("p53") == "T:1"          # duplicate-within-term collapsed
    assert "p53" not in idx["ambiguous"]
    assert sorted(idx["ambiguous"]["shared"][0]) == ["T:1", "T:2"]
