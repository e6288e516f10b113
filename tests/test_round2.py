"""Round-2 unit tests: size-aware block policy, canonical-mapping
scale paths (path compression, parallel combine, join rewrite),
min_link_score dead-lettering, resume lineage validation."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from bioontologykg_ray.pipelines.kg import read_block_count
from bioontologykg_ray.stages.canonicalize import (
    canonicalize_triples_join,
    connected_components,
    mapping_dict,
)


def test_read_block_count_policy():
    MB = 1 << 20
    # tiny input on a 32-core box: floor = cores (one in-flight block each)
    assert read_block_count(100 * MB, 32) == 32
    # sf4-sized input (~1.2 GB): core floor at 32 AND at 8 cores (the
    # measured sweet spots), never 128 fragments
    assert read_block_count(1228 * MB, 32) == 32
    assert read_block_count(1228 * MB, 8) == 8
    # big input: bytes dominate — ~256 MB per block, NO constant cap
    assert read_block_count(10_000_000 * MB, 32) == -(-10_000_000 * MB // (256 * MB))
    assert read_block_count(10_000_000 * MB, 32) > 39_000
    # empty input still parallelizes the (empty) read
    assert read_block_count(0, 4) == 8


def test_mapping_dict_path_compresses_chains():
    # simulate an UNCONVERGED label set: c→b→a chain
    labels = rd.from_pandas(
        pd.DataFrame({"node": ["c", "b", "a"], "root": ["b", "a", "a"]})
    )
    m = mapping_dict(labels)
    assert m == {"c": "a", "b": "a"}


def _edges_ds(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in pairs], pa.string()),
                "b": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


def test_parallel_combine_matches_single_task():
    pairs = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(0, 40, 2)] + [
        ("n000", "n002"), ("hub", "n001"), ("hub", "n017")
    ]
    lab_single = (
        connected_components(_edges_ds(pairs), driver_threshold=0)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    lab_par = (
        connected_components(
            _edges_ds(pairs), driver_threshold=0, parallel_combine_threshold=0
        )
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(lab_single, lab_par)


def test_canonicalize_join_matches_broadcast():
    from bioontologykg_ray.stages.canonicalize import (
        CanonicalRewriter,
        canonicalize_triples,
    )

    triples = pd.DataFrame(
        {
            "subj": ["x", "y", "z", "q"],
            "pred": ["IS_A"] * 4,
            "obj": ["y", "z", "q", "x"],
            "conv_id": ["c1", "c1", "c2", "c2"],
            "turn_idx": np.array([0, 1, 0, 1], dtype=np.int32),
        }
    )
    labels = rd.from_pandas(
        pd.DataFrame({"node": ["x", "y", "z"], "root": ["x", "x", "x"]})
    )
    ds = rd.from_arrow(pa.Table.from_pandas(triples, preserve_index=False))
    via_join = (
        canonicalize_triples_join(ds, labels)
        .to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    rewriter = CanonicalRewriter({"y": "x", "z": "x"})
    via_dict = (
        rewriter(triples.copy())
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(via_join, via_dict, check_dtype=False)


def test_min_link_score_dead_letters(tmp_path):
    """A cosine floor above every achievable score forces every
    ambiguous-alias mention into the dead-letter route."""
    from bioontologykg_ray import synth
    from bioontologykg_ray.config import PipelineConfig
    from bioontologykg_ray.pipelines.kg import run_kg_pipeline

    d = synth.ensure_synth(0.001)
    res_hi = run_kg_pipeline(
        os.path.join(d, "transcripts"),
        os.path.join(d, "ontology_terms.parquet"),
        PipelineConfig(min_link_score=2.0),  # impossible floor
        scratch_dir=str(tmp_path / "hi"),
    )
    dead_hi = res_hi["dead_letter"].to_pandas()
    res_def = run_kg_pipeline(
        os.path.join(d, "transcripts"),
        os.path.join(d, "ontology_terms.parquet"),
        PipelineConfig(),
        scratch_dir=str(tmp_path / "def"),
    )
    dead_def = res_def["dead_letter"].to_pandas()
    assert len(dead_hi) > len(dead_def)
    # every ambiguous surface now dead-letters
    amb_dead = dead_hi[
        dead_hi["subj_surface"].str.startswith("amb-")
        | dead_hi["obj_surface"].str.startswith("amb-")
    ]
    assert len(amb_dead) > 0


def test_resume_refuses_stale_grouping(tmp_path):
    from bioontologykg_ray import synth
    from bioontologykg_ray.config import PipelineConfig
    from bioontologykg_ray.pipelines.kg import run_partitioned

    d = synth.ensure_synth(0.001)
    out = str(tmp_path / "out")
    cfg = PipelineConfig()
    run_partitioned(
        os.path.join(d, "transcripts"),
        os.path.join(d, "ontology_terms.parquet"),
        out, cfg, n_parts=4,
    )
    # fewer partitions than before → orphaned part dirs must be refused
    with pytest.raises(RuntimeError, match="grouping mismatch"):
        run_partitioned(
            os.path.join(d, "transcripts"),
            os.path.join(d, "ontology_terms.parquet"),
            out, cfg, n_parts=2,
        )


def test_embedder_backend_fallback():
    """No torch/transformers in this container: 'auto' must fall back
    to the hash embedder, 'transformer' must raise, and the stage must
    still produce L2-normalized float32 embeddings + provenance."""
    import pyarrow as pa

    from bioontologykg_ray.stages.embed import (
        HashEmbedder,
        embed_texts_stage,
        make_embedder,
    )

    cls, kw = make_embedder("auto", dim=16, pooling="cls")
    assert cls is HashEmbedder
    assert kw["pooling"] == "mean"  # hash stand-in has no CLS token
    with pytest.raises(ImportError):
        make_embedder("transformer")

    docs = rd.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["alpha beta", "gamma delta epsilon"]})
    )
    out = embed_texts_stage(docs, dim=16, backend="auto", concurrency=1).to_pandas()
    assert list(out["embedding_model"]) == ["hash-bow-v1"] * 2
    for v in out["embedding"]:
        assert abs(float(np.linalg.norm(np.asarray(v))) - 1.0) < 1e-5


def test_bmp_roundtrip_exact():
    from bioontologykg_ray.stages.multimodal import decode_bmp, encode_bmp

    rng = np.random.RandomState(3)
    for w, h in ((1, 1), (5, 3), (16, 9), (13, 7)):
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)
    with pytest.raises(ValueError):
        decode_bmp(b"JUNK")


def test_import_table_merge_policies():
    from bioontologykg_ray.sources.importer import (
        ColumnSpec,
        TableSpec,
        import_table,
    )

    raw = pd.DataFrame(
        {
            "row_no": [0, 1, 2, 3],
            "k": ["a", "b", "a", "a"],
            "name": ["first-a", "only-b", "second-a", "third-a"],
            "als": ["x|y", "", "z", ""],
            "w": ["", "1.5", "2.5", ""],
            "code": ["", "Y", "N", "Y"],
        }
    )
    spec = TableSpec(
        key="k",
        order="row_no",
        columns=(
            ColumnSpec("row_no", type="int64"),
            ColumnSpec("k"),
            ColumnSpec("name"),
            ColumnSpec("als", split="|"),
            ColumnSpec("w", type="float64"),
            ColumnSpec("code", out="label", lookup={"Y": "yes", "N": "no"}),
        ),
        merge={"name": "first", "als": "concat", "w": "last", "label": "first"},
    )
    out = (
        import_table(rd.from_pandas(raw), spec)
        .to_pandas().set_index("k").sort_index()
    )
    assert out.loc["a", "name"] == "first-a"          # ON CREATE wins
    assert out.loc["a", "als"] == "x|y|z"             # ordered concat
    assert float(out.loc["a", "w"]) == 2.5            # last non-null overwrite
    assert out.loc["a", "label"] == "no"              # first non-null
    assert int(out.loc["a", "n_rows"]) == 3
    assert out.loc["b", "name"] == "only-b" and int(out.loc["b", "n_rows"]) == 1


def test_spill_and_plasma_paths_identical(tmp_path):
    """The flagged-corpus intermediate routes through plasma (small) or
    scratch parquet (forced via scratch_dir) — byte-identical graphs."""
    from bioontologykg_ray import synth
    from bioontologykg_ray.config import PipelineConfig
    from bioontologykg_ray.pipelines.kg import run_kg_pipeline

    d = synth.ensure_synth(0.001)
    args = (os.path.join(d, "transcripts"), os.path.join(d, "ontology_terms.parquet"))
    plasma = run_kg_pipeline(*args, PipelineConfig())
    assert plasma["scratch"] is None  # sf0.001 fits the plasma budget
    spill = run_kg_pipeline(*args, PipelineConfig(), scratch_dir=str(tmp_path / "s"))
    assert spill["scratch"] is not None

    def edges_df(res):
        return (
            res["edges"].to_pandas()
            .sort_values(["src", "predicate", "dst"]).reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(edges_df(plasma), edges_df(spill))
    assert plasma["dead_letter"].count() == spill["dead_letter"].count()


def test_wav_roundtrip_exact():
    from bioontologykg_ray.stages.multimodal import decode_wav, encode_wav

    rng = np.random.RandomState(9)
    v = rng.randint(-32768, 32768, size=777, dtype=np.int16)
    rate, out = decode_wav(encode_wav(v, 16000))
    assert rate == 16000 and np.array_equal(out, v)
    with pytest.raises(ValueError):
        decode_wav(b"NOTWAV")


def test_bmv_container_stride_seek():
    """Multi-frame container roundtrip: stride sampling must decode
    exactly frames 0, stride, 2*stride, ... and seek over the rest."""
    from bioontologykg_ray.stages.multimodal import decode_bmv_frames, encode_bmv

    rng = np.random.RandomState(4)
    frames = [
        rng.randint(0, 256, size=(3 + i % 4, 4 + i % 3, 3)).astype(np.uint8)
        for i in range(7)
    ]
    buf = encode_bmv(frames)
    assert all(np.array_equal(a, b) for a, b in zip(decode_bmv_frames(buf, 1), frames))
    sampled = decode_bmv_frames(buf, stride=3)
    assert len(sampled) == 3  # frames 0, 3, 6
    for got, want in zip(sampled, (frames[0], frames[3], frames[6])):
        assert np.array_equal(got, want)


def test_kg_pipeline_from_raw_obo(tmp_path):
    """S5→K1 chain end-to-end: a raw .obo ontology drives the flagship
    (parse → embed → alias index → link → canonicalize)."""
    import pyarrow.parquet as pq

    from bioontologykg_ray.config import PipelineConfig
    from bioontologykg_ray.pipelines.kg import run_kg_pipeline

    obo = """
format-version: 1.2

[Term]
id: ONT:0000001
name: alpha-1
namespace: test_ns
def: "definition of alpha" [src]
synonym: "syn-alpha-1" EXACT []

[Term]
id: ONT:0000002
name: beta-2
namespace: test_ns
alt_id: ONT:0000001

[Term]
id: ONT:0000003
name: gone-3
is_obsolete: true
"""
    obo_path = tmp_path / "mini.obo"
    obo_path.write_text(obo)
    turns = pa.table(
        {
            "conv_id": pa.array(["c-1", "c-1", "c-2"]),
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "role": pa.array(["user", "assistant", "user"]),
            "text": pa.array(
                [
                    "please alpha-1 is a beta-2. thanks",
                    "noted syn-alpha-1 regulates beta-2. ok",
                    "gone-3 regulates alpha-1. hm",  # obsolete subj → dead
                ]
            ),
            "tool": pa.array(["", "", ""]),
            "ts": pa.array([0, 1, 2], pa.timestamp("us")),
        }
    )
    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    pq.write_table(turns, str(tdir / "part-0.parquet"))
    res = run_kg_pipeline(str(tdir), str(obo_path), PipelineConfig())
    edges = res["edges"].to_pandas()
    # alt_id merges ONT:...2 into ONT:...1 → both facts collapse onto
    # the canonical node; obsolete term never links
    assert set(edges["src"]) == {"ONT:0000001"}
    assert set(edges["dst"]) == {"ONT:0000001"}
    assert set(edges["predicate"]) == {"IS_A", "REGULATES"}
    dead = res["dead_letter"].to_pandas()
    assert list(dead["subj_surface"]) == ["gone-3"]
    assert list(dead["reason"]) == ["unlinked_subject"]


def test_count_edges_packed_matches_string_chain():
    """The fused int-space edge tail must be bit-identical to the string
    chain (rewrite → SAME_AS drop → symmetric flip → count) on a corpus
    exercising alt-id roots, symmetric flips, self-loops, and repeats."""
    import random

    from bioontologykg_ray.stages.canonicalize import canonicalize_triples
    from bioontologykg_ray.stages.dedup import (
        canonicalize_symmetric,
        count_edges_packed,
        count_triples,
    )

    rng = random.Random(7)
    terms = [f"go-{i:04d}" for i in range(40)]
    alts = [f"alt-{i:04d}" for i in range(10)]
    vocab = terms + alts
    # mapping sends some term_ids to roots that are alt_ids or other terms
    mapping = {terms[i]: rng.choice(alts + terms[:5]) for i in range(10, 25)}
    mapping = {k: v for k, v in mapping.items() if k != v}
    preds = ["IS_A", "PART_OF", "REGULATES", "INTERACTS_WITH", "SAME_AS"]
    sym = ("INTERACTS_WITH", "SAME_AS")
    rows = {
        "subj": [rng.choice(terms) for _ in range(3000)],
        "pred": [rng.choice(preds) for _ in range(3000)],
        "obj": [rng.choice(terms) for _ in range(3000)],
    }
    ds = rd.from_arrow(pa.table(rows)).repartition(7)

    packed = (
        count_edges_packed(ds, vocab, preds, mapping, sym)
        .to_pandas()
        .sort_values(["src", "predicate", "dst"])
        .reset_index(drop=True)
    )

    import ray as _ray

    canon = canonicalize_triples(ds, _ray.put(dict(mapping)))
    facts = canonicalize_symmetric(canon.filter(expr="pred != 'SAME_AS'"), sym)
    expected = (
        count_triples(facts)
        .to_pandas()
        .sort_values(["src", "predicate", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(packed, expected)
    assert packed["n_mentions"].sum() == sum(p != "SAME_AS" for p in rows["pred"])


def test_count_edges_packed_rejects_unknown_ids():
    from bioontologykg_ray.stages.dedup import count_edges_packed

    ds = rd.from_arrow(
        pa.table({"subj": ["x-1"], "pred": ["IS_A"], "obj": ["go-0001"]})
    )
    with pytest.raises(Exception, match="contract violation"):
        count_edges_packed(ds, ["go-0001"], ["IS_A"], {}, ()).to_pandas()


def test_llm_backend_fallback_and_fake_rule():
    """make_llm('auto') falls back to the fake in this sandbox,
    'transformer' raises, and the fake's generation is the documented
    pure function of the prompt."""
    import ray.data as rd

    from bioontologykg_ray.stages.llm import FakeCausalLM, llm_generate_stage, make_llm

    cls, kw = make_llm("auto", prompt_col="p", max_new_tokens=3)
    assert cls is FakeCausalLM and kw["max_new_tokens"] == 3
    with pytest.raises(ImportError):
        make_llm("transformer", model_name="x")

    ds = rd.from_items([{"p": "  alpha beta\tgamma delta "}, {"p": ""}])
    out = (
        llm_generate_stage(ds, prompt_col="p", backend="fake", max_new_tokens=3)
        .to_pandas()
    )
    assert out.loc[0, "completion"] == "SUMMARY: alpha beta gamma"
    assert out.loc[0, "n_prompt_tokens"] == 4
    assert out.loc[0, "n_completion_tokens"] == 3
    assert out.loc[1, "completion"] == "SUMMARY:"
    assert out.loc[1, "n_completion_tokens"] == 0
    assert (out["llm_model"] == "fake-causal-v1").all()


def test_wav_energy_windows_kernel():
    """Window energies computed from REALLY decoded samples: exact
    integer sums, tail dropped, sub-window clips dropped."""
    import ray.data as rd

    from bioontologykg_ray.stages.multimodal import (
        decode_wav_energy,
        encode_wav,
    )

    v1 = np.arange(-200, 200, dtype=np.int16)         # 400 samples: 2 windows
    v2 = np.zeros(170, dtype=np.int16); v2[:10] = 1000  # 1 window, loud head
    v3 = np.ones(100, dtype=np.int16)                 # < 1 window → dropped
    ds = rd.from_items(
        [
            {"media_id": i, "payload": encode_wav(v, 8000)}
            for i, v in ((1, v1), (2, v2), (3, v3))
        ]
    )
    out = (
        decode_wav_energy(ds, window=160, silence_threshold=1_000_000)
        .to_pandas()
        .set_index("media_id")
    )
    assert list(out.index) == [1, 2]
    e1a = int((np.arange(-200, -40, dtype=np.int64) ** 2).sum())
    e1b = int((np.arange(-40, 120, dtype=np.int64) ** 2).sum())
    assert out.loc[1, "n_windows"] == 2
    assert out.loc[1, "total_energy"] == e1a + e1b
    assert out.loc[1, "max_window_energy"] == max(e1a, e1b)
    assert out.loc[1, "n_silent"] == int(e1a < 1_000_000) + int(e1b < 1_000_000)
    e2 = 10 * 1000 * 1000
    assert out.loc[2, "n_windows"] == 1
    assert out.loc[2, "total_energy"] == e2
    assert out.loc[2, "n_silent"] == 0  # e2 == threshold*10


def test_cli_query_subcommand(capsys, tmp_path):
    """`query --list` enumerates the registry with oracle status;
    `query NAME --out` writes the result parquet."""
    import json

    import pandas as pd

    from bioontologykg_ray.__main__ import main

    assert main(["query", "--list"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) >= 80
    assert any(l.startswith("pricing_summary\tsql-oracle") for l in lines)
    assert any(l.startswith("doc_embeddings\trows-only") for l in lines)

    out = str(tmp_path / "r.parquet")
    rc = main(
        ["query", "distinct_segments", "--sf-dir", "/root/testdata/sf0.001",
         "--out", out]
    )
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["rows"] == 5
    assert len(pd.read_parquet(out)) == 5

    assert main(["query", "no_such_query"]) == 2
