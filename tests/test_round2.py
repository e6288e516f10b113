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
    # sf4-sized input (~1 GB): still the core floor, never 128 fragments
    assert read_block_count(1024 * MB, 32) == 32
    # big input: bytes dominate — ~64 MB per block, NO constant cap
    assert read_block_count(10_000_000 * MB, 32) == -(-10_000_000 * MB // (64 * MB))
    assert read_block_count(10_000_000 * MB, 32) > 100_000
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
