"""Checkpoint/resume (FIXTURES.md F4 invariant 4): killing after
partition k and resuming yields identical outputs; finished partitions
are skipped on rerun."""

import glob
import json
import os
import shutil

import pandas as pd
import pytest

from bioontologykg_ray import synth
from bioontologykg_ray.config import PipelineConfig
from bioontologykg_ray.pipelines import manifest as mf
from bioontologykg_ray.pipelines.kg import run_partitioned

CFG = PipelineConfig(link_concurrency=2, extract_batch_size=512)


def _graph_edges(out_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq
    import pyarrow as pa

    files = sorted(glob.glob(os.path.join(out_dir, "graph", "edges", "*.parquet")))
    df = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    return df.sort_values(["src", "predicate", "dst"]).reset_index(drop=True)


def test_partitioned_run_and_resume(tmp_path):
    d = synth.ensure_synth(0.001)
    tdir = os.path.join(d, "transcripts")
    ont = os.path.join(d, "ontology_terms.parquet")
    out = str(tmp_path / "out")

    run_partitioned(tdir, ont, out, CFG, n_parts=4)
    full = _graph_edges(out)
    assert len(full) > 0

    # manifests carry lineage + metrics per partition
    for pid in range(4):
        m = mf.load_manifest(os.path.join(out, "phase1"), pid)
        assert m is not None
        assert m["lineage"]["inputs"]
        assert m["metrics"]["rows_linked"] >= 0

    # simulate a crash: wipe partitions 2 and 3 (data + manifest)
    for pid in (2, 3):
        shutil.rmtree(mf.partition_dir(os.path.join(out, "phase1"), pid))
    kept0 = mf.manifest_path(os.path.join(out, "phase1"), 0)
    mtime0 = os.path.getmtime(kept0)

    # resume: only the missing partitions are recomputed
    pend = mf.pending_partitions(os.path.join(out, "phase1"), 4)
    assert pend == [2, 3]
    run_partitioned(tdir, ont, out, CFG, n_parts=4)
    assert os.path.getmtime(kept0) == mtime0  # partition 0 untouched

    resumed = _graph_edges(out)
    pd.testing.assert_frame_equal(full, resumed)  # identical outputs


def test_atomic_partition_write(tmp_path):
    """A write_fn crash leaves no manifest → partition stays pending."""
    root = str(tmp_path / "p")

    def boom(tmp_dir):
        with open(os.path.join(tmp_dir, "partial.parquet"), "w") as f:
            f.write("junk")
        raise RuntimeError("killed mid-write")

    with pytest.raises(RuntimeError):
        mf.write_partition(root, 0, boom, lineage={}, metrics={})
    assert not mf.is_done(root, 0)
    assert mf.pending_partitions(root, 1) == [0]

    def ok(tmp_dir):
        with open(os.path.join(tmp_dir, "data.txt"), "w") as f:
            f.write("good")

    m = mf.write_partition(root, 0, ok, lineage={"inputs": ["x"]}, metrics={"rows": 1})
    assert mf.is_done(root, 0)
    assert m["metrics"]["rows"] == 1
    with open(mf.manifest_path(root, 0)) as f:
        assert json.load(f)["lineage"]["inputs"] == ["x"]


def test_file_keyed_incremental_append(tmp_path):
    """partition_by='file': appending a shard and rerunning recomputes
    ONLY the new file's partition (existing manifests untouched), and
    the final graph equals a from-scratch run over the full input."""
    d = synth.ensure_synth(0.001)
    src_files = sorted(glob.glob(os.path.join(d, "transcripts", "*.parquet")))
    assert len(src_files) >= 2
    ont = os.path.join(d, "ontology_terms.parquet")

    tdir = str(tmp_path / "transcripts")
    os.makedirs(tdir)
    for f in src_files[:-1]:
        shutil.copy(f, tdir)

    out = str(tmp_path / "out")
    run_partitioned(tdir, ont, out, CFG, partition_by="file")
    phase1 = os.path.join(out, "phase1")
    before = {
        p: os.path.getmtime(os.path.join(p, "manifest.json"))
        for p in glob.glob(os.path.join(phase1, "part-*"))
    }
    assert len(before) == len(src_files) - 1

    # append the last shard and rerun — incremental update
    shutil.copy(src_files[-1], tdir)
    run_partitioned(tdir, ont, out, CFG, partition_by="file")
    after = {
        p: os.path.getmtime(os.path.join(p, "manifest.json"))
        for p in glob.glob(os.path.join(phase1, "part-*"))
    }
    assert len(after) == len(src_files)
    for p, t in before.items():  # old partitions were skipped, not rerun
        assert after[p] == t

    # equivalence with a from-scratch run over the full input
    out_full = str(tmp_path / "out_full")
    run_partitioned(tdir, ont, out_full, CFG, partition_by="file")
    pd.testing.assert_frame_equal(_graph_edges(out), _graph_edges(out_full))


def test_file_keyed_refuses_removed_input(tmp_path):
    """A partition dir whose input file has since been REMOVED must not
    silently leak into phase 2 — the run refuses."""
    d = synth.ensure_synth(0.001)
    src_files = sorted(glob.glob(os.path.join(d, "transcripts", "*.parquet")))
    ont = os.path.join(d, "ontology_terms.parquet")

    tdir = str(tmp_path / "transcripts")
    os.makedirs(tdir)
    for f in src_files[:2]:
        shutil.copy(f, tdir)
    out = str(tmp_path / "out")
    run_partitioned(tdir, ont, out, CFG, partition_by="file")

    os.remove(os.path.join(tdir, os.path.basename(src_files[0])))
    with pytest.raises(RuntimeError, match="grouping mismatch"):
        run_partitioned(tdir, ont, out, CFG, partition_by="file")
