"""Round-3 additions: size-gated join scale paths, persisted ANN index,
record-level resume, importer edge specs (VERDICT round 2 next-round
items)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_building_orders_partitioned_path_identical(monkeypatch):
    """Forcing the oversized-customer route (bloom-prefiltered
    partitioned semi-join) must give the byte-identical aggregate the
    broadcast path gives (VERDICT round 2 #1)."""
    from bioontologykg_ray.pipelines import queries as Q

    fast = Q.q_building_orders(SF)
    monkeypatch.setattr(Q, "_SEMI_BROADCAST_MAX_ROWS", 0)
    dist = Q.q_building_orders(SF)
    pd.testing.assert_frame_equal(fast, dist)


def test_customers_without_orders_partitioned_path_identical(monkeypatch):
    """Forcing the oversized-orders route (distributed distinct +
    left_anti hash join) must match the broadcast anti-join exactly."""
    from bioontologykg_ray.pipelines import queries as Q

    fast = Q.q_customers_without_orders(SF)
    monkeypatch.setattr(Q, "_SEMI_BROADCAST_MAX_ROWS", 0)
    dist = Q.q_customers_without_orders(SF)
    assert list(fast.columns) == list(dist.columns) == ["c_custkey"]
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), dist.reset_index(drop=True),
        check_dtype=False,
    )


def _ivf_setup(tmp_path):
    import ray.data as rd

    from bioontologykg_ray.pipelines.queries import _rp
    from bioontologykg_ray.stages import ann as ANN

    ds = _rp(SF, "embeddings", columns=["vec_id", "embedding"])
    index_dir = str(tmp_path / "ivf_index")
    ANN.build_ivf_index(ds, index_dir, n_cells=16)
    return ds, index_dir, ANN


def test_ivf_indexed_matches_unindexed(tmp_path):
    """Persisted-index serving returns IDENTICAL rows to the in-pass IVF
    with the same build parameters (VERDICT round 2 #2)."""
    from bioontologykg_ray.stages import ann as ANNmod

    ds, index_dir, ANN = _ivf_setup(tmp_path)
    qids = [0, 1, 2, 3, 4]
    live = ANN.ann_topk_ivf(ds, qids, k=10, n_cells=16, nprobe=4).to_pandas()
    idx = ANN.ann_topk_ivf_indexed(index_dir, ds, qids, k=10, nprobe=4).to_pandas()
    key = ["query_id", "rank"]
    pd.testing.assert_frame_equal(
        live.sort_values(key).reset_index(drop=True),
        idx.sort_values(key).reset_index(drop=True),
    )


def test_ivf_probe_reads_only_matching_partitions(tmp_path):
    """The probe must touch ONLY the queries' nprobe cell partitions:
    poisoning every non-probed cell directory with a corrupt parquet
    file must not affect serving (structural pruning, not predicate)."""
    import os

    ds, index_dir, ANN = _ivf_setup(tmp_path)
    qids = [0, 1, 2, 3, 4]

    C = ANN.load_ivf_centroids(index_dir)
    qdf = ANN._fetch_queries(ds, qids)
    Q = ANN._normalize(ANN._as_matrix(qdf["embedding"]))
    qcells = np.argsort(-(Q @ C.T), axis=1)[:, :2]
    probed = set(ANN.ivf_probe_paths(index_dir, qcells.ravel()))

    all_cells = {
        os.path.join(index_dir, d)
        for d in os.listdir(index_dir)
        if d.startswith("cell=")
    }
    assert probed and probed < all_cells  # strict subset: pruning is real

    for p in all_cells - probed:
        for f in os.listdir(p):
            with open(os.path.join(p, f), "wb") as fh:
                fh.write(b"not a parquet file")

    out = ANN.ann_topk_ivf_indexed(index_dir, ds, qids, k=10, nprobe=2).to_pandas()
    assert len(out) > 0 and set(out["query_id"]) == set(qids)


def test_in_place_shard_change_invalidates_resume(tmp_path):
    """A shard whose CONTENTS change in place (same file name) must fail
    the lineage check and recompute its partition (ADVICE round 2 —
    lineage records size+mtime, not just paths)."""
    import glob
    import os
    import shutil

    from bioontologykg_ray import synth
    from bioontologykg_ray.config import PipelineConfig
    from bioontologykg_ray.pipelines.kg import run_partitioned

    cfg = PipelineConfig(link_concurrency=2, extract_batch_size=512)
    d = synth.ensure_synth(0.001)
    src_files = sorted(glob.glob(os.path.join(d, "transcripts", "*.parquet")))
    assert len(src_files) >= 2
    ont = os.path.join(d, "ontology_terms.parquet")

    tdir = str(tmp_path / "transcripts")
    os.makedirs(tdir)
    for f in src_files[:2]:
        shutil.copy(f, tdir)
    local = sorted(glob.glob(os.path.join(tdir, "*.parquet")))

    out = str(tmp_path / "out")
    run_partitioned(tdir, ont, out, cfg, partition_by="file")
    phase1 = os.path.join(out, "phase1")
    mts = {
        p: os.path.getmtime(os.path.join(p, "manifest.json"))
        for p in glob.glob(os.path.join(phase1, "part-*"))
    }

    # swap shard 0's CONTENTS for shard 1's, keeping the name
    shutil.copy(local[1], local[0])
    run_partitioned(tdir, ont, out, cfg, partition_by="file")
    after = {
        p: os.path.getmtime(os.path.join(p, "manifest.json"))
        for p in glob.glob(os.path.join(phase1, "part-*"))
    }
    changed = [p for p in mts if after[p] != mts[p]]
    assert len(changed) == 1  # only the mutated shard's partition reran

    # and the result equals a from-scratch run over the mutated input
    out2 = str(tmp_path / "out2")
    run_partitioned(tdir, ont, out2, cfg, partition_by="file")
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    def edges(o):
        fs = sorted(glob.glob(os.path.join(o, "graph", "edges", "*.parquet")))
        df = pa.concat_tables([pq.read_table(f) for f in fs]).to_pandas()
        return df.sort_values(["src", "predicate", "dst"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(edges(out), edges(out2))


def test_scratch_cleanup_refuses_stray_entries(tmp_path):
    """The spill-scratch sweep must refuse a caller-supplied dir holding
    anything but our parquet part files (ADVICE round 2: the old sweep
    os.unlink'ed blindly and crashed on subdirectories)."""
    import os

    import pytest

    from bioontologykg_ray import synth
    from bioontologykg_ray.config import PipelineConfig
    from bioontologykg_ray.pipelines.kg import run_kg_pipeline

    d = synth.ensure_synth(0.001)
    scratch = str(tmp_path / "scratch")
    os.makedirs(os.path.join(scratch, "user_data"))
    with pytest.raises(RuntimeError, match="non-scratch entries"):
        run_kg_pipeline(
            os.path.join(d, "transcripts"),
            os.path.join(d, "ontology_terms.parquet"),
            PipelineConfig(link_concurrency=2),
            scratch_dir=scratch,
        )
    assert os.path.isdir(os.path.join(scratch, "user_data"))  # untouched


def test_triangle_counts_rejects_oversized_ids():
    """Ids >= 2^32 would alias the packed wedge key — must raise, not
    silently miscount (ADVICE round 2)."""
    import pytest
    import ray.data as rd

    from bioontologykg_ray.stages.graph import triangle_counts

    edges = pd.DataFrame({"u": [1, 2, 1 << 33], "v": [2, 1 << 33, 1]})
    with pytest.raises(ValueError, match="densify"):
        triangle_counts(rd.from_pandas(edges), u_col="u", v_col="v").to_pandas()


def test_importer_label_from_column():
    """Dynamic node label from a data column (label_from + label_map +
    default), merged 'first' like any property."""
    import ray.data as rd

    from bioontologykg_ray.sources.importer import (
        ColumnSpec, TableSpec, import_table,
    )

    df = pd.DataFrame(
        {
            "row_no": [1, 2, 3, 4],
            "node_id": ["a", "a", "b", "c"],
            "category": ["gene", "protein", "unknown_cat", "disease"],
            "name": ["A1", "A2", "B", "C"],
        }
    )
    spec = TableSpec(
        key="node_id", order="row_no",
        columns=(
            ColumnSpec("row_no", type="int64"),
            ColumnSpec("node_id"),
            ColumnSpec("name"),
        ),
        label_from="category",
        label_map={"gene": "Gene", "protein": "Protein", "disease": "Disease"},
        label_default="node",
    )
    out = import_table(rd.from_pandas(df), spec).to_pandas()
    out = out.sort_values("node_id").reset_index(drop=True)
    assert list(out["label"]) == ["Gene", "node", "Disease"]  # first wins; miss→default
    assert list(out["name"]) == ["A1", "B", "C"]


def test_import_edges_default_predicate():
    """With default_predicate set, unmapped codes keep the row under the
    fallback type instead of dropping it."""
    import ray.data as rd

    from bioontologykg_ray.sources.importer import EdgeSpec, import_edges

    df = pd.DataFrame(
        {
            "s": ["x", "x", "y", "z"],
            "p": ["R", "N", "R", None],
            "o": ["p1", "p1", "p2", "p3"],
        }
    )
    spec = EdgeSpec(
        subject="s", predicate="p", object="o",
        predicate_map={"R": "RETURNED"}, default_predicate="RELATED_TO",
    )
    out = import_edges(rd.from_pandas(df), spec).to_pandas()
    out = out.sort_values(["src", "predicate", "dst"]).reset_index(drop=True)
    assert list(out["predicate"]) == ["RELATED_TO", "RETURNED", "RETURNED", "RELATED_TO"]
    assert list(out["n_mentions"]) == [1, 1, 1, 1]


def test_record_level_salvage_resume(tmp_path):
    """Kill-resume INSIDE a partition (VERDICT round 2 #4): with a
    partial flagged/ output left in the tmp dir, the resumed run
    reprocesses ONLY the conversations missing from it, and the final
    graph is identical to an uninterrupted run."""
    import glob
    import json
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bioontologykg_ray import synth
    from bioontologykg_ray.config import PipelineConfig
    from bioontologykg_ray.pipelines import kg as KG
    from bioontologykg_ray.pipelines import manifest as mf

    cfg = PipelineConfig(link_concurrency=2, extract_batch_size=512)
    d = synth.ensure_synth(0.001)
    tdir = os.path.join(d, "transcripts")
    ont = os.path.join(d, "ontology_terms.parquet")

    # uninterrupted reference run
    out_ref = str(tmp_path / "ref")
    KG.run_partitioned(tdir, ont, out_ref, cfg, n_parts=2)

    def edges(o):
        fs = sorted(glob.glob(os.path.join(o, "graph", "edges", "*.parquet")))
        df = pa.concat_tables([pq.read_table(f) for f in fs]).to_pandas()
        return df.sort_values(["src", "predicate", "dst"]).reset_index(drop=True)

    ref_edges = edges(out_ref)

    # simulate a kill mid-partition-0: demote its finished output to a
    # tmp dir holding only SOME of the flagged part files + one
    # footerless partial, with the lineage marker a live write leaves
    out = str(tmp_path / "out")
    KG.run_partitioned(tdir, ont, out, cfg, n_parts=2)
    phase1 = os.path.join(out, "phase1")
    part0 = mf.partition_dir(phase1, 0)
    tmp0 = part0 + ".tmp"
    shutil.move(part0, tmp0)
    os.unlink(os.path.join(tmp0, "manifest.json"))
    flag_files = sorted(glob.glob(os.path.join(tmp0, "flagged", "*.parquet")))
    assert len(flag_files) >= 2, "need >=2 part files to keep a strict subset"
    all_convs = set()
    for f in flag_files:
        all_convs.update(pq.read_table(f, columns=["conv_id"])["conv_id"].to_pylist())
    kept = flag_files[: len(flag_files) // 2]
    kept_convs = set()
    for f in flag_files:
        if f in kept:
            kept_convs.update(
                pq.read_table(f, columns=["conv_id"])["conv_id"].to_pylist()
            )
        else:
            os.unlink(f)
    missing = all_convs - kept_convs
    assert missing, "subset must actually drop some convs"
    with open(os.path.join(tmp0, "flagged", "partial-killed.parquet"), "wb") as f:
        f.write(b"no parquet footer here")

    # the salvage contract is over INPUT convs: convs that emitted zero
    # flagged rows never appear in the output and legitimately rerun
    # (idempotent no-ops), so the expected rerun set is input minus kept
    m0_ref = mf.load_manifest(os.path.join(out_ref, "phase1"), 0)
    input_convs = set()
    for f in m0_ref["lineage"]["inputs"]:
        input_convs.update(pq.read_table(f, columns=["conv_id"])["conv_id"].to_pylist())
    expected_rerun = input_convs - kept_convs
    assert missing <= expected_rerun

    # instrument: count convs that actually flow through extraction
    seen_convs: set = set()
    orig_extract = KG.extract_triples

    def spy_extract(ds, **kw):
        import pandas as pd

        for b in ds.iter_batches(batch_format="pandas", batch_size=4096):
            seen_convs.update(b["conv_id"])
        return orig_extract(ds, **kw)

    KG.extract_triples = spy_extract
    try:
        KG.run_partitioned(tdir, ont, out, cfg, n_parts=2)
    finally:
        KG.extract_triples = orig_extract

    # only partition 0 was pending, and within it only the non-salvaged
    # convs ran — every salvaged conv was anti-joined out of the input
    assert seen_convs == expected_rerun
    assert seen_convs.isdisjoint(kept_convs)
    pd.testing.assert_frame_equal(edges(out), ref_edges)
    # metrics still cover the WHOLE partition (salvaged + reprocessed)
    m0 = mf.load_manifest(phase1, 0)
    assert m0["metrics"] == m0_ref["metrics"]


def test_minhash_fused_matches_staged():
    """The 2-exchange fused MinHash plan must return exactly the
    3-exchange staged plan's verified pairs (VERDICT round 2 #7)."""
    from bioontologykg_ray.pipelines.queries import _docs_plus_truncated_copies
    from bioontologykg_ray.stages import neardup as ND

    docs = _docs_plus_truncated_copies(SF)
    key = ["doc_a", "doc_b"]
    staged = (
        ND.minhash_lsh_pairs(docs, n=3, tau=0.6, fuse_verify=False)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    fused = (
        ND.minhash_lsh_pairs(docs, n=3, tau=0.6, fuse_verify=True)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    assert len(staged) > 0
    pd.testing.assert_frame_equal(staged, fused)


def test_salvage_resume_with_everything_salvaged(tmp_path):
    """Edge case: the kill landed AFTER all flagged files were written
    but BEFORE the manifest — every conversation salvages, the rerun's
    remaining input is empty, and the partition still finalizes with
    correct metrics."""
    import glob
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bioontologykg_ray import synth
    from bioontologykg_ray.config import PipelineConfig
    from bioontologykg_ray.pipelines import kg as KG
    from bioontologykg_ray.pipelines import manifest as mf

    cfg = PipelineConfig(link_concurrency=2, extract_batch_size=512)
    d = synth.ensure_synth(0.001)
    tdir = os.path.join(d, "transcripts")
    ont = os.path.join(d, "ontology_terms.parquet")

    out = str(tmp_path / "out")
    KG.run_partitioned(tdir, ont, out, cfg, n_parts=2)
    phase1 = os.path.join(out, "phase1")
    ref_m0 = mf.load_manifest(phase1, 0)

    def edges(o):
        fs = sorted(glob.glob(os.path.join(o, "graph", "edges", "*.parquet")))
        df = pa.concat_tables([pq.read_table(f) for f in fs]).to_pandas()
        return df.sort_values(["src", "predicate", "dst"]).reset_index(drop=True)

    ref_edges = edges(out)

    part0 = mf.partition_dir(phase1, 0)
    shutil.move(part0, part0 + ".tmp")
    os.unlink(os.path.join(part0 + ".tmp", "manifest.json"))

    KG.run_partitioned(tdir, ont, out, cfg, n_parts=2)
    assert mf.load_manifest(phase1, 0)["metrics"] == ref_m0["metrics"]
    pd.testing.assert_frame_equal(edges(out), ref_edges)


def test_import_edges_passthrough_null_predicates():
    """No predicate_map: raw predicates pass through; NULL predicates
    drop (default None) or take the fallback — never silently vanish in
    a downstream groupby."""
    import ray.data as rd

    from bioontologykg_ray.sources.importer import EdgeSpec, import_edges

    df = pd.DataFrame(
        {"s": ["x", "y", "z"], "p": ["REL", None, "REL"], "o": ["a", "b", "c"]}
    )
    dropped = import_edges(
        rd.from_pandas(df), EdgeSpec(subject="s", predicate="p", object="o")
    ).to_pandas().sort_values("src").reset_index(drop=True)
    assert list(dropped["src"]) == ["x", "z"]
    assert set(dropped["predicate"]) == {"REL"}

    kept = import_edges(
        rd.from_pandas(df),
        EdgeSpec(subject="s", predicate="p", object="o",
                 default_predicate="RELATED_TO"),
    ).to_pandas().sort_values("src").reset_index(drop=True)
    assert list(kept["predicate"]) == ["REL", "RELATED_TO", "REL"]


def test_ivf_build_is_atomic_and_race_safe(tmp_path):
    """A killed build must leave no partial cell partitions at the
    final path (tmp-dir publish), and a second build over an existing
    complete index must not duplicate vectors."""
    import glob
    import os

    ds, index_dir, ANN = _ivf_setup(tmp_path)
    # no orphaned tmps after a successful build
    assert not glob.glob(index_dir + ".build-*")
    n_files = len(glob.glob(os.path.join(index_dir, "cell=*", "*.parquet")))

    # rebuild onto the existing complete index: the loser path discards
    ANN.build_ivf_index(ds, index_dir, n_cells=16)
    assert len(glob.glob(os.path.join(index_dir, "cell=*", "*.parquet"))) == n_files
    out = ANN.ann_topk_ivf_indexed(index_dir, ds, [0, 1], k=10, nprobe=4).to_pandas()
    # no duplicated (query, vec) rows from an append
    assert not out.duplicated(["query_id", "vec_id"]).any()


def test_ivf_build_survives_orphaned_tmp(tmp_path):
    """An orphaned tmp dir from a killed earlier build must not leak
    into the published index, and a successful publish sweeps it."""
    import glob
    import os

    import ray.data as rd

    from bioontologykg_ray.pipelines.queries import _rp
    from bioontologykg_ray.stages import ann as ANN

    ds = _rp(SF, "embeddings", columns=["vec_id", "embedding"])
    index_dir = str(tmp_path / "ivf_index")
    # simulate a killed build: partial cell dirs + junk inside a tmp,
    # backdated past the sweep's age gate (a FRESH tmp might belong to
    # a live racing builder and must be left alone)
    orphan = index_dir + ".build-dead0"
    os.makedirs(os.path.join(orphan, "cell=0"))
    with open(os.path.join(orphan, "cell=0", "partial.parquet"), "wb") as f:
        f.write(b"killed mid-write")
    old = 10_000.0  # sweep checks the root AND immediate children
    os.utime(os.path.join(orphan, "cell=0"), (old, old))
    os.utime(orphan, (old, old))

    # a fresh tmp (simulated live racer) survives the sweep
    live = index_dir + ".build-live0"
    os.makedirs(live)

    ANN.build_ivf_index(ds, index_dir, n_cells=16)
    left = glob.glob(index_dir + ".build-*")
    assert left == [live]  # backdated orphan swept, live tmp untouched
    # the published index contains no junk files
    for fp in glob.glob(os.path.join(index_dir, "cell=*", "*.parquet")):
        import pyarrow.parquet as pq

        pq.read_metadata(fp)  # raises on a non-parquet leftover
    out = ANN.ann_topk_ivf_indexed(index_dir, ds, [0, 1], k=5, nprobe=4).to_pandas()
    assert len(out) > 0
