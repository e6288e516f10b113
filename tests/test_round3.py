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
