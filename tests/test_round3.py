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
