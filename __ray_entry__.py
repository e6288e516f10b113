"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in bioontologykg_ray) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``    — flagship KG-construction DAG at sf0.001 (reads the
  testdata documents table as the smoke input and the deterministic
  synthetic transcript corpus the north rule's input_hint specifies).
- ``queries()``  — one entry per implemented operator/pipeline from
  SURVEY.md §2 plus the training-data ops (dedup family, ANN, text
  analysis, multimodal plumbing) and the KG flagship stages.
- ``oracle_sql()`` — DuckDB-equivalent SQL per query (same column names
  and dtypes; floats rounded identically on both sides). Non-SQL-
  expressible ops are omitted → driver records rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline (smoke): KG construction over the sf0.001
    synthetic transcript corpus; also touches the driver's sf0.001
    documents table to exercise the parquet read path."""
    import os

    import ray.data as rd

    from bioontologykg_ray import synth
    from bioontologykg_ray.config import PipelineConfig
    from bioontologykg_ray.pipelines.kg import run_kg_pipeline

    # touch the driver-provided table (S1 read path)
    _ = rd.read_parquet("/root/testdata/sf0.001/documents.parquet").count()

    d = synth.ensure_synth(0.001)
    res = run_kg_pipeline(
        os.path.join(d, "transcripts"),
        os.path.join(d, "ontology_terms.parquet"),
        PipelineConfig(),
    )
    return res["edges"]


def queries() -> dict[str, Callable[[str], Any]]:
    from bioontologykg_ray import synth
    from bioontologykg_ray.pipelines.queries import QUERIES

    # the oracle SQL for the KG entries reads the sf0.01 synthetic
    # corpus from /tmp — make sure it exists before any SQL runs
    synth.ensure_synth(0.01)
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from bioontologykg_ray import synth
    from bioontologykg_ray.pipelines.queries import ORACLE

    synth.ensure_synth(0.01)
    return dict(ORACLE)
