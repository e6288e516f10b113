"""bioontologykg_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the *workload* of fcriscuo/BioOntologyKG
(document → triple extraction → embedding-scored entity linking →
canonicalization → graph materialize; see SURVEY.md) as a streaming
Ray Data DAG over Arrow batches:

- input: Parquet transcript shards ``(conv_id, turn_idx, role, text, tool, ts)``
- stable ordering: ``groupby(conv_id).map_groups(sort by turn_idx)``
- extraction: ``map_batches`` over zero-copy Arrow batches
- linking: actor pool holding a broadcast alias dictionary + embedding matrix
- canonicalization: distributed union-find (iterative groupby min-label)
- output: nodes.parquet + edges.parquet (+ per-partition manifests)

Nothing here calls ``ray.init()``; the caller owns the Ray session.
"""

from bioontologykg_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
