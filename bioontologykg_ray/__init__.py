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

import logging as _logging

from bioontologykg_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"


class _EmptyBlockSizeNoise(_logging.Filter):
    """Ray's pandas block-size estimator calls ``np.vectorize`` on
    0-row object columns and logs a warning per empty block
    ("Error calculating size ... size 0 inputs unless `otypes`").
    Empty boundary slices are a normal product of the sorted-group
    passes here, the estimate for an EMPTY block is irrelevant, and the
    wart is Ray-internal — drop exactly that message (installed in
    workers too: they import this package to unpickle our callables)."""

    def filter(self, record: _logging.LogRecord) -> bool:  # noqa: A003
        msg = record.getMessage()
        return not (
            "Error calculating size for column" in msg
            and "size 0 inputs" in msg
        )


_logging.getLogger("ray.data._internal.pandas_block").addFilter(
    _EmptyBlockSizeNoise()
)


def ensure_quiet() -> None:
    """No-op marker. Call (or merely reference) this from inside a
    closure that is shipped to Ray workers: cloudpickle then pickles the
    closure's global by REFERENCE, forcing the worker process to import
    this package — which installs the log-noise filter above. Closures
    with no package-level globals are pickled fully by value and would
    otherwise run in workers that never imported us."""
