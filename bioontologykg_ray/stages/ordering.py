"""Stable turn ordering.

The north-star invariant (BASELINE.json ``input_hint``): per-turn text
equality must hold under stable turn ordering — re-emitting
``(conv_id, turn_idx, text)`` after this stage equals the input sorted
by ``(conv_id, turn_idx)``.

Reference precedent: deterministic pagination ``ORDER BY p.pubmed_id``
(`src/BioOntologyKG/importers/pubmed/neo4j_citation_relationship_builder.py:92`)
and "process seminal before references" sequencing (SURVEY.md §2.10).

Implementation note: a ``groupby(conv_id).map_groups(sort)`` would call
a Python function once per conversation (~8 rows) — millions of tiny
group calls at scale. A global ``ds.sort([conv_id, turn_idx])`` is the
same stable order via ONE range-partitioned shuffle with vectorized
per-block sorting, so that is what we use; conversations land contiguous
and in turn order, which is exactly what downstream per-conversation
logic needs.
"""

from __future__ import annotations

import ray.data


def order_conversations(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Stable (conv_id, turn_idx) ordering; one range shuffle."""
    return ds.sort(["conv_id", "turn_idx"])
