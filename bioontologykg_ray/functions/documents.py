"""Nested-document operators (SURVEY.md §2.3 M1/M2, §2.8 D7).

The reference's PubMed parser builds an 18-field doc with nested
authors / mesh_terms / keywords and derived projections
(`neo4j_pubmed_batch_processor.py:73-324`):

- label-prefixed abstract concat: sections joined as "LABEL: text"
  (`:100-129`)
- first-author projection "first last" + year extraction (`:386-397`)
- affiliation set-dedup within a doc (`:260-271`)
- author/mesh child-table explode with position / major_topic edge
  props (`PubMedAbstractEmbedding.py:162-220`)

These run on `list<struct>` Arrow columns via map_batches.
"""

from __future__ import annotations

import pyarrow as pa

AUTHOR = pa.struct(
    [("last_name", pa.string()), ("first_name", pa.string()),
     ("initials", pa.string()), ("affiliation", pa.string())]
)
MESH = pa.struct([("descriptor", pa.string()), ("major_topic", pa.bool_())])
SECTION = pa.struct([("label", pa.string()), ("text", pa.string())])


def abstract_concat(sections_col) -> pa.Array:
    """M1 — list<struct{label,text}> → "LABEL: text LABEL2: text2"."""
    out = []
    for secs in sections_col.to_pylist():
        parts = []
        for s in secs or []:
            label = (s.get("label") or "").strip()
            text = (s.get("text") or "").strip()
            parts.append(f"{label}: {text}" if label else text)
        out.append(" ".join(parts))
    return pa.array(out, pa.string())


def first_author_name(authors_col) -> pa.Array:
    """M2 — authors[0] → "first last" ('' when absent)."""
    out = []
    for authors in authors_col.to_pylist():
        a = authors[0] if authors else None
        if a is not None:  # a null STRUCT element is legal in arrow
            out.append(f"{a.get('first_name') or ''} {a.get('last_name') or ''}".strip())
        else:
            out.append("")
    return pa.array(out, pa.string())


def dedup_affiliations(authors_col) -> pa.Array:
    """D7 — set-dedup of affiliations within a doc (insertion order)."""
    out = []
    for authors in authors_col.to_pylist():
        seen: dict = {}
        for a in authors or []:
            if a is None:  # null element inside a valid list
                continue
            aff = (a.get("affiliation") or "").strip()
            if aff:
                seen.setdefault(aff, None)
        out.append(list(seen))
    return pa.array(out, pa.list_(pa.string()))


def flatten_documents(t: pa.Table) -> pa.Table:
    """M1/M2 projection over the nested doc table."""
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "title": t["title"],
            "abstract": abstract_concat(t["sections"]),
            "first_author": first_author_name(t["authors"]),
            "year": t["year"],
            "affiliations": dedup_affiliations(t["authors"]),
        }
    )


def explode_authors(t: pa.Table) -> pa.Table:
    """Child-table explode: one row per (doc, author) with position
    (PubMedAbstractEmbedding.py:162-189)."""
    doc_ids, positions, last, first = [], [], [], []
    for did, authors in zip(t["doc_id"].to_pylist(), t["authors"].to_pylist()):
        for i, a in enumerate(authors or []):
            if a is None:
                continue
            doc_ids.append(did)
            positions.append(i)
            last.append(a.get("last_name") or "")
            first.append(a.get("first_name") or "")
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "position": pa.array(positions, pa.int32()),
            "last_name": pa.array(last, pa.string()),
            "first_name": pa.array(first, pa.string()),
        }
    )


def explode_mesh(t: pa.Table) -> pa.Table:
    """Child-table explode: one row per (doc, mesh descriptor) with the
    major_topic edge property (:214-239)."""
    doc_ids, descs, major = [], [], []
    for did, terms in zip(t["doc_id"].to_pylist(), t["mesh_terms"].to_pylist()):
        for m in terms or []:
            if m is None:
                continue
            doc_ids.append(did)
            descs.append(m.get("descriptor") or "")
            major.append(bool(m.get("major_topic")))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "descriptor": pa.array(descs, pa.string()),
            "major_topic": pa.array(major, pa.bool_()),
        }
    )
