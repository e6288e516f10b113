"""Vectorized scalar-function library (SURVEY.md §2.3 M-ops, §2.9).

Every helper is a pyarrow.compute kernel chain meant to run inside
``map_batches(batch_format="pyarrow")`` — the Ray Data re-expression of
the reference's per-row CQL/Python string functions. Reference ops
covered (file:line cites in each function):

  M3 brace cleanup · M4/M6 splitters · M5 bracketed-list parse ·
  M7 trim normalizers · M8 empty→null casts · M9 URL constructors ·
  M10 CASE lookup enrich · M11 key rename / projection · M12 truncation
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def trim(arr: pa.ChunkedArray | pa.Array):
    """M7 — `TRIM(row.X)` on every join key (`import_cosmic_fusion.cql:62-87`,
    `remediate_uniprot_pubmed_ids.cql:8-27`)."""
    return pc.utf8_trim_whitespace(arr)


def clean_braces(arr):
    """M3 — strip `{{ }} { }` (BibTeX values, `import_readcube_papers.py:37-41`)."""
    out = arr
    for tok in ("{{", "}}", "{", "}"):
        out = pc.replace_substring(out, tok, "")
    return pc.utf8_trim_whitespace(out)


def split_list(arr, sep: str, drop_empty: bool = True):
    """M6 — pipe/semicolon/comma splitters with trim + empty-drop
    (`import_hgnc.cql:28-37`: `[id IN split(...) WHERE trim(id)<>'' | trim(id)]`)."""
    parts = pc.split_pattern(arr, sep)
    if not drop_empty:
        return parts
    # trim each element then drop ''
    flat = pc.utf8_trim_whitespace(pc.list_flatten(parts))
    # rebuild list array with the same offsets, then filter empties per list
    # (vectorized path: mask-and-regroup via list_filter is not in pyarrow;
    #  emulate with list_filter-like trick through parent indices)
    parent = pc.list_parent_indices(parts)
    keep = pc.not_equal(flat, "")
    kept_parent = pc.filter(parent, keep)
    kept_vals = pc.filter(flat, keep)
    n = len(arr)
    counts = pc.value_counts(kept_parent)
    import numpy as np

    sizes = np.zeros(n, dtype=np.int64)
    idx = counts.field("values").to_numpy(zero_copy_only=False)
    cnt = counts.field("counts").to_numpy(zero_copy_only=False)
    sizes[idx] = cnt
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), kept_vals.combine_chunks()
        if isinstance(kept_vals, pa.ChunkedArray)
        else kept_vals,
    )


def parse_bracketed_list(arr):
    """M5 — `"['a','b']"` → list<string>, scalar fallback
    (`import_monarchkg_relationships.py:26-40`; CQL twin
    `import_monarchkg_nodes.cql:24-100`)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    s = pc.utf8_trim_whitespace(arr)
    is_listish = pc.and_(
        pc.starts_with(s, pattern="["), pc.ends_with(s, pattern="]")
    )
    inner = pc.replace_substring_regex(s, r"^\[|\]$", "")
    listed = split_list(inner, ",")
    # strip quotes at ELEMENT EDGES only — a global replace would also
    # delete interior apostrophes ("O'Brien syndrome" → "OBrien ...")
    if isinstance(listed, pa.ChunkedArray):
        listed = listed.combine_chunks()
    stripped_vals = pc.replace_substring_regex(
        listed.values, "^['\"]|['\"]$", ""
    )
    listed = pa.ListArray.from_arrays(listed.offsets, stripped_vals)
    if isinstance(listed, pa.ChunkedArray):
        listed = listed.combine_chunks()
    # row-wise merge with the scalar fallback (arrow if_else doesn't take
    # list types); this op parses small metadata columns, never hot text
    mask = is_listish.to_numpy(zero_copy_only=False)
    out = []
    for i in range(len(s)):
        if mask[i]:
            out.append(listed[i].as_py())
        else:
            v = s[i].as_py()
            out.append([v] if v else [])
    return pa.array(out, pa.list_(pa.string()))


def cast_empty_null(arr, target: pa.DataType):
    """M8 — `CASE WHEN x<>'' THEN toFloat(x) ELSE null END`
    (`import_cosmic_cmc.cql:21-50` ×30 columns)."""
    trimmed = pc.utf8_trim_whitespace(arr)
    # cast the TRIMMED value (Cypher toFloat(' 1.5 ') parses; a raw
    # whitespace-padded numeric would crash Arrow's cast)
    cleaned = pc.if_else(
        pc.equal(trimmed, ""), pa.scalar(None, pa.string()), trimmed
    )
    return pc.cast(cleaned, target)


def concat_url(prefix: str, arr, suffix: str = ""):
    """M9 — URL constructors (`import_readcube_papers.py:51-56`,
    `load_uniprot.cql:25`)."""
    return pc.binary_join_element_wise(
        pa.scalar(prefix, pa.string()),   # scalars broadcast natively —
        pc.cast(arr, pa.string()),        # no O(n) Python list per batch
        pa.scalar(suffix, pa.string()),
        "",
    )


def case_lookup(arr, mapping: dict[str, str], default: str = "Unknown"):
    """M10 — code→name CASE enrichment (`import_hpo.cql:72-96`).
    Implemented with pc.index_in + take against tiny lookup arrays."""
    keys = pa.array(list(mapping.keys()), pa.string())
    vals = pa.array(list(mapping.values()) + [default], pa.string())
    idx = pc.index_in(arr, value_set=keys)
    idx = pc.fill_null(idx, len(mapping))
    return pc.take(vals, idx)


def truncate(arr, limit: int):
    """M12 — text truncation `[:2000]` before embedding
    (`entrez_gene_embedding.py:10,121` TEXT_CHAR_LIMIT)."""
    return pc.utf8_slice_codeunits(arr, 0, limit)


def rename_space_underscore(table: pa.Table) -> pa.Table:
    """M11 — property-key rename space→underscore
    (`load_ncit_thesaurus.cql:36-44`)."""
    return table.rename_columns([c.replace(" ", "_") for c in table.column_names])


def drop_prefixed_columns(table: pa.Table, prefix: str) -> pa.Table:
    """M11 — `WHERE NOT key STARTS WITH 'date'` (`import_hgnc.cql:25`)."""
    keep = [c for c in table.column_names if not c.startswith(prefix)]
    return table.select(keep)


def first_author(authors_list):
    """M2 — first-author projection `authors[0]` → "first last"
    (`neo4j_pubmed_batch_processor.py:386-397`). Empty lists yield ""
    (pc.list_element raises on out-of-bounds; the reference's Python
    twin returns '' for zero-author papers)."""
    la = (
        authors_list.combine_chunks()
        if isinstance(authors_list, pa.ChunkedArray)
        else authors_list
    )
    import numpy as np

    lens = pc.list_value_length(la).to_numpy(zero_copy_only=False)
    offsets = la.offsets.to_numpy(zero_copy_only=False)[:-1]
    vals = la.values
    out = np.full(len(la), "", dtype=object)
    nz = lens > 0
    if nz.any():
        first_vals = pc.take(vals, pa.array(offsets[nz], pa.int64()))
        out[nz] = first_vals.to_pylist()
    return pa.array(out.tolist(), pa.string())


def year_from_date(arr):
    """M2 — `pub_date.split('-')[0]` year extraction."""
    return pc.list_element(pc.split_pattern(pc.cast(arr, pa.string()), "-"), 0)
