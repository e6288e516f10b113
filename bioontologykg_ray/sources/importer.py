"""Declarative tabular importer: column spec → typed, key-merged dataset.

The reference's ~20 CQL import scripts are instances of one declarative
pattern — `LOAD CSV WITH HEADERS`, per-column `split()` / `toInteger()`
/ `CASE` lookups, `MERGE` on a key, per-property collision policy
(`cql/import/import_hgnc.cql:22-42`,
`prompts/import/monarchkg/monarch_relationships_generic_prompt.txt`,
concat-on-match `cql/import/david/david_gene_name.cql:40-43`). This
module is that pattern as ONE operator: a :class:`TableSpec` describes
the columns (rename, cast, list-split, code→label lookup) and the
per-column merge policy applied when several input rows share a key.

Merge policies (all order-deterministic via the spec's ``order``
column, null-skipping — `ON CREATE` / `SET` / concat semantics):

- ``first``  — first non-null value in arrival order (ON CREATE wins)
- ``last``   — last non-null value (SET overwrite)
- ``concat`` — arrival-ordered join of non-empty values with ``sep``

Scale shape: per-column transforms are a vectorized ``map_batches``;
the key-merge is an exact grouped apply over complete key groups
(stages/agg.sorted_group_apply — one range sort, no per-key task
dispatch, no driver state).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import ray.data


@dataclass(frozen=True)
class ColumnSpec:
    source: str                     # input column name
    out: str | None = None          # output name (default: source)
    type: str = "string"            # string | int64 | float64
    split: str | None = None        # sep → list<string> (trimmed, empties dropped)
    lookup: dict | None = None      # code → label (M10); misses → null
    empty_null: bool = True         # "" → null before cast / lookup

    @property
    def name(self) -> str:
        return self.out or self.source


@dataclass(frozen=True)
class TableSpec:
    key: str                        # OUTPUT key column (MERGE key)
    order: str                      # OUTPUT column giving arrival order
    columns: tuple[ColumnSpec, ...] = ()
    merge: dict = field(default_factory=dict)   # out-col → first|last|concat
    concat_sep: str = "|"
    # dynamic node label from a DATA column (the reference's
    # label-from-category imports, `import_monarchkg_nodes.cql:20-21`:
    # the CSV `category` column becomes the node label). In a tables
    # world the label is just a column — this spells that out as spec
    # surface: the source column's value (optionally through
    # ``label_map``) lands in an output ``label`` column, merged
    # 'first' like any property.
    label_from: str | None = None
    label_map: dict | None = None   # raw value → label; misses → default
    label_default: str = "node"


def _apply_columns(spec: TableSpec):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(index=df.index)
        for c in spec.columns:
            s = df[c.source]
            if c.empty_null and s.dtype == object:
                s = s.replace("", None)
            if c.lookup is not None:
                s = s.map(c.lookup)
            if c.split is not None:
                s = s.map(
                    lambda v: [p.strip() for p in v.split(c.split) if p.strip()]
                    if isinstance(v, str)
                    else []
                )
            elif c.type == "int64":
                s = s.astype("Int64")
            elif c.type == "float64":
                s = s.astype("Float64")
            out[c.name] = s
        if spec.label_from is not None:
            lbl = df[spec.label_from]
            if spec.label_map is not None:
                lbl = lbl.map(spec.label_map)
            out["label"] = lbl.fillna(spec.label_default)
        return out

    return fn


def _value_cols(spec: TableSpec) -> list[str]:
    cols = [c.name for c in spec.columns if c.name not in (spec.key, spec.order)]
    if spec.label_from is not None and "label" not in cols:
        cols.append("label")
    return cols


def _merge_groups(spec: TableSpec):
    value_cols = _value_cols(spec)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            # typed empty frame: 'string'/'Float64' dtypes keep Ray's
            # block-size estimator off np.vectorize-on-empty warnings
            specs = {c.name: c for c in spec.columns}
            cols = {spec.key: pd.Series(dtype="string")}
            for c in value_cols:
                cs = specs.get(c)
                if cs is not None and cs.type == "float64" and cs.split is None:
                    cols[c] = pd.Series(dtype="Float64")
                elif cs is not None and cs.type == "int64" and cs.split is None:
                    cols[c] = pd.Series(dtype="Int64")
                elif cs is not None and cs.split is not None and spec.merge.get(c, "first") != "concat":
                    # first/last over a split column yields LISTS
                    cols[c] = pd.Series(dtype="object")
                else:
                    cols[c] = pd.Series(dtype="string")
            cols["n_rows"] = pd.Series(dtype=np.int64)
            return pd.DataFrame(cols)
        d = df.sort_values(spec.order, kind="mergesort")
        # dropna=False: the SQL oracle's GROUP BY retains a NULL-keyed
        # group (empty keys are nulled by the empty->null cast upstream);
        # pandas' default would silently drop those rows
        g = d.groupby(spec.key, sort=False, dropna=False)
        out = pd.DataFrame({"n_rows": g.size().astype(np.int64)})
        for c in value_cols:
            policy = spec.merge.get(c, "first")
            if policy == "first":
                out[c] = g[c].first()      # pandas first = first non-null
            elif policy == "last":
                out[c] = g[c].last()       # last non-null (SET overwrite)
            elif policy == "concat":
                sep = spec.concat_sep

                def cat(s: pd.Series) -> str | None:
                    parts = []
                    for v in s:
                        if isinstance(v, list):
                            parts.extend(v)
                        elif isinstance(v, str) and v:
                            parts.append(v)
                    return sep.join(parts) if parts else None

                out[c] = g[c].apply(cat)
            else:
                raise ValueError(f"unknown merge policy {policy!r} for {c}")
        return out.reset_index()[[spec.key] + value_cols + ["n_rows"]]

    return fn


def import_table(ds: ray.data.Dataset, spec: TableSpec) -> ray.data.Dataset:
    """Raw headered rows → typed, key-merged table per the spec."""
    from bioontologykg_ray.stages.agg import sorted_group_apply

    typed = ds.map_batches(_apply_columns(spec), batch_format="pandas")
    return sorted_group_apply(typed, spec.key, _merge_groups(spec), hash_sort=True)


@dataclass(frozen=True)
class EdgeSpec:
    """Declarative edge import: subject/predicate/object columns plus a
    predicate rename map — the reference's dynamic-relationship-type
    imports (`apoc.create.relationship` with the type taken from a data
    column, `import_go_obo.py:248-258`;
    `prompts/import/monarchkg/monarch_relationships_generic_prompt.txt`
    maps source predicates onto canonical biolink types). Unmapped
    predicate codes fall back to ``default_predicate``; with the
    default of ``None`` those rows are DROPPED (the reference skips
    relationships it has no type mapping for)."""

    subject: str                    # input column → src
    predicate: str                  # input column → predicate (via map)
    object: str                     # input column → dst
    predicate_map: dict = field(default_factory=dict)
    default_predicate: str | None = None
    count_col: str = "n_mentions"


def import_edges(ds: ray.data.Dataset, spec: EdgeSpec) -> ray.data.Dataset:
    """Raw rows → typed, deduplicated edge table
    ``(src, predicate, dst, <count_col>)``. One vectorized map per
    batch (rename + predicate lookup + null-endpoint drop), then one
    keyed exchange counting mentions per distinct edge — the same
    MERGE-on-(src,type,dst) upsert shape as the flagship's edge build
    (SURVEY §2.2 K2)."""
    from bioontologykg_ray.stages.agg import grouped_count

    def xform(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "src": df[spec.subject],
                "predicate": df[spec.predicate],
                "dst": df[spec.object],
            }
        )
        # the drop-or-default rule applies uniformly: with a map,
        # unmapped codes are misses; without one, only NULL predicates
        # are misses (raw passthrough). Either way a miss falls back to
        # default_predicate, or the row is dropped EXPLICITLY here when
        # the default is None — never silently in a downstream groupby
        # (round-3 review finding).
        mapped = (
            out["predicate"].map(spec.predicate_map)
            if spec.predicate_map else out["predicate"]
        )
        if spec.default_predicate is None:
            keep = mapped.notna()
            out = out.loc[keep]
            out["predicate"] = mapped.loc[keep]
        else:
            out["predicate"] = mapped.fillna(spec.default_predicate)
        return out[out["src"].notna() & out["dst"].notna()]

    typed = ds.map_batches(xform, batch_format="pandas")
    return grouped_count(
        typed, ["src", "predicate", "dst"], out_col=spec.count_col
    )
