"""Exact dedup + edge canonicalization + skew-safe counting.

Reference precedents:
- D1 MERGE-on-key idempotent upsert (every importer) → hash-partition by
  key + per-group first/merge;
- D2 duplicate-group cleanup keep-first
  (`cql/remediation/remediate_duplicate_pubmed_ids.cql:1-13`);
- D4/J6 symmetric-pair dedup — canonical (lo, hi) endpoint order
  (`cql/import/uniprot/uniprot_intact.cql:31-40`,
  `cql/import/cosmic/import_cosmic_gene_census.cql:59-68`).

Scale pattern: every global groupby here is preceded by a per-batch
partial combine inside ``map_batches`` (emit one row per key per batch),
so the shuffle moves keys, not rows — the two-phase aggregation the
head-entity skew requires (SURVEY.md §4.2).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

SEP = "\x1f"  # unit separator — never occurs in ids/predicates


def canonicalize_symmetric(
    ds: ray.data.Dataset, symmetric_predicates: tuple
) -> ray.data.Dataset:
    """For symmetric predicates, order endpoints (lo, hi) so A-r-B and
    B-r-A dedup to one edge (J6 ``id(u1) < id(u2)`` analogue)."""
    preds = list(symmetric_predicates)

    def fn(t: pa.Table) -> pa.Table:
        is_sym = pc.is_in(t["pred"], value_set=pa.array(preds, pa.string()))
        flip = pc.and_(is_sym, pc.greater(t["subj"], t["obj"]))
        subj = pc.if_else(flip, t["obj"], t["subj"])
        obj = pc.if_else(flip, t["subj"], t["obj"])
        return t.set_column(t.schema.get_field_index("subj"), "subj", subj).set_column(
            t.schema.get_field_index("obj"), "obj", obj
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def count_triples(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(subj, pred, obj) → distinct edges with mention counts.

    Phase 1 (map side): per-batch value_counts — one row per key per
    batch. Phase 2: groupby the composite key, Sum the partials. The
    composite key keeps the groupby single-column; split back after."""

    from bioontologykg_ray.stages.agg import sorted_group_apply

    def partial(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(t["subj"], t["pred"], t["obj"], SEP)
        vc = pc.value_counts(key)
        return pa.table(
            {"key": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # millions of distinct triples: parallel range-sorted combine over the
    # reduced partials (see stages/agg.py), never a single combine task
    combine = lambda df: df.groupby("key", as_index=False)["n"].sum()
    empty = pd.DataFrame({"key": pd.Series(dtype="object"), "n": pd.Series(dtype="int64")})
    # hash_sort: the composite string key would make the range sort
    # compare ~60-byte strings per row; sorting its uint64 hash moves
    # the same rows with int compares (combine still groups by the real
    # key, so collisions stay exact)
    summed = sorted_group_apply(partials, "key", combine, empty, hash_sort=True)

    def split(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["key"], SEP)
        return pa.table(
            {
                "src": pc.list_element(parts, 0),
                "predicate": pc.list_element(parts, 1),
                "dst": pc.list_element(parts, 2),
                "n_mentions": t["n"].cast(pa.int64()),
            }
        )

    return summed.map_batches(split, batch_format="pyarrow")


def dedup_first_by_key(
    ds: ray.data.Dataset, key_cols: list[str], order_cols: list[str]
) -> ray.data.Dataset:
    """Keep-first dedup (D2): per-batch partial keep-first, then a global
    groupby keep-first, ordering by ``order_cols`` (deterministic under
    any batch/actor assignment)."""

    from bioontologykg_ray.stages.agg import two_phase_agg

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(order_cols, kind="mergesort").drop_duplicates(
            key_cols, keep="first"
        )

    # idempotent partial: min-ordered row per key per batch; combine picks
    # the min-ordered row across partials — vectorized, no per-key state
    return two_phase_agg(ds, keep_first, keep_first)


def distinct_values(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """Distinct values of one column: per-batch unique → vectorized
    two-phase combine (no per-key accumulators)."""
    from bioontologykg_ray.stages.agg import two_phase_agg

    def per_batch(t: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(t[col].combine_chunks())})

    pre = ds.map_batches(per_batch, batch_format="pyarrow")
    return two_phase_agg(
        pre,
        lambda df: df.drop_duplicates(),
        lambda df: df.drop_duplicates(),
    )
