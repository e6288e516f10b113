"""Per-partition lineage + metrics manifests → resumable execution.

The reference achieves resumability with MERGE idempotency + "needs
work" predicate scans (M14, e.g. `readcube_abstract_embeddings.py:66-71`)
and deterministic key pagination. Our batch-pipeline equivalent
(SURVEY.md §4.2): one output directory per input partition, written
atomically (temp dir + rename), with a ``manifest.json`` recording the
input files (lineage), row counts and stage metrics. A rerun anti-joins
pending partitions against existing manifests and skips finished ones —
exactly-once per partition.
"""

from __future__ import annotations

import json
import os
import shutil


def partition_dir(root: str, pid: int | str) -> str:
    # int pids (round-robin grouping) are zero-padded for stable sort;
    # string pids (file-keyed incremental mode) are used verbatim
    name = f"part-{pid:05d}" if isinstance(pid, int) else f"part-{pid}"
    return os.path.join(root, name)


def manifest_path(root: str, pid: int | str) -> str:
    return os.path.join(partition_dir(root, pid), "manifest.json")


def is_done(root: str, pid: int | str) -> bool:
    return os.path.exists(manifest_path(root, pid))


def load_manifest(root: str, pid: int | str) -> dict | None:
    p = manifest_path(root, pid)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        # a truncated/corrupt manifest (power loss between rename and
        # durability) means the partition is NOT provably complete —
        # treat it as pending and recompute, never crash the resume
        return None


def write_partition(root: str, pid: int | str, write_fn, lineage: dict,
                    metrics: dict, keep_tmp: bool = False) -> dict:
    """Atomically produce partition ``pid``: ``write_fn(tmp_dir)`` writes
    the data files; the manifest lands last, so its presence == the
    partition is complete. Safe against mid-write kills.

    ``keep_tmp=True`` preserves an existing tmp dir so ``write_fn`` can
    APPEND next to salvaged part files (record-level resume — the
    caller has already validated the tmp's lineage and pruned bad
    files)."""
    final = partition_dir(root, pid)
    tmp = final + ".tmp"
    if os.path.exists(tmp) and not keep_tmp:
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    write_fn(tmp)
    if callable(metrics):  # evaluated AFTER the data files are written
        metrics = metrics()
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
    manifest = {"partition": pid, "lineage": lineage, "metrics": metrics}
    mp = manifest_path(root, pid)
    with open(mp + ".tmp", "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(mp + ".tmp", mp)
    return manifest


def pending_partitions(root: str, n_parts: int) -> list[int]:
    """Anti-join: all partition ids minus those with a manifest (M14)."""
    return [p for p in range(n_parts) if not is_done(root, p)]
