"""CLI entry point — the ``ray job submit`` surface (SURVEY.md §2.11).

    ray job submit -- python -m bioontologykg_ray run-kg \
        --transcripts /data/transcripts --ontology /data/ontology.parquet \
        --out /data/kg_out --partitions 64

Subcommands:
  run-kg   partitioned, resumable KG construction (phase-1 manifests,
           phase-2 graph snapshot)
  synth    generate the deterministic synthetic corpus for a scale factor
  oracle   run the single-process oracle and report P/R vs a run's output

Owns its Ray session (scripts do; the driver/test fixtures never import
this module).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="bioontologykg_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    rk = sub.add_parser("run-kg", help="partitioned resumable KG construction")
    rk.add_argument("--transcripts", required=True)
    rk.add_argument("--ontology", required=True,
                    help="ontology parquet OR a raw .obo file")
    rk.add_argument("--out", required=True)
    rk.add_argument("--partitions", type=int, default=None)
    rk.add_argument("--partition-by", choices=["round_robin", "file"],
                    default="round_robin",
                    help="'file' keys partitions by input file name: "
                         "appending shards + rerunning = incremental update")
    rk.add_argument("--num-cpus", type=int, default=None)
    rk.add_argument("--link-concurrency", type=int, default=8)

    sy = sub.add_parser("synth", help="generate synthetic corpus")
    sy.add_argument("--sf", type=float, required=True)
    sy.add_argument("--seed", type=int, default=42)

    orc = sub.add_parser("oracle", help="oracle P/R check against a run output")
    orc.add_argument("--sf", type=float, required=True)

    qr = sub.add_parser(
        "query", help="run one registry query (or list them with --list)"
    )
    qr.add_argument("name", nargs="?", help="query name from the registry")
    qr.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qr.add_argument("--out", default=None,
                    help="write result parquet here instead of printing head")
    qr.add_argument("--num-cpus", type=int, default=None)
    qr.add_argument("--list", action="store_true", dest="list_queries")

    args = p.parse_args(argv)

    if args.cmd == "query" and args.list_queries:
        from bioontologykg_ray.pipelines.queries import ORACLE, QUERIES

        for name in sorted(QUERIES):
            print(f"{name}\t{'sql-oracle' if name in ORACLE else 'rows-only'}")
        return 0

    if args.cmd == "synth":
        from bioontologykg_ray import synth

        d = synth.ensure_synth(args.sf, seed=args.seed)
        print(json.dumps({"dir": d}))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus if getattr(args, "num_cpus", None) else None,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        if args.cmd == "run-kg":
            from bioontologykg_ray.config import PipelineConfig
            from bioontologykg_ray.pipelines.kg import run_partitioned

            cfg = PipelineConfig(link_concurrency=args.link_concurrency)
            res = run_partitioned(
                args.transcripts, args.ontology, args.out, cfg,
                n_parts=args.partitions, partition_by=args.partition_by,
            )
            print(json.dumps({
                "edges": res["edges"].count(),
                "nodes": res["nodes"].count(),
                "out": args.out,
            }))
            return 0
        if args.cmd == "query":
            import pandas as pd
            import pyarrow as pa_

            import ray.data

            from bioontologykg_ray.pipelines.queries import QUERIES

            if args.name not in QUERIES:
                print(json.dumps({"error": f"unknown query {args.name!r}"}))
                return 2
            res = QUERIES[args.name](args.sf_dir)
            if isinstance(res, ray.data.Dataset):
                res = res.to_pandas()
            elif isinstance(res, pa_.Table):
                res = res.to_pandas()
            if args.out:
                res.to_parquet(args.out, index=False)
                print(json.dumps({"rows": len(res), "out": args.out}))
            else:
                print(res.head(20).to_string(index=False))
                print(json.dumps({"rows": len(res)}))
            return 0
        if args.cmd == "oracle":
            import glob

            import pyarrow as pa
            import pyarrow.parquet as pq

            from bioontologykg_ray import synth
            from bioontologykg_ray.config import PipelineConfig
            from bioontologykg_ray.oracle import oracle_triples, precision_recall
            from bioontologykg_ray.pipelines.kg import run_kg_pipeline

            d = synth.ensure_synth(args.sf)
            tbl = pa.concat_tables(
                [pq.read_table(f) for f in sorted(glob.glob(os.path.join(d, "transcripts", "*.parquet")))]
            )
            ont = pq.read_table(os.path.join(d, "ontology_terms.parquet"))
            gold = oracle_triples(tbl, ont)
            res = run_kg_pipeline(
                os.path.join(d, "transcripts"),
                os.path.join(d, "ontology_terms.parquet"),
                PipelineConfig(),
            )
            sys_rows = set(
                map(tuple, res["linked"].to_pandas()[
                    ["subj", "pred", "obj", "conv_id", "turn_idx"]
                ].itertuples(index=False))
            )
            pr = precision_recall(sys_rows, set(gold["linked"]))
            print(json.dumps({"precision": pr[0], "recall": pr[1]}))
            return 0 if min(pr) >= 0.95 else 1
    finally:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
