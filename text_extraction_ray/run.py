"""Flagship CLI — the ``ray job submit`` entry point (SURVEY.md SS3.1).

    ray job submit -- python -m text_extraction_ray.run \
        --input /data/pages --output /data/out [--ckpt /data/out/_ckpt]

Resumable: re-running after a failure skips every partition whose manifest
is complete (SS4.4); pass ``--fresh`` to force a full recompute.  Prints a
lineage/counter report at the end (G1).

This module owns no Ray session when launched via ``ray job submit`` /
an initialised driver; standalone invocations auto-init local.
"""

from __future__ import annotations

import argparse
import json
import sys

import ray


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="text_extraction_ray.run")
    ap.add_argument("--input", required=True,
                    help="pages parquet file or directory of shards")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint/manifest dir (default: <output>/_ckpt)")
    ap.add_argument("--concurrency", type=int, default=None,
                    help="extraction actor count (default: CPUs/2)")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore existing manifests and recompute everything")
    ap.add_argument("--format", choices=("parquet", "csv", "jsonl"),
                    default="parquet",
                    help="partition output format (csv echoes the "
                         "reference's CSV output, spans JSON-encoded; "
                         "jsonl mirrors the JSONL source shape)")
    ap.add_argument("--dedup", action="store_true",
                    help="post-pass: keep-latest-per-url dedup of the "
                         "output into <output>/dedup/ (parquet only)")
    ap.add_argument("--report", action="store_true",
                    help="print a QA report (doc types, per-lang stats, "
                         "length histogram) after the job")
    ap.add_argument("--synth-rows", type=int, default=None,
                    help="generate a synthetic corpus of N rows at --input "
                         "first (demo/testing)")
    ap.add_argument("--max-failure-rate", type=float, default=None,
                    metavar="FRAC",
                    help="QA gate: exit 3 if cumulative docs_failed / "
                         "docs_in exceeds FRAC (e.g. 0.02) — catches a "
                         "systematically broken crawl batch in CI")
    ap.add_argument("--materialize-query", default=None, metavar="NAME",
                    help="CREATE-TABLE-AS mode: run registry query NAME "
                         "over the table directory given by --input and "
                         "write its result to --output as parquet "
                         "(atomic for driver-side tables, partitioned "
                         "for datasets)")
    ap.add_argument("--refresh-from", default=None, metavar="OLD_OUTPUT",
                    help="incremental recrawl mode: extract ONLY pages "
                         "that are new or newer than OLD_OUTPUT's rows, "
                         "carry the rest forward, write the keep-latest "
                         "merge to --output (parquet)")
    args = ap.parse_args(argv)
    if args.dedup and args.format != "parquet":
        ap.error("--dedup requires --format parquet")
    if args.report and args.format == "csv":
        ap.error("--report requires --format parquet or jsonl "
                 "(CSV spans are JSON-encoded and cannot read back)")

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    if args.synth_rows:
        from .sources.synth import gen_corpus

        gen_corpus(args.input, args.synth_rows, n_shards=max(
            8, args.synth_rows // 500))

    if args.fresh:
        import glob
        import os
        import shutil

        shutil.rmtree(args.ckpt or f"{args.output}/_ckpt", ignore_errors=True)
        # Also remove stale part=* output dirs: if the new input has fewer
        # shards, orphaned partitions from the previous run would otherwise
        # survive and corrupt --report/--dedup (ADVICE r1).
        for d in glob.glob(os.path.join(args.output, "part=*")):
            shutil.rmtree(d, ignore_errors=True)

    if args.materialize_query:
        import os

        import pandas as pd
        import pyarrow as pa

        from .pipelines.queries import queries

        qs = queries()
        if args.materialize_query not in qs:
            ap.error(f"unknown query {args.materialize_query!r} "
                     f"({len(qs)} registered — see SURVEY.md §2)")
        res = qs[args.materialize_query](args.input)
        if isinstance(res, pd.DataFrame):
            res = pa.Table.from_pandas(res, preserve_index=False)
        if isinstance(res, pa.Table):
            from .state.checkpoint import write_atomic_parquet

            write_atomic_parquet(
                res, os.path.join(args.output, "data.parquet"))
            n = res.num_rows
        else:
            res = res.materialize()
            n = res.count()
            res.write_parquet(args.output)
        json.dump({"mode": "materialize",
                   "query": args.materialize_query, "rows_out": n,
                   "output": args.output}, sys.stdout, indent=2)
        print()
        return 0

    if args.refresh_from:
        import os

        from .pipelines.extraction import EXTRACT_COLUMNS, read_pages
        from .pipelines.job import read_output
        from .pipelines.refresh import refresh_extraction

        # accept any pages source format, like the job does
        names = (os.listdir(args.input) if os.path.isdir(args.input)
                 else [args.input])
        if any(n.endswith((".warc", ".warc.gz")) for n in names):
            from .sources.warc import read_warc_pages

            new_pages = read_warc_pages(args.input)
        elif any(n.endswith(".jsonl") for n in names):
            from .sources.jsonl import read_pages_jsonl

            new_pages = read_pages_jsonl(args.input)
        else:
            new_pages = read_pages(args.input, columns=EXTRACT_COLUMNS)

        merged, n_delta = refresh_extraction(
            read_output(args.refresh_from), new_pages,
            concurrency=args.concurrency or (1, 8))
        merged.write_parquet(args.output)
        json.dump({"mode": "refresh", "delta_extracted": n_delta,
                   "rows_out": merged.count()}, sys.stdout, indent=2)
        print()
        return 0

    from .pipelines.job import run_extraction_job

    summary = run_extraction_job(args.input, args.output, args.ckpt,
                                 concurrency=args.concurrency,
                                 output_format=args.format)
    if args.dedup:
        from .pipelines.job import dedup_output

        summary["dedup_dir"] = dedup_output(args.output)
    if args.report:
        from .pipelines.job import report_output

        summary["report"] = report_output(args.output, args.format)
    json.dump(summary, sys.stdout, indent=2, sort_keys=True)
    print()
    if args.max_failure_rate is not None:
        cum = summary.get("cumulative", {})
        docs_in = cum.get("docs_in", 0)
        rate = (cum.get("docs_failed", 0) / docs_in) if docs_in else 0.0
        if rate > args.max_failure_rate:
            print(f"FAILURE-RATE GATE: {rate:.4f} > "
                  f"{args.max_failure_rate}", file=sys.stderr)
            return 3
    return 0


if __name__ == "__main__":
    rc = main()
    ray.shutdown()
    sys.exit(rc)
