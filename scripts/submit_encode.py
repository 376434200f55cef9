#!/usr/bin/env python3
"""spark-submit entrypoint for the resumable encode pipeline.

The north rule's launch shape: package the engine and submit —

    zip -r engine.zip parquet_playground_rs_spark
    spark-submit --py-files engine.zip \\
        --conf spark.sql.shuffle.partitions=<4 x total cores> \\
        scripts/submit_encode.py \\
        --input  s3a://bucket/sequences/ \\
        --output s3a://bucket/encoded/ \\
        --buckets 256 --chunk-size 16384 [--verify checksum] [--resume]

Re-running the same command after a failure resumes past completed
buckets (plans/pipeline.py manifests; --resume is implied, the flag just
documents intent). Works identically on local paths.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="parquet dir of (doc_id, tokens, n_tok, source)")
    ap.add_argument("--output", required=True, help="encoded table root")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--chunk-size", type=int, default=16384)
    ap.add_argument("--buckets-per-commit", type=int, default=None)
    ap.add_argument("--concurrent-commits", type=int, default=1,
                    help="overlap N commit groups from driver threads "
                         "(disjoint-partition writes; hides fixed "
                         "per-commit costs)")
    ap.add_argument("--scope", choices=["files", "hash"], default="files",
                    help="resume-unit keying. 'files' (default): commit "
                         "groups of input files — each group reads only "
                         "its own files, measured 1.14x plain encode at "
                         "the 8M-row rehearsal. 'hash': data-derived "
                         "buckets pmod(xxhash64(source,doc_id,chunk), n) "
                         "— needed only when downstream layout must key "
                         "on content; costs per-group re-scans (2.35x) "
                         "or staging (see --stage-input)")
    ap.add_argument("--cache-input", action="store_true",
                    help="[hash scope] persist the chunked work list "
                         "(DISK_ONLY) instead of re-scanning the source "
                         "per commit group; pays off for expensive "
                         "sources (JSON/object stores), measured 2x "
                         "SLOWER for local columnar inputs")
    ap.add_argument("--stage-input", action="store_true",
                    help="[hash scope] materialize the chunked work "
                         "list once under output/staging (resumable); "
                         "wins only for expensive-to-rederive sources — "
                         "the materialization alone costs ~6x the "
                         "encode at the 8M rehearsal")
    ap.add_argument("--verify",
                    choices=["none", "chunks", "checksum", "hash", "exact"],
                    default="chunks",
                    help="'chunks' = reassembly-free per-chunk checksum "
                         "(zero exchanges, the 10^12-row default)")
    ap.add_argument("--statistics", choices=["none", "chunk", "page"],
                    default="page",
                    help="parquet statistics granularity (reference E5 enum)")
    ap.add_argument("--resume", action="store_true",
                    help="documentational; resume is always on")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from parquet_playground_rs_spark.operators import decode as dec
    from parquet_playground_rs_spark.plans import pipeline as pl

    # under spark-submit the session is configured by the submit command;
    # getOrCreate attaches to it (local runs fall back to defaults)
    spark = SparkSession.builder.appName("encode-job").getOrCreate()
    src = spark.read.parquet(args.input)
    if args.scope == "files":
        summary = pl.run_encode_job_files(
            spark, args.input, args.output, n_buckets=args.buckets,
            chunk_size=args.chunk_size,
            buckets_per_commit=args.buckets_per_commit,
            statistics=args.statistics,
            concurrent_commits=args.concurrent_commits)
    else:
        summary = pl.run_encode_job(
            spark, src, args.output, n_buckets=args.buckets,
            chunk_size=args.chunk_size,
            buckets_per_commit=args.buckets_per_commit,
            statistics=args.statistics,
            concurrent_commits=args.concurrent_commits,
            cache_input=args.cache_input,
            stage_input=args.stage_input)
    if args.verify != "none":
        if args.verify == "chunks":
            row = dec.verify_encoded(src, pl.read_encoded(spark, args.output),
                                     chunk_size=args.chunk_size).first()
        else:
            decoded = dec.decode_tokens(pl.read_encoded(spark, args.output))
            row = dec.verify_roundtrip(src, decoded,
                                       method=args.verify).first()
        summary["verify"] = {k: int(row[k]) for k in
                             ("n_source", "n_decoded", "n_joined", "n_mismatch")}
        if row["n_mismatch"] != 0:
            print(json.dumps(summary))
            raise SystemExit("round-trip verification FAILED")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
