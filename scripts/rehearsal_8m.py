#!/usr/bin/env python3
"""8M-row (~3.1B-token) rehearsal: the staged resumable pipeline vs
plain encode, with explicit page-cache state (round-4 judge tasks 1+8).

Protocol:
- deterministic 8M-row sequences (snappy, cached across runs);
- CPU pinning + the bench's interleaved stream probe (quiet-window
  evidence);
- COLD-ish vs WARM states reported separately: the first timed pass
  after generation/(re)boot sees whatever page cache exists ("first"),
  then every subsequent pass runs against a touched input ("warm") —
  overhead ratios are computed warm-vs-warm so commit-granularity cost
  is isolated from cache state (round-4's 14.4-32.4 s encode spread was
  page cache, probes flat);
- staged pipeline: 64 buckets, 8 per commit, 4 concurrent commit
  groups — the exact BENCH configuration that measured 2.35x in round 4;
- kill at 24 buckets + resume on a fresh dir (functional resumability
  at scale);
- decode + join-free checksum verify (round-trip at 3.1B tokens).

Prints ONE JSON line; paste into BENCH/BASELINE.md round-5.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (probe + pinning helpers)

CACHE = os.environ.get("SPARK_GRAFT_CACHE", "/tmp/spark_graft_cache")
N_ROWS = int(os.environ.get("SPARK_GRAFT_REHEARSAL_ROWS", "8000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    allowed = sorted(os.sched_getaffinity(0))
    os.sched_setaffinity(0, set(allowed[:min(CPUS, len(allowed))]))

    from pyspark.sql import functions as F

    from parquet_playground_rs_spark.operators import decode as dec
    from parquet_playground_rs_spark.operators import encode as enc
    from parquet_playground_rs_spark.plans import pipeline as pl
    from parquet_playground_rs_spark.session import get_spark
    from parquet_playground_rs_spark.sources.generator import (
        GEN_VERSION,
        write_sequences,
    )

    spark = get_spark(app="rehearsal-8m", cores=CPUS,
                      shuffle_partitions=CPUS, driver_mem="16g")
    out: dict = {"n_rows": N_ROWS, "cpus": CPUS}

    seq_path = os.path.join(CACHE, f"sequences_8m_{N_ROWS}_g{GEN_VERSION}")
    if not os.path.exists(os.path.join(seq_path, "_SUCCESS")):
        t0 = time.time()
        write_sequences(spark, N_ROWS, seq_path, seed=42,
                        partitions=max(CPUS * 8, 256))
        out["generate_sec"] = round(time.time() - t0, 1)
        out["input_cache_state"] = "cold (freshly generated)"
    else:
        out["input_cache_state"] = "preexisting (cache state unknown)"
    seq = spark.read.parquet(seq_path)
    out["total_tokens"] = int(seq.agg(F.sum("n_tok")).first()[0])

    warm = spark.range(CPUS * 4, numPartitions=CPUS * 4) \
        .withColumn("tokens", F.array(F.lit(1)))
    warm.mapInArrow(lambda it: it, warm.schema).count()

    enc_dir = os.path.join(CACHE, "rehearsal_8m_plain")
    pipe_dir = os.path.join(CACHE, "rehearsal_8m_pipe")

    # ---- plain encode: first pass (inherits current cache state), then
    # two warm passes
    def _plain():
        enc.write_encoded(
            enc.encode_tokens(seq, chunk_size=enc.DEFAULT_CHUNK), enc_dir)

    reps = bench.timed_reps(_plain, 3, tag="plain")
    out["plain_first_sec"] = round(reps[0], 2)
    out["plain_warm_secs"] = [round(r, 2) for r in reps[1:]]
    plain_warm = statistics.median(reps[1:])
    out["plain_tokens_per_sec_warm"] = round(
        out["total_tokens"] / plain_warm, 0)

    # ---- staged pipeline, warm input: same config as BENCH round 4
    # (64 buckets / 8 per commit / 4 concurrent groups)
    pipe_secs = []
    for _ in range(2):
        shutil.rmtree(pipe_dir, ignore_errors=True)
        bench.calibrate("pipeline")
        t0 = time.time()
        s = pl.run_encode_job(spark, seq, pipe_dir, n_buckets=64,
                              chunk_size=enc.DEFAULT_CHUNK,
                              buckets_per_commit=8, concurrent_commits=4)
        pipe_secs.append(time.time() - t0)
    out["pipeline_warm_secs"] = [round(r, 2) for r in pipe_secs]
    pipe_warm = statistics.median(pipe_secs)
    out["pipeline_overhead_vs_plain_warm"] = round(pipe_warm / plain_warm, 3)
    out["pipeline_buckets"] = int(s["processed_buckets"])

    # ---- kill + resume on a fresh dir
    res_dir = pipe_dir + "_resume"
    shutil.rmtree(res_dir, ignore_errors=True)
    try:
        pl.run_encode_job(spark, seq, res_dir, n_buckets=64,
                          chunk_size=enc.DEFAULT_CHUNK,
                          buckets_per_commit=8, fail_after_buckets=24)
    except RuntimeError:
        pass
    bench.calibrate("resume")
    t0 = time.time()
    sr = pl.run_encode_job(spark, seq, res_dir, n_buckets=64,
                           chunk_size=enc.DEFAULT_CHUNK,
                           buckets_per_commit=8, concurrent_commits=4)
    out["resume_sec"] = round(time.time() - t0, 2)
    out["resume_skipped"] = int(sr["resumed_buckets"])
    out["resume_processed"] = int(sr["processed_buckets"])

    # ---- round-trip at 3.1B tokens against the pipeline's bucketed output
    bench.calibrate("verify")
    t0 = time.time()
    with dec.decoded_tokens(pl.read_encoded(spark, pipe_dir)) as decoded:
        v = dec.verify_roundtrip(seq, decoded, method="checksum").first()
    out["verify_checksum_sec"] = round(time.time() - t0, 2)
    out["verify_tokens_per_sec"] = round(
        out["total_tokens"] / (time.time() - t0), 0)
    out["n_mismatch"] = int(v["n_mismatch"])
    out["n_joined"] = int(v["n_joined"])

    raw_idx, trimmed_idx, by_q = bench.noise_indices()
    out["host_noise_index"] = round(raw_idx, 2)
    out["host_noise_index_trimmed"] = round(trimmed_idx, 2)
    out["probe_by_query"] = by_q

    for p in (enc_dir, pipe_dir, res_dir):
        shutil.rmtree(p, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
