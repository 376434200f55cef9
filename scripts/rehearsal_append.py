#!/usr/bin/env python3
"""Append-economics rehearsal (round-7 judge task 1, the scale claim).

The versioned catalog's promise is ECONOMIC: when a corpus grows by X%,
`run_encode_job_files(append=True)` encodes only the new files, so the
append costs ~X% of a full re-encode (plus the fixed per-commit cost),
instead of the 100% a fingerprint-refusal forced before round 7. This
measures exactly that, interleaved:

per rep (base input restored between reps):
  1. full encode of the BASE corpus (1M rows, 64 files)   -> t_full
  2. grow the input dir by GROWTH_FILES files (12.5% rows),
     append=True on the SAME output dir                   -> t_append
  3. full re-encode of the GROWN corpus into a fresh dir  -> t_regrown
     (the counterfactual a user paid before append mode)

Reported: medians, append_over_regrown (the claim: ~growth fraction +
fixed commit costs, NOT ~1.0), and an exact decode+verify of the
appended table against the grown corpus on the last rep. Writes
BENCH/append_econ.json (folded into the bench headline) and appends to
BENCH/BASELINE.md-adjacent ANN/MinHash style markdown APPEND_ECON.md.
Prints ONE JSON line.
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

CACHE = os.environ.get("SPARK_GRAFT_CACHE", "/tmp/spark_graft_cache")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BASE = int(os.environ.get("SPARK_GRAFT_APPEND_BASE_ROWS", "1000000"))
GROWTH_FRAC = 0.125
BASE_FILES = 64
GROWTH_FILES = 8
REPS = int(os.environ.get("SPARK_GRAFT_APPEND_REPS", "3"))


def main() -> None:
    allowed = sorted(os.sched_getaffinity(0))
    os.sched_setaffinity(0, set(allowed[:min(CPUS, len(allowed))]))

    import bench
    from parquet_playground_rs_spark.operators import encode as enc
    from parquet_playground_rs_spark.plans import pipeline as pl
    from parquet_playground_rs_spark.session import get_spark
    from pyspark.sql import functions as F

    from parquet_playground_rs_spark.sources.generator import (
        sequences_df, write_sequences,
    )

    spark = get_spark(app="append-econ", cores=CPUS,
                      shuffle_partitions=CPUS, driver_mem="12g")
    n_grow = int(N_BASE * GROWTH_FRAC)
    base_dir = os.path.join(CACHE, f"append_base_{N_BASE}")
    stash_dir = os.path.join(CACHE, f"append_grow_{n_grow}")
    # base and growth corpora: disjoint seeds, snappy (bench input rule)
    if not os.path.exists(os.path.join(base_dir, "_SUCCESS")):
        write_sequences(spark, N_BASE, base_dir, seed=42,
                        partitions=BASE_FILES)
    # self-heal: a hard kill in a prior run (here or in
    # rehearsal_compact.py, which shares this cached base) can leave
    # growth files inside the dir with _SUCCESS still valid — sweep
    # grow-prefixed leftovers before trusting the cache
    for f in os.listdir(base_dir):
        if f.startswith(("grow-", "cgrow")):
            os.remove(os.path.join(base_dir, f))
    if not os.path.exists(os.path.join(stash_dir, "_SUCCESS")):
        # distinct id space: the generator keys doc_id on the row index,
        # so an un-prefixed growth corpus would collide with base ids
        # and verify would join mismatched docs
        (sequences_df(spark, n_grow, seed=4242, partitions=GROWTH_FILES)
         .withColumn("doc_id", F.concat(F.lit("grow_"), F.col("doc_id")))
         .write.mode("overwrite").option("compression", "snappy")
         .parquet(stash_dir))
    grow_parts = sorted(f for f in os.listdir(stash_dir)
                        if f.endswith(".parquet"))
    # distinct basenames so copies into base_dir can't collide (and are
    # removable to restore the base state between reps)
    grow_names = [f"grow-{i:02d}-{f}" for i, f in enumerate(grow_parts)]

    out = {"n_base_rows": N_BASE, "n_growth_rows": n_grow,
           "growth_fraction": GROWTH_FRAC, "base_files": BASE_FILES,
           "growth_files": GROWTH_FILES, "reps": REPS}
    t_full, t_append, t_regrown = [], [], []
    pipe_kw = dict(n_buckets=64, chunk_size=enc.DEFAULT_CHUNK,
                   buckets_per_commit=8, concurrent_commits=8)
    out_dir = os.path.join(CACHE, "append_econ_out")
    out2_dir = os.path.join(CACHE, "append_econ_out_regrown")
    verify = None
    try:
        for rep in range(REPS):
            shutil.rmtree(out_dir, ignore_errors=True)
            shutil.rmtree(out2_dir, ignore_errors=True)
            bench.calibrate("full")
            t0 = time.time()
            pl.run_encode_job_files(spark, base_dir, out_dir, **pipe_kw)
            t_full.append(time.time() - t0)

            for src, dst in zip(grow_parts, grow_names):
                shutil.copyfile(os.path.join(stash_dir, src),
                                os.path.join(base_dir, dst))
            bench.calibrate("append")
            t0 = time.time()
            s = pl.run_encode_job_files(spark, base_dir, out_dir,
                                        append=True,
                                        n_buckets=GROWTH_FILES,
                                        chunk_size=enc.DEFAULT_CHUNK,
                                        buckets_per_commit=2,
                                        concurrent_commits=4)
            t_append.append(time.time() - t0)
            assert s["appended_files"] == GROWTH_FILES, s
            assert s["processed_buckets"] == GROWTH_FILES, s

            bench.calibrate("regrown")
            t0 = time.time()
            pl.run_encode_job_files(spark, base_dir, out2_dir, **pipe_kw)
            t_regrown.append(time.time() - t0)

            if rep == REPS - 1:
                grown = spark.read.parquet(base_dir)
                verify = pl.verify_job(spark, grown, out_dir)
            for dst in grow_names:
                os.remove(os.path.join(base_dir, dst))
    finally:
        # never leave the cached base corpus grown (bench shares it)
        for dst in grow_names:
            p = os.path.join(base_dir, dst)
            if os.path.exists(p):
                os.remove(p)

    med = statistics.median
    out["t_full_sec"] = [round(t, 2) for t in t_full]
    out["t_append_sec"] = [round(t, 2) for t in t_append]
    out["t_regrown_sec"] = [round(t, 2) for t in t_regrown]
    out["append_over_regrown"] = round(med(t_append) / med(t_regrown), 4)
    out["append_over_full"] = round(med(t_append) / med(t_full), 4)
    out["verify"] = verify
    assert verify["n_mismatch"] == 0
    assert verify["n_decoded"] == N_BASE + n_grow
    # the claim: appending 12.5% must NOT cost a re-encode. Bar: less
    # than half the grown-corpus re-encode (growth fraction + fixed
    # per-commit costs; a refusal-forced re-encode would be 1.0+).
    # Only enforced at the real shape — at smoke scale (~100k rows) the
    # fixed per-commit costs dominate BOTH sides and the ratio is
    # meaningless.
    if N_BASE >= 500_000:
        assert out["append_over_regrown"] < 0.5, out

    bench_dir = Path(__file__).resolve().parent.parent / "BENCH"
    with open(bench_dir / "append_econ.json", "w") as fh:
        json.dump(out, fh, indent=1)
    stamp = time.strftime("%Y-%m-%d %H:%M")
    with open(bench_dir / "APPEND_ECON.md", "a") as fh:
        fh.write(
            f"\n## Run {stamp} — {N_BASE:,} base rows + "
            f"{GROWTH_FRAC:.1%} growth (local[{CPUS}])\n\n"
            f"- full base encode: {out['t_full_sec']} s (median "
            f"{med(t_full):.2f}); grown-corpus re-encode (the pre-append "
            f"counterfactual): {out['t_regrown_sec']} s (median "
            f"{med(t_regrown):.2f})\n"
            f"- append of the {GROWTH_FRAC:.1%} growth: "
            f"{out['t_append_sec']} s (median {med(t_append):.2f}) = "
            f"**{out['append_over_regrown']:.1%} of a re-encode** — the "
            f"growth fraction plus fixed per-commit cost, as designed\n"
            f"- union verified exact after append: "
            f"{verify['n_decoded']:,} rows decoded, 0 mismatches\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
