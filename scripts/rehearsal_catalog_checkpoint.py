#!/usr/bin/env python3
"""Catalog-checkpoint startup-cost rehearsal (round 8, judge task 6):
`read_catalog` reads one tiny JSON per committed version through py4j
on EVERY job start, so a corpus grown by ~100 appends pays ~100
round-trips before any work. This measures the job-start catalog read
at 100 loose versions, folds them with `checkpoint_catalog`, verifies
`read_catalog` returns the IDENTICAL version list, and measures again.

Prints ONE JSON line; writes BENCH/catalog_checkpoint.json.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_VERSIONS = 100
FILES_PER_VERSION = 8
REPS = 5


def main() -> None:
    from parquet_playground_rs_spark.plans import pipeline as pl
    from parquet_playground_rs_spark.session import get_spark

    spark = get_spark(app="catalog-ckpt", cores=4, shuffle_partitions=4)
    out = tempfile.mkdtemp(prefix="catalog_ckpt_")
    try:
        base = 0
        for v in range(N_VERSIONS):
            files = [f"file:/corpus/part-{v:04d}-{i:02d}.parquet"
                     for i in range(FILES_PER_VERSION)]
            sizes = {f: 1_000_000 + 17 * i
                     for i, f in enumerate(files)}
            ver = pl._new_catalog_version(v, base, 4, files, sizes)
            pl._write_catalog_version(spark, out, ver)
            base += ver["n_buckets"]

        def timed_read():
            walls = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                vers = pl.read_catalog(spark, out)
                walls.append(time.perf_counter() - t0)
            return vers, round(statistics.median(walls), 4)

        before, wall_loose = timed_read()
        assert len(before) == N_VERSIONS
        n_files_before = len(os.listdir(os.path.join(out, "catalog")))

        t0 = time.perf_counter()
        s = pl.checkpoint_catalog(spark, out)
        fold_sec = round(time.perf_counter() - t0, 3)
        after, wall_ckpt = timed_read()
        assert after == before, "checkpoint changed the catalog!"
        n_files_after = len(os.listdir(os.path.join(out, "catalog")))

        res = {"n_versions": N_VERSIONS,
               "files_per_version": FILES_PER_VERSION,
               "catalog_files_before": n_files_before,
               "catalog_files_after": n_files_after,
               "read_catalog_sec_loose": wall_loose,
               "read_catalog_sec_checkpointed": wall_ckpt,
               "startup_speedup": round(wall_loose / wall_ckpt, 1),
               "fold_sec": fold_sec,
               "checkpointed_versions": s["checkpointed_versions"],
               "identical_across_fold": True}
        bench_dir = Path(__file__).resolve().parent.parent / "BENCH"
        with open(bench_dir / "catalog_checkpoint.json", "w") as fh:
            json.dump(res, fh, indent=1)
        print(json.dumps(res))
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
