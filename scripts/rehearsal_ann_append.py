#!/usr/bin/env python3
"""Index-append width rehearsal (round 7): does a GROWN IVF-PQ index —
built on half the corpus, the other half added under the frozen model
via `append_ivf_pq_index` — hold the full-build's recall at the
production shape (1M vectors / 256 cells / nprobe 8)?

The claim under test is the FAISS `IndexIVF.add` trade stated in the
operator docstring: identically-distributed growth quantizes as well
as the original corpus, because the coarse centroids and PQ codebooks
were trained on a sample of the same distribution. This measures it:

- build on the even vec_ids (~500k), append the odd ~500k;
- exactly-once integrity over the grown index (1M rows, 1M ids);
- recall@10 of the grown index vs its own exact truth, same 32-query
  batch / nprobe sweep as the canonical full-build rehearsal
  (`rehearsal_ann_width.py` -> BENCH/ann_width.json) — the comparison
  number is that run's recall at the same nprobe;
- walls: half-build vs append (the append should cost ~the encode of
  its half, with no training pass).

Reuses the cached 1M corpus and the truth kernel from
rehearsal_ann_width. Prints ONE JSON line; writes
BENCH/ann_append.json and appends to BENCH/ANN_WIDTH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from rehearsal_ann_width import (  # noqa: E402
    CACHE, CENTER_SCALE, CPUS, DIM, K, M_SUB, N_CELLS, N_CLUSTERS,
    N_QUERIES, N_VECS, NPROBE, build_corpus, exact_topk_from_cells,
)


def main() -> None:
    allowed = sorted(os.sched_getaffinity(0))
    os.sched_setaffinity(0, set(allowed[:min(CPUS, len(allowed))]))

    import shutil

    import numpy as np
    from pyspark.sql import functions as F

    from parquet_playground_rs_spark.operators import similarity as sim
    from parquet_playground_rs_spark.session import get_spark

    spark = get_spark(app="ann-append", cores=CPUS,
                      shuffle_partitions=CPUS, driver_mem="12g")
    corpus_path = os.path.join(
        CACHE, f"ann_width_corpus_{N_VECS}_k{N_CLUSTERS}_s{CENTER_SCALE}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        build_corpus(spark, corpus_path)
    corpus = spark.read.parquet(corpus_path)
    half1 = corpus.filter(F.col("vec_id") % 2 == 0)
    half2 = corpus.filter(F.col("vec_id") % 2 == 1)

    idx_path = os.path.join(CACHE, f"ann_append_idx_{N_VECS}_{N_CELLS}")
    shutil.rmtree(idx_path, ignore_errors=True)
    out: dict = {"n_vectors": N_VECS, "n_cells": N_CELLS, "dim": DIM,
                 "m": M_SUB, "nprobe": NPROBE, "k": K,
                 "n_queries": N_QUERIES}

    t0 = time.time()
    C, _ = sim.write_ivf_pq_index(
        half1, DIM, idx_path, n_centroids=N_CELLS, m=M_SUB,
        sample=max(8192, 2 * N_CELLS), iters=8)
    out["half_build_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    s = sim.append_ivf_pq_index(half2, DIM, idx_path)
    out["append_sec"] = round(time.time() - t0, 1)
    out["append_summary"] = s
    out["append_over_half_build"] = round(
        out["append_sec"] / out["half_build_sec"], 3)

    cells = spark.read.parquet(f"{idx_path}/cells")
    n_rows = cells.count()
    n_ids = cells.select("vec_id").distinct().count()
    out["index_rows"] = int(n_rows)
    assert n_rows == N_VECS and n_ids == N_VECS, (n_rows, n_ids)
    out["exactly_once"] = True

    # same query batch as the canonical full-build run
    qids = [i * 977 % N_VECS for i in range(N_QUERIES)]
    queries = corpus.filter(F.col("vec_id").isin(qids))
    qrows = sim.with_unit_vectors(queries).select("vec_id", "unit") \
        .collect()
    Qm = np.array([r["unit"] for r in qrows], dtype=np.float64)
    qid_list = [r["vec_id"] for r in qrows]

    truth = {(r["query_id"], r["neighbor_id"])
             for r in exact_topk_from_cells(
                 spark, idx_path, Qm, qid_list, K).collect()}
    sweep = {}
    for npb in sorted({4, NPROBE, 16, 32}):
        t0 = time.time()
        g = {(r["query_id"], r["neighbor_id"])
             for r in sim.ivf_pq_query(queries, DIM, idx_path, k=K,
                                       nprobe=npb, refine=8).collect()}
        sweep[f"np{npb}"] = round(len(g & truth) / max(len(truth), 1), 4)
        if npb == NPROBE:
            out["query_wall_sec_batch"] = round(time.time() - t0, 2)
    out["recall_at_10"] = sweep[f"np{NPROBE}"]
    out["recall_sweep"] = {k: sweep[k]
                           for k in sorted(sweep, key=lambda x: int(x[2:]))}

    # comparison anchor: the canonical full-build run at the same shape
    bench_dir = Path(__file__).resolve().parent.parent / "BENCH"
    full_path = bench_dir / "ann_width.json"
    if full_path.exists():
        with open(full_path) as fh:
            full = json.load(fh)
        if (full.get("n_cells") == N_CELLS
                and full.get("nprobe") == NPROBE):
            out["full_build_recall_at_10"] = full.get("recall_at_10")
            out["grown_minus_full_recall"] = round(
                out["recall_at_10"] - full["recall_at_10"], 4)

    with open(bench_dir / "ann_append.json", "w") as fh:
        json.dump(out, fh, indent=1)
    stamp = time.strftime("%Y-%m-%d %H:%M")
    with open(bench_dir / "ANN_WIDTH.md", "a") as fh:
        fh.write(
            f"\n## Run {stamp} — GROWN index: {N_VECS // 2:,} built + "
            f"{N_VECS - N_VECS // 2:,} appended / {N_CELLS} cells / "
            f"nprobe {NPROBE}\n\n"
            f"- exactly-once after append: {out['index_rows']:,} rows / "
            f"ids (append moved {s['files_moved']} files into "
            f"{s['cells_touched']} cells)\n"
            f"- recall@10 of the grown index vs its own exact truth: "
            f"**{out['recall_at_10']}** (full-build run at this shape: "
            f"{out.get('full_build_recall_at_10', 'n/a')}; delta "
            f"{out.get('grown_minus_full_recall', 'n/a')}) — sweep "
            f"{out['recall_sweep']}\n"
            f"- walls: half build {out['half_build_sec']} s, append "
            f"{out['append_sec']} s ({out['append_over_half_build']}x "
            f"the half build — no training pass, one encode pass + "
            f"publish renames)\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
