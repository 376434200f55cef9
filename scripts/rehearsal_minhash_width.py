#!/usr/bin/env python3
"""MinHash width rehearsal with adversarial skew (round-7 judge task 7).

The 8M-row discipline existed for encode and streaming but not dedup.
This runs the MinHash near-dup pipeline at ~1M documents over a corpus
built to hurt:

- PLANTED DUPLICATE FAMILIES: N_FAMILIES families x REPS near-identical
  docs (one-word prefix mutation over a 40-word body -> exact 3-gram
  Jaccard 38/40-ish ~ 0.95 per pair, comfortably over the 0.8
  threshold). Ground truth is closed-form: C(REPS,2) pairs per family,
  nothing across families (bodies are splitmix64-hashed word draws from
  a 50k vocab — no systematic shingle overlap).
- DEGENERATE-SHINGLE BLOCK: N_DEGEN docs of the form "spam spam ..." —
  every doc's distinct-trigram set is the single shingle
  "spam spam spam", so all of them collide in EVERY LSH band: one
  monster bucket that would make the bucket self-join quadratic without
  `_cap_buckets`. The cap salts it into ceil(size/max_bucket)
  sub-buckets; within each, J=1 pairs confirm, so the degenerate truth
  is sum C(sub_size, 2) over the measured sub-bucket sizes.

Measured/checked (the task's Done bar):
- largest PRE-cap bucket (== N_DEGEN x 16 bands worth of collisions)
  vs largest POST-cap bucket (must be <= ~max_bucket, the bound on the
  biggest self-join task);
- engine pair count vs planted truth: family pairs exactly
  N_FAMILIES * C(REPS,2) (LSH miss probability at J~0.95 is ~4e-12),
  degenerate pairs exactly the sub-bucket closed form, and a 50-family
  sampled exact-Jaccard oracle recomputed driver-side;
- shuffle read/write bytes over the whole job (REST API), wall time.

Writes BENCH/minhash_width.json (folded into the bench headline) and
appends to BENCH/MINHASH_WIDTH.md. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from itertools import combinations
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CACHE = os.environ.get("SPARK_GRAFT_CACHE", "/tmp/spark_graft_cache")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_FAMILIES = int(os.environ.get("SPARK_GRAFT_MH_FAMILIES", "120000"))
REPS = 8
N_DEGEN = int(os.environ.get("SPARK_GRAFT_MH_DEGEN", "6000"))
BODY_WORDS = 40
VOCAB = 50_000
MAX_BUCKET = int(os.environ.get("SPARK_GRAFT_MH_MAX_BUCKET", "1024"))
BANDS, ROWS_PER_BAND = 16, 4
SAMPLE_FAMILIES = 50


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized — the deterministic word draw."""
    x = np.uint64(x)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def family_words(fam: int) -> list[str]:
    """The 40-word body of family `fam` (pure function — the sampled
    oracle recomputes it driver-side)."""
    idx = _mix64(np.arange(BODY_WORDS, dtype=np.uint64)
                 + np.uint64(fam) * np.uint64(1_000_003)) % np.uint64(VOCAB)
    return [f"w{int(i)}" for i in idx]


def doc_text(doc_id: int) -> str:
    """doc_id < N_FAMILIES*REPS: rep (doc_id % REPS) of family
    (doc_id // REPS); above that: a degenerate spam doc."""
    if doc_id < N_FAMILIES * REPS:
        fam, rep = divmod(doc_id, REPS)
        return f"rep{rep} " + " ".join(family_words(fam))
    return "spam " * (10 + doc_id % 20) + "spam"


def build_corpus(spark, path: str) -> None:
    n_docs = N_FAMILIES * REPS + N_DEGEN

    def gen(batches):
        import pyarrow as pa

        for b in batches:
            ids = b.column("id").to_numpy()
            texts = [doc_text(int(i)) for i in ids]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(texts)],
                names=["doc_id", "text"])

    (spark.range(n_docs, numPartitions=CPUS * 4)
     .mapInArrow(gen, "doc_id long, text string")
     .write.mode("overwrite").option("compression", "snappy")
     .parquet(path))


def main() -> None:
    allowed = sorted(os.sched_getaffinity(0))
    os.sched_setaffinity(0, set(allowed[:min(CPUS, len(allowed))]))

    from pyspark.sql import functions as F

    from parquet_playground_rs_spark.operators import dedup as dd
    from parquet_playground_rs_spark.session import get_spark

    spark = get_spark(app="minhash-width", cores=CPUS,
                      shuffle_partitions=CPUS, driver_mem="12g", ui=True)
    n_docs = N_FAMILIES * REPS + N_DEGEN
    out: dict = {"n_docs": n_docs, "n_families": N_FAMILIES, "reps": REPS,
                 "n_degen": N_DEGEN, "max_bucket_cap": MAX_BUCKET,
                 "bands": BANDS, "rows_per_band": ROWS_PER_BAND}

    corpus_path = os.path.join(CACHE, f"mh_width_{N_FAMILIES}_{N_DEGEN}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        t0 = time.time()
        build_corpus(spark, corpus_path)
        out["corpus_build_sec"] = round(time.time() - t0, 1)
    docs = spark.read.parquet(corpus_path)

    def shuffle_totals():
        import urllib.request
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages") as r:
            stages = json.load(r)
        return (sum(s.get("shuffleReadBytes", 0) for s in stages),
                sum(s.get("shuffleWriteBytes", 0) for s in stages))

    # the operator under test, stage by stage (same composition as
    # dedup.minhash_dedup, with the cap explicit)
    rd0, wr0 = shuffle_totals()
    t0 = time.time()
    sh = dd.word_shingles(docs, n=3)
    sigs = dd.minhash_signatures(sh, k=BANDS * ROWS_PER_BAND)
    cand = dd.lsh_candidate_pairs(sigs, bands=BANDS,
                                  rows_per_band=ROWS_PER_BAND,
                                  max_bucket=MAX_BUCKET)
    pairs = dd.jaccard_pairs(sh, min_jaccard=0.8, pairs=cand) \
        .select("doc_a", "doc_b").persist()
    n_pairs = pairs.count()
    out["wall_sec"] = round(time.time() - t0, 1)
    rd1, wr1 = shuffle_totals()
    out["shuffle_read_bytes"] = int(rd1 - rd0)
    out["shuffle_write_bytes"] = int(wr1 - wr0)
    out["confirmed_pairs"] = int(n_pairs)

    # bucket-bound evidence: pre-cap vs post-cap largest bucket. The
    # banded frame is rebuilt exactly as lsh_candidate_pairs builds it
    # (same seeded expressions), so the sizes are the operator's own.
    band_keys = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(*[F.element_at("sig", b * ROWS_PER_BAND + r + 1)
                              for r in range(ROWS_PER_BAND)]).alias("key"))
        for b in range(BANDS)])
    banded = sigs.select("doc_id", F.explode(band_keys).alias("bk")) \
        .select("doc_id", F.col("bk.band").alias("band"),
                F.col("bk.key").alias("key")).persist()
    pre = banded.groupBy("band", "key").count()
    out["largest_bucket_precap"] = int(
        pre.agg(F.max("count")).first()[0])
    capped, keys = dd._cap_buckets(banded, ["band", "key"], MAX_BUCKET)
    post = capped.groupBy(*keys).count()
    out["largest_bucket_capped"] = int(
        post.agg(F.max("count")).first()[0])
    assert out["largest_bucket_precap"] >= N_DEGEN  # the monster bucket
    assert out["largest_bucket_capped"] <= 2 * MAX_BUCKET, \
        "cap failed to bound the largest self-join task"

    # planted-truth accounting
    fam_limit = N_FAMILIES * REPS
    fam_pairs = pairs.filter((F.col("doc_a") < fam_limit)
                             & (F.col("doc_b") < fam_limit))
    cross = fam_pairs.filter(
        F.floor(F.col("doc_a") / REPS)
        != F.floor(F.col("doc_b") / REPS)).count()
    n_fam_pairs = fam_pairs.count()
    expected_fam = N_FAMILIES * REPS * (REPS - 1) // 2
    out["family_pairs_expected"] = expected_fam
    out["family_pairs_found"] = int(n_fam_pairs)
    out["family_pairs_cross"] = int(cross)
    out["planted_pairs_found_pct"] = round(
        100.0 * n_fam_pairs / expected_fam, 4)
    # degenerate truth: within each capped sub-bucket all pairs are J=1,
    # across sub-buckets the cap deliberately drops them -> closed form
    # from the measured sub-bucket sizes (band 0 is representative: the
    # sub split is keyed by doc_id only, identical in every band)
    degen_sizes = [r["count"] for r in post.filter(
        (F.col("band") == 0)
        & (F.col("count") > REPS)).collect()]
    expected_degen = sum(s * (s - 1) // 2 for s in degen_sizes)
    n_degen_pairs = pairs.filter(F.col("doc_a") >= fam_limit).count()
    out["degen_subbuckets"] = sorted(degen_sizes, reverse=True)
    out["degen_pairs_expected"] = int(expected_degen)
    out["degen_pairs_found"] = int(n_degen_pairs)
    assert int(n_pairs) == int(n_fam_pairs) + int(n_degen_pairs)

    # sampled exact oracle: recompute 3-gram Jaccard driver-side for 50
    # families and compare the engine's pair set exactly
    sample_fams = [i * (N_FAMILIES // SAMPLE_FAMILIES)
                   for i in range(SAMPLE_FAMILIES)]
    sample_ids = {f * REPS + r for f in sample_fams for r in range(REPS)}
    expected_pairs = set()
    for f in sample_fams:
        sets = {}
        for r in range(REPS):
            words = [f"rep{r}"] + family_words(f)
            sets[f * REPS + r] = {
                " ".join(words[i:i + 3])
                for i in range(len(words) - 2)}
        for a, b in combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter / union >= 0.8:
                expected_pairs.add((a, b))
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.filter(
        F.col("doc_a").isin(list(sample_ids))
        & F.col("doc_b").isin(list(sample_ids))).collect()}
    out["sampled_families"] = SAMPLE_FAMILIES
    out["sampled_expected_pairs"] = len(expected_pairs)
    out["sampled_families_exact"] = bool(got == expected_pairs)
    assert got == expected_pairs, (
        f"sampled oracle mismatch: {len(got)} vs {len(expected_pairs)}")
    pairs.unpersist()
    banded.unpersist()

    bench_dir = Path(__file__).resolve().parent.parent / "BENCH"
    with open(bench_dir / "minhash_width.json", "w") as fh:
        json.dump(out, fh, indent=1)
    stamp = time.strftime("%Y-%m-%d %H:%M")
    with open(bench_dir / "MINHASH_WIDTH.md", "a") as fh:
        fh.write(
            f"\n## Run {stamp} — {n_docs:,} docs "
            f"({N_FAMILIES:,} families x {REPS} + {N_DEGEN:,} degenerate)"
            f"\n\n"
            f"- wall: **{out['wall_sec']}s** on local[{CPUS}]; shuffle "
            f"read {out['shuffle_read_bytes'] / 1e6:.0f} MB / write "
            f"{out['shuffle_write_bytes'] / 1e6:.0f} MB\n"
            f"- bucket bound: pre-cap largest bucket "
            f"{out['largest_bucket_precap']:,} (the degenerate block "
            f"collides in every band) -> post-cap "
            f"{out['largest_bucket_capped']:,} (cap {MAX_BUCKET:,}): the "
            f"biggest self-join task is bounded\n"
            f"- planted truth: {out['family_pairs_found']:,} family "
            f"pairs of {expected_fam:,} expected "
            f"({out['planted_pairs_found_pct']}%), 0 required "
            f"cross-family (got {out['family_pairs_cross']}); degenerate "
            f"pairs {out['degen_pairs_found']:,} == closed-form "
            f"{out['degen_pairs_expected']:,} from sub-bucket sizes "
            f"{out['degen_subbuckets']}\n"
            f"- sampled exact oracle ({SAMPLE_FAMILIES} families, "
            f"driver-side 3-gram Jaccard): "
            f"{'EXACT MATCH' if out['sampled_families_exact'] else 'MISMATCH'}"
            f" on {out['sampled_expected_pairs']} pairs\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
