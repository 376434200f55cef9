"""Dedup + similarity operators over the driver testdata (sf0.001)."""

import pytest
from pyspark.sql import functions as F

from parquet_playground_rs_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    return df


def test_exact_dedup_keeps_one_per_text(spark, docs):
    # construct known duplicates: append a copy of 5 docs with shifted ids
    base = docs.limit(5).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    )
    with_dups = docs.unionByName(base)
    out = dedup.exact_dedup(with_dups)
    assert out.count() == docs.count()
    # originals (min ids) survive
    assert out.filter(F.col("doc_id") >= 10_000_000).count() == 0


def test_minhash_finds_planted_near_dups(spark, docs):
    # plant near-duplicates: copy of text with the first word changed
    words_mut = F.concat(F.lit("zzz "), F.substring_index(F.col("text"), " ", -200))
    planted = (
        docs.limit(8)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
        .withColumn("text", words_mut)
    )
    with_dups = docs.unionByName(planted)
    pairs = dedup.minhash_dedup(with_dups, n=3, k=64, bands=16, threshold=0.5)
    rows = pairs.collect()
    found = {(r["doc_a"], r["doc_b"]) for r in rows}
    planted_pairs = {
        (r["doc_id"], r["doc_id"] + 10_000_000) for r in docs.limit(8).collect()
    }
    # every planted pair recovered (high jaccard, LSH at t=0.5 catches them)
    assert planted_pairs <= found
    # every reported pair is exact-confirmed above the threshold (the
    # testdata itself contains genuine near-dups — e.g. docs 0/50 at
    # jaccard 0.95 — so extra pairs are correct, not false positives)
    assert all(r["jaccard"] >= 0.5 for r in rows)


def test_lsh_candidates_superset_sanity(spark, docs):
    sh = dedup.word_shingles(docs.limit(50), n=3)
    sigs = dedup.minhash_signatures(sh, k=32)
    assert sigs.count() == 50
    assert sigs.select(F.size("sig")).distinct().first()[0] == 32
    # signatures deterministic across recomputation
    a = {r["doc_id"]: r["sig"] for r in sigs.collect()}
    b = {r["doc_id"]: r["sig"] for r in dedup.minhash_signatures(sh, k=32).collect()}
    assert a == b


def test_confirm_stage_is_candidate_first(spark, docs):
    """The exact-Jaccard confirm restricted by LSH candidates must join the
    candidate pairs BELOW the aggregation — no all-pairs shingle self-join,
    no post-aggregation semi-join (regression for the quadratic plan)."""
    sh = dedup.word_shingles(docs.limit(30), n=3)
    sigs = dedup.minhash_signatures(sh, k=32)
    cand = dedup.lsh_candidate_pairs(sigs, bands=8, rows_per_band=4)
    out = dedup.jaccard_pairs(sh, min_jaccard=0.5, pairs=cand)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" not in plan
    # candidate-restricted and unrestricted paths agree on confirmed pairs
    unrestricted = dedup.jaccard_pairs(sh, min_jaccard=0.5)
    got = {(r["doc_a"], r["doc_b"], r["inter"]) for r in out.collect()}
    full = {(r["doc_a"], r["doc_b"], r["inter"]) for r in unrestricted.collect()}
    assert got <= full
    cand_set = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    expected = {t for t in full if (t[0], t[1]) in cand_set}
    assert got == expected


def test_degenerate_bucket_is_salted_and_bounded(spark):
    """2000 identical docs: one LSH bucket per band. The cap must split it
    into sub-buckets (bounded self-join) while every doc still pairs up."""
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dedup.word_shingles(docs, n=3)
    sigs = dedup.minhash_signatures(sh, k=16)
    cand = dedup.lsh_candidate_pairs(sigs, bands=4, rows_per_band=4,
                                     max_bucket=100)
    # expected pair count: sum over sub-buckets of C(size,2), far below
    # C(2000,2) = 1_999_000; with ~20 sub-buckets of ~100 -> ~99_000
    n_pairs = cand.count()
    assert 0 < n_pairs < 600_000
    # every doc appears in at least one candidate pair (transitive dedup ok)
    touched = cand.select(F.col("doc_a").alias("d")).union(
        cand.select(F.col("doc_b").alias("d"))).distinct().count()
    assert touched == 2000


def test_simhash_near_pairs_on_planted(spark, docs):
    # exact copies -> hamming 0; short docs flip many bits on small edits,
    # so near-miss detection is asserted via the data's natural near-dups
    planted = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 10_000_000)
    with_dups = docs.unionByName(planted)
    sim = dedup.simhash(with_dups)
    assert sim.count() == with_dups.count()
    pairs = dedup.simhash_near_pairs(sim, max_hamming=3)
    rows = pairs.collect()
    found = {(r["doc_a"], r["doc_b"]) for r in rows}
    hamming = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    planted_pairs = {
        (r["doc_id"], r["doc_id"] + 10_000_000) for r in docs.limit(5).collect()
    }
    assert planted_pairs <= found
    assert all(hamming[p] == 0 for p in planted_pairs)


def test_brute_force_topk_self_nearest(spark, emb):
    dim = len(emb.first()["embedding"])
    queries = emb.limit(5)
    res = similarity.brute_force_topk(emb, queries, k=3)
    rows = res.collect()
    assert {r["query_id"] for r in rows} == {r["vec_id"] for r in queries.collect()}
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in per_q.items():
        assert len(rs) == 3
        cosines = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)
        assert all(-1.001 <= c <= 1.001 for c in cosines)


def test_lsh_topk_recall_against_brute_force(spark, emb):
    dim = len(emb.first()["embedding"])
    queries = emb.limit(10)
    bf = similarity.brute_force_topk(emb, queries, k=5)
    ann = similarity.lsh_topk(emb, queries, dim=dim, k=5, n_planes=12, bands=6)
    bf_set = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    ann_set = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    recall = len(bf_set & ann_set) / len(bf_set)
    # 6 bands of 2 bits is permissive; recall should be high on 150 vectors
    assert recall >= 0.6, recall


def test_ivf_topk_recall_against_brute_force(spark, emb):
    dim = len(emb.first()["embedding"])
    queries = emb.limit(10)
    bf = similarity.brute_force_topk(emb, queries, k=5)
    ivf = similarity.ivf_topk(emb, queries, dim=dim, k=5,
                              n_centroids=8, nprobe=4)
    bf_set = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    ivf_set = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    recall = len(bf_set & ivf_set) / len(bf_set)
    assert recall >= 0.6, recall
    # nprobe = all cells -> exact (recall 1.0)
    full = similarity.ivf_topk(emb, queries, dim=dim, k=5,
                               n_centroids=8, nprobe=8)
    full_set = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert full_set == bf_set


def test_ivf_centroids_deterministic(spark, emb):
    dim = len(emb.first()["embedding"])
    import numpy as np
    a = similarity.train_ivf_centroids(emb, dim, n_centroids=8)
    b = similarity.train_ivf_centroids(emb, dim, n_centroids=8)
    assert np.array_equal(a, b)


def test_embedding_near_dups_finds_duplicated_vectors(spark, emb):
    dim = len(emb.first()["embedding"])
    copies = emb.limit(4).withColumn("vec_id", F.col("vec_id") + 10_000_000)
    corpus = emb.unionByName(copies)
    dups = similarity.embedding_near_dups(corpus, dim=dim, threshold=0.999)
    found = {(r["id_a"], r["id_b"]) for r in dups.collect()}
    expected = {(r["vec_id"], r["vec_id"] + 10_000_000) for r in emb.limit(4).collect()}
    assert expected <= found


def test_exact_dedup_plan_metadata_only(spark, docs):
    """r3 scale refinement: exact_dedup must not move `text` through any
    exchange — keep decision via metadata aggregation + anti-join (AQE
    broadcasts the small loser set at runtime)."""
    import io
    import re
    from contextlib import redirect_stdout

    out = dedup.exact_dedup(docs)
    out.collect()  # finalize the adaptive plan
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "Window" not in p
    assert "LeftAnti" in p
    exch_inputs = re.findall(
        r"\(\d+\) Exchange[\s\S]*?Input \[\d+\]: \[([^\]]*)\]", p)
    assert exch_inputs, p
    assert not any("text" in x for x in exch_inputs), exch_inputs


def test_bucket_cap_plan_broadcast_not_window(spark):
    """r3: _cap_buckets learns bucket sizes via an aggregate joined back
    WITHOUT a broadcast hint — AQE broadcasts the (small) oversized-key
    set at runtime; no window over the whole banded table; never a forced
    driver collect of an adversarially large set."""
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta")
            for i in range(500)]
    docs500 = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup.minhash_signatures(dedup.word_shingles(docs500, n=3), k=16)
    cand = dedup.lsh_candidate_pairs(sigs, bands=4, rows_per_band=4,
                                     max_bucket=100)
    cand.collect()  # finalize the adaptive plan
    p = cand._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p
    assert "BroadcastExchange" in p  # AQE converted the size join


def test_lsh_topk_cap_plan_single_window(spark, emb):
    """r3: lsh_topk's only window is the final top-k rank; bucket capping
    is aggregate + broadcast."""
    import re

    dim = len(emb.select("embedding").first()["embedding"])
    out = similarity.lsh_topk(emb, emb.orderBy("vec_id").limit(3),
                              dim=dim, k=3, max_bucket=10)
    # capping still bounds and preserves function: results exist
    assert out.count() > 0
    out.collect()  # finalize the adaptive plan on this df's execution
    p = out._jdf.queryExecution().executedPlan().toString()
    final = p.split("== Initial Plan ==")[0]  # AQE prints both sections
    assert len(re.findall(r"\bWindow\b", final)) == 1, final
    assert "BroadcastExchange" in final


def test_simhash_md5_variant_matches_pure_python(spark):
    """The oracle-reproducible md5 simhash variant must equal an
    independent pure-python recomputation bit-for-bit (the same closed
    form the DuckDB oracle evaluates)."""
    import hashlib

    def py_simhash(text, seed=42):
        sums = [0] * 64
        for w in text.split(" "):
            m = hashlib.md5(f"{w}:{seed}".encode()).hexdigest()
            h1, h2 = int(m[:8], 16), int(m[8:16], 16)
            for j in range(64):
                bit = (h1 >> j) & 1 if j < 32 else (h2 >> (j - 32)) & 1
                sums[j] += 1 if bit else -1
        fp = sum(1 << j for j in range(64) if sums[j] > 0)
        return fp - (1 << 64) if fp >= (1 << 63) else fp

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different words entirely here now",
        "a a a repeated repeated words words words weighting",
    ]
    docs4 = spark.createDataFrame(list(enumerate(texts)),
                                  "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"]
           for r in dedup.simhash(docs4, hash_fn="md5").collect()}
    assert got == {i: py_simhash(t) for i, t in enumerate(texts)}


def test_exact_dedup_null_texts_dedup_together(spark):
    """Review r3: an equi-join on md5(text) would silently skip NULL keys
    and keep every NULL-text duplicate; they must dedup as one group."""
    rows = [(1, None), (2, None), (3, "x"), (4, "x"), (5, None)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r["doc_id"] for r in dedup.exact_dedup(d).collect()}
    assert kept == {1, 3}


def test_null_embedding_raises_both_paths(spark):
    """NULL-embedding contract (round-5): the literal projection path and
    the mapInArrow kernel path both RAISE — the literal path used to hash
    NULLs silently to the all-zero bucket while the kernel crashed, so the
    same corpus worked or died depending on n_planes*dim."""
    rows = [(1, [1.0, 2.0, 3.0, 4.0]), (2, None), (3, [0.5, 0.1, 0.9, 0.2])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    # literal path: 4 planes x 4 dims << LITERAL_PROJECTION_MAX
    lit_b = similarity.signbit_buckets(df, dim=4, n_planes=4, bands=2)
    with pytest.raises(Exception, match="NULL embedding"):
        lit_b.collect()
    # kernel path: force it by dropping the threshold
    orig = similarity.LITERAL_PROJECTION_MAX
    similarity.LITERAL_PROJECTION_MAX = 1
    try:
        ker_b = similarity.signbit_buckets(df, dim=4, n_planes=4, bands=2)
        with pytest.raises(Exception, match="NULL embedding"):
            ker_b.collect()
    finally:
        similarity.LITERAL_PROJECTION_MAX = orig
    # IVF literal cell assignment under the same contract
    import numpy as np
    C = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0]])
    with pytest.raises(Exception, match="NULL embedding"):
        similarity.ivf_topk(df, df.filter("vec_id=1"), dim=4,
                            n_centroids=2, nprobe=1, centroids=C).collect()
    # clean frames still work on both paths
    ok = df.filter("embedding is not null")
    assert similarity.signbit_buckets(ok, dim=4, n_planes=4, bands=2).count() == 4
