"""Resumable pipeline: kill-and-resume against per-bucket lineage manifests."""

import json
import os

import pytest
from pyspark.sql import functions as F

from parquet_playground_rs_spark.plans import pipeline as pl
from parquet_playground_rs_spark.sources.generator import sequences_df

N_ROWS = 300


@pytest.fixture(scope="module")
def seq(spark):
    df = sequences_df(spark, N_ROWS, seed=7, partitions=4).cache()
    df.count()
    return df


def test_full_run_and_verify(spark, seq, tmp_path):
    out = str(tmp_path / "run1")
    summary = pl.run_encode_job(spark, seq, out, n_buckets=4, chunk_size=512)
    assert summary["processed_buckets"] == 4
    assert summary["output_bytes"] < summary["input_bytes"]
    res = pl.verify_job(spark, seq, out)
    assert res["n_mismatch"] == 0 and res["n_joined"] == N_ROWS


def test_kill_and_resume(spark, seq, tmp_path):
    out = str(tmp_path / "run2")
    # crash after 2 of 6 buckets
    with pytest.raises(RuntimeError, match="injected failure"):
        pl.run_encode_job(spark, seq, out, n_buckets=6, chunk_size=512,
                          buckets_per_commit=2, fail_after_buckets=2)
    assert len(pl.completed_buckets(spark, out)) == 2
    # resume: must process only the remaining 4
    summary = pl.run_encode_job(spark, seq, out, n_buckets=6, chunk_size=512,
                                buckets_per_commit=2)
    assert summary["resumed_buckets"] == 2
    assert summary["processed_buckets"] == 4
    res = pl.verify_job(spark, seq, out)
    assert res["n_mismatch"] == 0 and res["n_joined"] == N_ROWS
    # idempotent: a third run does nothing
    summary = pl.run_encode_job(spark, seq, out, n_buckets=6, chunk_size=512)
    assert summary["processed_buckets"] == 0


def test_manifest_lineage_content(spark, seq, tmp_path):
    out = str(tmp_path / "run3")
    pl.run_encode_job(spark, seq, out, n_buckets=3, chunk_size=512)
    mrows = [json.loads(open(os.path.join(out, "manifest", f)).read())
             for f in sorted(os.listdir(os.path.join(out, "manifest")))
             if f.endswith(".json")]
    assert [r["bucket"] for r in mrows] == [0, 1, 2]
    assert all(r["status"] == "done" for r in mrows)
    total_rows = sum(r["n_rows"] for r in mrows)
    enc_df = pl.read_encoded(spark, out)
    assert total_rows == enc_df.count()
    # codec histogram in the manifest matches the data
    hist = {}
    for r in mrows:
        for k, v in json.loads(r["codec_hist"]).items():
            hist[k] = hist.get(k, 0) + v
    data_hist = {r["codec"]: r["count"]
                 for r in enc_df.groupBy("codec").count().collect()}
    assert hist == data_hist
    # manifest doc counts: chunked docs may appear in >1 bucket, so the sum
    # is >= distinct docs
    assert sum(r["n_docs"] for r in mrows) >= seq.select("doc_id").distinct().count()


def test_bucket_assignment_deterministic(spark, seq):
    a = seq.withColumn("chunk_idx", F.lit(0)).withColumn("b", pl.bucket_col(16))
    b = seq.repartition(11).withColumn("chunk_idx", F.lit(0)).withColumn("b", pl.bucket_col(16))
    am = {r["doc_id"]: r["b"] for r in a.collect()}
    bm = {r["doc_id"]: r["b"] for r in b.collect()}
    assert am == bm
