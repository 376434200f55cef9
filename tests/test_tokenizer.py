"""Vocabulary build: scalable two-pass rank must equal the global rank."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from parquet_playground_rs_spark.sources.tokenizer import (
    build_vocab,
    tokenize_documents,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    df.count()
    return df


def test_vocab_matches_global_rank(spark, docs):
    vocab = build_vocab(docs)
    # naive single-window reference (fine at test scale)
    words = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("word")).distinct()
    ref = words.select(
        "word",
        (F.row_number().over(Window.orderBy("word")) - 1).cast("int").alias("token_id"),
    )
    got = {r["word"]: r["token_id"] for r in vocab.collect()}
    exp = {r["word"]: r["token_id"] for r in ref.collect()}
    assert got == exp


def test_vocab_invariant_to_partition_count(spark, docs):
    a = {r["word"]: r["token_id"] for r in build_vocab(docs, 4).collect()}
    b = {r["word"]: r["token_id"] for r in build_vocab(docs, 29).collect()}
    assert a == b


def test_vocab_plan_has_no_single_partition_exchange(spark, docs):
    vocab = build_vocab(docs)
    plan = vocab._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_tokenize_roundtrips_word_order(spark, docs):
    seq = tokenize_documents(docs.limit(20))
    rows = {r["doc_id"]: r for r in seq.collect()}
    vocab = {r["word"]: r["token_id"] for r in build_vocab(docs.limit(20)).collect()}
    for r in docs.limit(20).collect():
        toks = [vocab[w] for w in r["text"].split(" ")]
        got = rows[str(r["doc_id"])]
        assert list(got["tokens"]) == toks
        assert got["n_tok"] == len(toks)
