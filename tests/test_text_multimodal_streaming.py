"""Text functions, multimodal plumbing, and streaming incremental encode."""

import pytest
from pyspark.sql import functions as F

from parquet_playground_rs_spark.functions import text as T
from parquet_playground_rs_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    df.count()
    return df


def test_text_counters_consistent(spark, docs):
    out = docs.select(
        T.n_words("text").alias("nw"),
        T.n_subword_tokens("text").alias("nt"),
        T.stopword_count("text").alias("sw"),
        T.punct_count("text").alias("pc"),
        T.quality_score("text").alias("q"),
    ).collect()
    for r in out:
        assert r["nw"] >= 1
        assert r["nt"] >= r["nw"] - 1  # subword count >= word count (spaces aside)
        assert 0 <= r["sw"] <= r["nw"]
        assert 0.0 <= r["q"] <= 1.0


def test_gopher_keep_rules(spark):
    rows = [
        (1, "the cat sat on the mat and it was a very good day for all"),
        (2, "short text"),                        # < 10 words
        (3, " ".join(["zz"] * 50)),               # no stopwords
        (4, "the " * 10 + "!!!" * 200),           # punctuation flood
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r["doc_id"] for r in df.filter(T.gopher_keep("text")).collect()}
    assert kept == {1}


def test_lang_id_returns_known_code(spark, docs):
    out = docs.select(T.lang_id("text").alias("lang")).distinct().collect()
    allowed = set(T.LANG_MARKERS) | {"und"}
    assert {r["lang"] for r in out} <= allowed


def test_rolling_fingerprint_identity(spark, docs):
    from parquet_playground_rs_spark.sources.tokenizer import tokenize_documents

    seq = tokenize_documents(docs).cache()
    fp = seq.select("doc_id", T.rolling_fingerprint("tokens").alias("fp"))
    # equal texts -> equal fingerprints (testdata has exact/near dup texts;
    # check the invariant: same tokens array implies same fp)
    joined = (
        seq.alias("a").join(seq.alias("b"), F.col("a.tokens") == F.col("b.tokens"))
        .select(F.col("a.doc_id").alias("ia"), F.col("b.doc_id").alias("ib"))
    )
    fps = {r["doc_id"]: r["fp"] for r in fp.collect()}
    for r in joined.collect():
        assert fps[r["ia"]] == fps[r["ib"]]


def test_multimodal_feature_extraction(spark):
    media = mm.synthetic_media_df(spark, 60).cache()
    assert media.count() == 60
    feats = mm.extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(len(r["feature"]) == 16 for r in rows)
    assert all(r["feat_meta"]["dim"] == 16 for r in rows)
    # deterministic: same payload -> same feature
    again = {r["media_id"]: r["feature"] for r in mm.extract_features(media, dim=16).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["feature"]


def test_multimodal_real_decode_raises(spark):
    media = mm.synthetic_media_df(spark, 5)
    with pytest.raises(Exception, match="NotImplementedError|not available|media decode"):
        mm.extract_features(media, use_fake=False).collect()


def test_resize_and_frame_sampling(spark):
    media = mm.synthetic_media_df(spark, 40).cache()
    resized = mm.resize_images(media, 224, 224)
    imgs = resized.filter(F.col("kind") == "image").select("media_meta.width").distinct().collect()
    assert [r["width"] for r in imgs] == [224]
    vids = media.filter(F.col("kind") == "video").count()
    frames = mm.sample_video_frames(media, every_n=50)
    assert frames.select("media_id").distinct().count() == vids
    assert frames.filter(F.col("frame_idx") >= F.col("n_frames")).count() == 0


def test_streaming_incremental_encode(spark, tmp_path):
    from parquet_playground_rs_spark.operators import decode as dec
    from parquet_playground_rs_spark.sources.generator import sequences_df
    from parquet_playground_rs_spark.streaming.incremental import stream_encode

    in_dir = str(tmp_path / "incoming")
    out_dir = str(tmp_path / "encoded")
    # wave 1
    seq1 = sequences_df(spark, 100, seed=1, partitions=2)
    seq1.write.mode("append").parquet(in_dir)
    q = stream_encode(spark, in_dir, out_dir, chunk_size=512)
    try:
        q.processAllAvailable()
        # wave 2 lands while the stream is up
        seq2 = sequences_df(spark, 80, seed=2, partitions=2) \
            .withColumn("doc_id", F.concat(F.lit("w2_"), F.col("doc_id")))
        seq2.write.mode("append").parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()
    both = seq1.unionByName(
        spark.read.parquet(in_dir).filter(F.col("doc_id").startswith("w2_"))
    )
    encoded = spark.read.parquet(f"{out_dir}/data")
    decoded = dec.decode_tokens(encoded)
    res = dec.verify_roundtrip(both, decoded).first()
    assert res["n_mismatch"] == 0
    assert res["n_joined"] == 180
