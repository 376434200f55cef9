"""End-to-end Spark round-trip: generate -> encode -> decode -> exact equality.

The distributed version of the reference's write-then-read-back equality
suite (/root/reference/src/vec_pq_reader.rs:821-880), including the
chunk-boundary discipline: runs at several Arrow batch sizes and partition
counts, plus through a real Parquet write/read of the encoded table.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_playground_rs_spark.operators import decode as dec
from parquet_playground_rs_spark.operators import encode as enc
from parquet_playground_rs_spark.sources.generator import sequences_df

N_ROWS = 400


@pytest.fixture(scope="module")
def seq(spark):
    df = sequences_df(spark, N_ROWS, seed=42, partitions=4).cache()
    df.count()
    return df


def test_generator_shape_and_determinism(spark, seq):
    assert seq.schema.simpleString() == (
        "struct<doc_id:string,tokens:array<int>,n_tok:int,source:string>"
    )
    assert seq.count() == N_ROWS
    # n_tok always equals size(tokens)
    bad = seq.filter(F.size("tokens") != F.col("n_tok")).count()
    assert bad == 0
    # deterministic across parallelism levels
    a = {r["doc_id"]: r["tokens"] for r in seq.collect()}
    b = {r["doc_id"]: r["tokens"]
         for r in sequences_df(spark, N_ROWS, seed=42, partitions=13).collect()}
    assert a == b
    # covers empties and long-tail rows
    assert seq.filter(F.col("n_tok") == 0).count() > 0
    assert seq.filter(F.col("n_tok") > 1000).count() > 0
    # int32 bounds actually exercised
    mm = seq.select(F.min(F.array_min("tokens")), F.max(F.array_max("tokens"))).first()
    assert mm[0] == -(2**31) and mm[1] == 2**31 - 1


def test_roundtrip_exact(spark, seq):
    encoded = enc.encode_tokens(seq, chunk_size=512, num_partitions=8)
    decoded = dec.decode_tokens(encoded)
    res = dec.verify_roundtrip(seq, decoded).first()
    assert res["n_mismatch"] == 0
    assert res["n_source"] == res["n_decoded"] == res["n_joined"] == N_ROWS


def test_roundtrip_with_small_byte_bounded_batches(spark, seq):
    """The mapper-split path under a tiny arrow byte cap: long documents
    arrive in byte-bounded batches and must still chunk+round-trip."""
    key = "spark.sql.execution.arrow.maxBytesPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "65536")
    try:
        encoded = enc.encode_tokens(seq, chunk_size=256)
        res = dec.verify_roundtrip(seq, dec.decode_tokens(encoded)).first()
        assert res["n_mismatch"] == 0 and res["n_joined"] == N_ROWS
    finally:
        spark.conf.set(key, old)


@pytest.mark.parametrize("batch_size", [1, 7, 100, 10000])
def test_roundtrip_across_arrow_batch_sizes(spark, seq, batch_size):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    try:
        encoded = enc.encode_tokens(seq, chunk_size=256)
        res = dec.verify_roundtrip(seq, dec.decode_tokens(encoded)).first()
        assert res["n_mismatch"] == 0 and res["n_joined"] == N_ROWS
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_roundtrip_through_parquet(spark, seq, tmp_path):
    """Encoded table survives a real partitioned Parquet write/read."""
    out = str(tmp_path / "encoded")
    enc.encode_tokens(seq, chunk_size=512).write.partitionBy("source").parquet(out)
    encoded = spark.read.parquet(out)
    res = dec.verify_roundtrip(seq, dec.decode_tokens(encoded)).first()
    assert res["n_mismatch"] == 0 and res["n_joined"] == N_ROWS


def test_composed_decode_is_single_execution(spark, seq):
    """decode_tokens over a composed (non-scan, un-cached) encode pipeline
    must persist its input so encode runs ONCE, not once per branch."""
    encoded = enc.encode_tokens(seq, chunk_size=512)
    out = dec.decode_tokens(encoded)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both branches read the persisted relation instead of replaying encode
    assert "InMemoryTableScan" in plan
    # the encode mapper chain must not appear as a live (non-cached) node:
    # executedPlan prints cached subtrees only inside InMemoryRelation
    res = dec.verify_roundtrip(seq, out).first()
    assert res["n_mismatch"] == 0 and res["n_joined"] == N_ROWS


def test_scan_input_decode_skips_materialization(spark, seq, tmp_path):
    """Parquet-scan inputs re-scan for free: no persist, and the n_chunks
    filters push into the scan."""
    out_dir = str(tmp_path / "enc_scan")
    enc.encode_tokens(seq, chunk_size=512).write.parquet(out_dir)
    encoded = spark.read.parquet(out_dir)
    out = dec.decode_tokens(encoded)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan
    assert "PushedFilters" in plan or "n_chunks" in plan
    res = dec.verify_roundtrip(seq, out).first()
    assert res["n_mismatch"] == 0 and res["n_joined"] == N_ROWS


def test_split_offsets_edges():
    """Mapper-side split: offsets refinement must mirror split_skew exactly
    (empty rows, exact multiples, 1-token rows, long tails)."""
    offsets = np.array([0, 0, 5, 5, 21, 22, 1046], dtype=np.int64)
    new_off, row_rep, chunk_idx, n_chunks = enc._split_offsets(offsets, 8)
    lens = np.diff(offsets)
    exp_chunks = [1, 1, 1, 2, 1, 128]
    assert list(np.bincount(row_rep, minlength=6)) == exp_chunks
    assert new_off[0] == 0 and new_off[-1] == 1046
    out_lens = np.diff(new_off)
    assert out_lens.max() <= 8 and (out_lens >= 0).all()
    # per-parent reassembly
    for i in range(6):
        assert out_lens[row_rep == i].sum() == lens[i]
    # chunk_idx sequential per parent, n_chunks constant per parent
    for i in range(6):
        ci = chunk_idx[row_rep == i]
        assert list(ci) == list(range(exp_chunks[i]))
        assert set(n_chunks[row_rep == i]) == {exp_chunks[i]}


def test_mapper_split_equals_jvm_split(spark, seq):
    """Both split placements must produce identical encoded chunk sets."""
    a = enc.encode_tokens(seq, chunk_size=512, mapper_split=True)
    b = enc.encode_tokens(seq, chunk_size=512, mapper_split=False)
    cols = ["doc_id", "chunk_idx", "n_chunks", "codec"]
    ha = a.select(*cols, F.xxhash64("block").alias("h"))
    hb = b.select(*cols, F.xxhash64("block").alias("h"))
    assert ha.exceptAll(hb).count() == 0
    assert hb.exceptAll(ha).count() == 0


def test_skew_split_chunks_longtail(spark, seq):
    chunked = enc.split_skew(seq, chunk_size=512)
    # every chunk obeys the size cap
    assert chunked.filter(F.size("tokens") > 512).count() == 0
    # chunk sizes reassemble to the original n_tok
    sizes = (
        chunked.groupBy("doc_id").agg(F.sum(F.size("tokens")).alias("s"))
        .join(seq.select("doc_id", "n_tok"), "doc_id")
        .filter(F.col("s") != F.col("n_tok"))
    )
    assert sizes.count() == 0
    # a long doc actually split
    assert chunked.filter(F.col("n_chunks") > 1).count() > 0


def test_compression_beats_plain(spark, seq):
    encoded = enc.encode_tokens(seq, chunk_size=512).cache()
    agg = encoded.agg(
        F.sum("meta.input_bytes").alias("inb"),
        F.sum("meta.output_bytes").alias("outb"),
    ).first()
    assert agg["outb"] < agg["inb"]  # net win across the mixed workload
    # every codec family appears on this workload
    codecs = {r["codec"] for r in encoded.select("codec").distinct().collect()}
    assert {"plain", "rle", "dict", "bitpack", "fordelta"} <= codecs
    encoded.unpersist()


def test_encoded_sink_writer_config(spark, seq, tmp_path):
    """E5-E7 fidelity: v2 writer encodings in the footer, stats disabled on
    the block column only, readable round-trip."""
    import glob

    import pyarrow.parquet as pq

    out = str(tmp_path / "enc_cfg")
    enc.write_encoded(enc.encode_tokens(seq, chunk_size=512), out)
    files = glob.glob(out + "/*.parquet")
    assert files
    saw_block = saw_v2_encoding = False
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                root = col.path_in_schema.split(".")[0]
                if root == "block":
                    saw_block = True
                    assert col.statistics is None  # E5/E6 opt-out
                else:
                    assert col.statistics is not None  # pruning kept
                if any(e.startswith(("DELTA_", "RLE_DICT"))
                       for e in col.encodings):
                    saw_v2_encoding = True  # E7: v2 writer active
    assert saw_block and saw_v2_encoding
    res = dec.verify_roundtrip(
        seq, dec.decode_tokens(spark.read.parquet(out))).first()
    assert res["n_mismatch"] == 0 and res["n_joined"] == N_ROWS


def test_checksum_verify_matches_and_catches_corruption(spark, seq):
    """Join-free checksum verify: clean round-trip -> 0; any single-row
    corruption or row loss -> -1."""
    encoded = enc.encode_tokens(seq, chunk_size=512)
    decoded = dec.decode_tokens(encoded)
    ok = dec.verify_roundtrip(seq, decoded, method="checksum").first()
    assert ok["n_mismatch"] == 0
    assert ok["n_source"] == ok["n_decoded"] == N_ROWS
    # content corruption
    bad = decoded.withColumn(
        "tokens",
        F.when(F.col("doc_id") == "doc_000000000003",
               F.array(F.lit(999))).otherwise(F.col("tokens")))
    assert dec.verify_roundtrip(seq, bad, method="checksum") \
        .first()["n_mismatch"] == -1
    # row loss
    missing = decoded.filter(F.col("doc_id") != "doc_000000000005")
    assert dec.verify_roundtrip(seq, missing, method="checksum") \
        .first()["n_mismatch"] == -1
    # doc_id swap of two rows' tokens must be caught (id is in the hash)
    swapped = decoded.withColumn(
        "doc_id",
        F.when(F.col("doc_id") == "doc_000000000003",
               "doc_000000000004")
        .when(F.col("doc_id") == "doc_000000000004",
              "doc_000000000003")
        .otherwise(F.col("doc_id")))
    assert dec.verify_roundtrip(seq, swapped, method="checksum") \
        .first()["n_mismatch"] == -1


def test_rowwise_decoder_matches_columnar(spark, seq):
    """S5/A6 contrast path: identical output, different execution shape."""
    encoded = enc.encode_tokens(seq.limit(80), chunk_size=256).cache()
    key = ["doc_id", "chunk_idx"]
    a = {tuple(r[k] for k in key): r["tokens"]
         for r in dec.decode_blocks(encoded).collect()}
    b = {tuple(r[k] for k in key): r["tokens"]
         for r in dec.decode_blocks_rowwise(encoded).collect()}
    assert a == b and len(a) >= 80
    encoded.unpersist()


def test_verify_catches_corruption(spark, seq):
    """Negative control: a corrupted decode must be flagged."""
    encoded = enc.encode_tokens(seq, chunk_size=512)
    decoded = dec.decode_tokens(encoded).withColumn(
        "tokens",
        F.when(F.col("doc_id") == "doc_000000000003",
               F.array(F.lit(999))).otherwise(F.col("tokens")),
    )
    res = dec.verify_roundtrip(seq, decoded).first()
    assert res["n_mismatch"] >= 1


def test_checksum_verify_empty_inputs(spark):
    """ADVICE r2: bit_xor over zero rows is NULL on both sides; a
    vacuously-correct empty round-trip must report n_mismatch=0, not -1."""
    empty_s = spark.createDataFrame([], "doc_id string, tokens array<int>")
    empty_d = spark.createDataFrame([], "doc_id string, tokens array<int>")
    r = dec.verify_roundtrip(empty_s, empty_d, method="checksum").first()
    assert r["n_mismatch"] == 0
    assert r["n_source"] == 0 and r["n_decoded"] == 0
    # empty-vs-nonempty still fails loudly
    one = spark.createDataFrame([("a", [1, 2])],
                                "doc_id string, tokens array<int>")
    assert dec.verify_roundtrip(empty_s, one, method="checksum") \
        .first()["n_mismatch"] == -1


def test_decode_tokens_release_cache(spark):
    """r3: the cache decode_tokens auto-creates for a composed pipeline is
    releasable; no cached blocks leak once the caller is done."""
    from parquet_playground_rs_spark.sources.generator import sequences_df

    seq2 = sequences_df(spark, 50, seed=7, partitions=2)
    decoded = dec.decode_tokens(enc.encode_tokens(seq2, chunk_size=64))
    assert decoded.count() == 50
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    assert dec.release_decode_cache(decoded) is True
    assert jsc.getPersistentRDDs().size() < before
    assert dec.release_decode_cache(decoded) is False  # idempotent
    # a cheap-rescan input (parquet scan) creates nothing to release
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        enc.write_encoded(enc.encode_tokens(seq2, chunk_size=64), d)
        dec2 = dec.decode_tokens(spark.read.parquet(d))
        assert dec2.count() == 50
        assert dec.release_decode_cache(dec2) is False


def test_encode_summary_synthetic_constants(spark):
    """Pin the deterministic generator totals the encode_summary oracle
    inlines as literals: if the generator or chunking changes, this fails
    before the driver compare does."""
    import __spark_entry__ as entry
    from parquet_playground_rs_spark.sources.generator import sequences_df

    syn = sequences_df(spark, 2000, seed=42, partitions=4)
    r = syn.agg(
        F.sum(F.greatest(F.lit(1), F.ceil(F.col("n_tok") / 4096)))
        .alias("nb"),
        (4 * F.sum("n_tok")).alias("ib"),
    ).first()
    assert int(r["nb"]) == entry._SYN_N_BLOCKS
    assert int(r["ib"]) == entry._SYN_INPUT_BYTES


def test_statistics_granularity_modes(spark, tmp_path):
    """E5: the statistics mode enum (none/chunk/page) mirroring the
    reference's CLI granularity control, footer-verified."""
    import glob

    import pyarrow.parquet as pq
    import pytest as _pytest

    from parquet_playground_rs_spark.sources.generator import sequences_df

    # enough rows that the default writer splits data pages (page row
    # limit 20k), so chunk mode's page coalescing is observable
    seq2 = sequences_df(spark, 3000, seed=3, partitions=1).cache()
    encoded = enc.encode_tokens(seq2, chunk_size=512)

    def footer(path):
        f = glob.glob(path + "/*.parquet")
        assert len(f) == 1
        md = pq.ParquetFile(f[0]).metadata
        col = next(
            md.row_group(0).column(i)
            for i in range(md.row_group(0).num_columns)
            if md.row_group(0).column(i).path_in_schema.startswith("doc_id"))
        import os
        return col.is_stats_set, col.has_column_index, os.path.getsize(f[0])

    paths = {m: str(tmp_path / m) for m in ("page", "chunk", "none")}
    for m, p in paths.items():
        enc.write_encoded(encoded.coalesce(1), p, statistics=m)
    p_stats, p_index, p_size = footer(paths["page"])
    c_stats, c_index, c_size = footer(paths["chunk"])
    n_stats, n_index, _ = footer(paths["none"])
    assert (p_stats, p_index) == (True, True)     # full granularity
    assert (n_stats, n_index) == (False, False)   # all stats dropped
    # chunk: stats kept; column index degenerates to one page per chunk —
    # observable as strictly fewer page headers (smaller file, same data)
    assert (c_stats, c_index) == (True, True)
    assert c_size < p_size
    # identical data through every mode
    for p in paths.values():
        assert spark.read.parquet(p).count() == encoded.count()
    with _pytest.raises(ValueError):
        enc.write_encoded(encoded, str(tmp_path / "bad"), statistics="rows")
    seq2.unpersist()


def test_release_all_decode_caches_after_composition(spark):
    """Review r3: a derived frame loses the per-DataFrame persist handle;
    the process-wide sweep must still release the cache."""
    from parquet_playground_rs_spark.sources.generator import sequences_df

    seq3 = sequences_df(spark, 40, seed=9, partitions=2)
    composed = dec.decode_tokens(enc.encode_tokens(seq3, chunk_size=64)) \
        .filter(F.col("n_tok") >= 0)
    assert composed.count() == 40
    assert dec.release_decode_cache(composed) is False  # handle lost
    assert dec.release_all_decode_caches() >= 1
    assert dec.release_all_decode_caches() == 0


def test_bucketed_tables_join_without_exchange(spark, seq, tmp_path):
    """r3: co-located joins — encoded table and source bucketed by doc_id
    into the same bucket count must join with ZERO exchange and zero
    sort (the verify path's dominant shuffle at 10^12 rows)."""
    enc.write_encoded_bucketed(
        enc.encode_tokens(seq, chunk_size=512).filter("n_chunks = 1"),
        "enc_b", str(tmp_path / "enc_b"), n_buckets=8)
    enc.write_encoded_bucketed(seq, "src_b", str(tmp_path / "src_b"),
                               n_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("enc_b").join(spark.table("src_b"), "doc_id") \
            .select("doc_id", "codec", "n_tok")
        n = j.count()
        assert n == spark.table("enc_b").count()
        p = j._jdf.queryExecution().executedPlan().toString()
        final = p.split("== Initial Plan ==")[0]
        assert "Exchange" not in final, final
        assert "SortMergeJoin" in final
        # bucket sort is reused: no Sort node above the scans either
        assert final.count("Sort ") <= 2  # SMJ prints sort keys, not nodes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS enc_b")
        spark.sql("DROP TABLE IF EXISTS src_b")


def test_fused_verify_matches_and_catches_corruption(spark, seq):
    """r3: the reassembly-free per-chunk verify (both sides hash the same
    chunk grid JVM-side, no join, no multi-chunk groupBy) agrees with the
    exact join verify, detects token corruption, and requires the
    matching chunk grid."""
    encoded = enc.encode_tokens(seq, chunk_size=512).cache()
    try:
        ok = dec.verify_encoded(seq, encoded, chunk_size=512).first()
        assert ok["n_mismatch"] == 0
        assert ok["n_source"] == ok["n_decoded"] == ok["n_joined"] > N_ROWS
        # corruption: swap one document's tokens for another's
        bad_seq = seq.withColumn(
            "tokens",
            F.when(F.col("doc_id") == seq.first()["doc_id"],
                   F.array(F.lit(999))).otherwise(F.col("tokens")))
        assert dec.verify_encoded(bad_seq, encoded, chunk_size=512) \
            .first()["n_mismatch"] == -1
        # wrong chunk grid is a mismatch, not a silent pass
        assert dec.verify_encoded(seq, encoded, chunk_size=256) \
            .first()["n_mismatch"] == -1
        # row-count drift detected
        assert dec.verify_encoded(seq.limit(100), encoded, chunk_size=512) \
            .first()["n_mismatch"] == -1
    finally:
        encoded.unpersist()
    # empty inputs are vacuously correct
    empty = spark.createDataFrame(
        [], "doc_id string, tokens array<int>, n_tok int, source string")
    empty_enc = enc.encode_tokens(empty, chunk_size=512)
    r = dec.verify_encoded(empty, empty_enc, chunk_size=512).first()
    assert r["n_mismatch"] == 0 and r["n_source"] == 0
