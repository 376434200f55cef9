"""Reference-parity: histogram generator, JSON source, pivot, touch-sum,
row-pack codec (SURVEY.md §2.1 S1-S3/S8, §2.2 P1-P4, §2.3 A1-A6, §2.4 E8/E9).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_playground_rs_spark.operators import histogram_pivot as hp
from parquet_playground_rs_spark.sources import histograms as hs

N = 50


@pytest.fixture(scope="module")
def hist(spark):
    df = hs.histograms_df(spark, N, n_tags=5, n_points=60, seed=42).cache()
    df.count()
    return df


def test_generator_shape(spark, hist):
    assert hist.count() == N
    r = hist.first()
    assert len(r["ts"]) == 60 and len(r["count"]) == 60
    # cumulative => strictly nondecreasing counts
    bad = hist.filter(
        F.exists(F.zip_with(F.slice("count", 1, 59), F.slice("count", 2, 59),
                            lambda a, b: b < a), lambda x: x)
    ).count()
    assert bad == 0
    # nullable elements actually present in sums
    with_null = hist.filter(
        F.exists("sumsLong", lambda x: x.isNull())).count()
    assert with_null > 0


def test_json_source_roundtrip_gz(spark, hist, tmp_path):
    """S1-S3: write gzip JSON, read back with explicit schema, same data."""
    path = str(tmp_path / "hist_json")
    hs.write_histograms_json(hist, path, gzip=True)
    import glob
    assert glob.glob(path + "/*.gz")  # really gzipped
    back = hs.read_histograms_json(spark, path)
    a = hp.touch_sum(hist).first().asDict()
    b = hp.touch_sum(back).first().asDict()
    sd_a, sd_b = a.pop("sums_double_sum"), b.pop("sums_double_sum")
    assert a == b  # integer checksums exact
    # double sum: accumulation order differs across partitionings
    assert abs(sd_a - sd_b) < 1e-6 * max(abs(sd_a), 1.0)


def test_pivot_dynamic_tags(spark, hist):
    keys = hp.tag_key_union(hist)
    assert keys == sorted(keys) and len(keys) == 5
    wide = hp.pivot_tags(hist, keys)
    assert set(keys) <= set(wide.columns)
    # every row filled (all rows carry all 5 tags here)
    assert wide.filter(F.col(keys[0]).isNull()).count() == 0
    # P3: a key absent from a row pivots to null
    extra = hp.pivot_tags(hist, keys + ["nonexistent_tag"])
    assert extra.filter(F.col("nonexistent_tag").isNull()).count() == N


def test_pivot_hexified_names(spark, hist):
    wide = hp.pivot_tags(hist, hex_names=True)
    assert hp.hexify("host") == "686f7374"
    assert "686f7374" in wide.columns


def test_touch_sum_values(spark, hist):
    r = hp.touch_sum(hist).first()
    assert r["n_rows"] == N
    assert r["ts_sum"] > 0 and r["count_sum"] > 0
    assert r["tag_chars_sum"] > 0


def test_row_pack_blobs_byte_identical_to_reference_format(spark, hist):
    """The vectorized pack must emit byte-for-byte what the per-row
    struct.pack formulation (kept as the format spec: _pack_i64 /
    _pack_nullable) would."""
    import struct

    packed = {tuple(hp.unpack_blob(r["blob"])[0].tolist()): bytes(r["blob"])
              for r in hp.pack_rows(hist).collect()}
    for s in hist.select("ts", "count", "sumsLong", "sumsDouble").collect():
        sl = s["sumsLong"] or []
        sd = s["sumsDouble"] or []
        ref = (struct.pack("<B", hp._PACK_MAGIC)
               + hp._pack_i64(np.asarray(s["ts"], dtype=np.int64))
               + hp._pack_i64(np.asarray(s["count"], dtype=np.int64))
               + hp._pack_nullable(
                   np.array([x if x is not None else 0 for x in sl], np.int64),
                   np.array([x is not None for x in sl], bool), "<i8")
               + hp._pack_nullable(
                   np.array([x if x is not None else 0.0 for x in sd], np.float64),
                   np.array([x is not None for x in sd], bool), "<f8"))
        assert packed[tuple(s["ts"])] == ref


def test_row_pack_mapper_has_no_per_row_python():
    """Guard: the pack_rows hot path must stay vectorized."""
    import inspect

    src = inspect.getsource(hp.pack_rows)
    assert "for i in range" not in src
    assert "to_pydict" not in src


def test_row_pack_roundtrip_preserves_nulls(spark, hist):
    packed = hp.pack_rows(hist)
    rows = packed.collect()
    assert len(rows) == N
    src = hist.select("ts", "count", "sumsLong", "sumsDouble").collect()
    # row_id order matches monotonically_increasing_id generation order
    # only within a partition; compare as multisets keyed by ts content
    by_ts = {tuple(r["ts"]): r for r in src}
    n_null_checked = 0
    for p in rows:
        ts, cnt, sl, sd = hp.unpack_blob(p["blob"])
        key = tuple(ts.tolist())
        assert key in by_ts
        s = by_ts[key]
        assert cnt.tolist() == s["count"]
        assert sl == s["sumsLong"]   # None elements preserved exactly
        assert sd == s["sumsDouble"]
        n_null_checked += sum(1 for x in s["sumsLong"] if x is None)
    assert n_null_checked > 0  # the reference's lossy-drop bug is NOT present
