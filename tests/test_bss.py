"""Float64 BSS codec: kernel sweeps + Spark operator round-trip."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_playground_rs_spark.functions import kernels

rng = np.random.default_rng(7)

EDGE_F64 = {
    "empty": (np.array([], dtype="<f8"), None),
    "single": (np.array([3.25]), None),
    "nan_inf": (np.array([np.nan, np.inf, -np.inf, 0.0, -0.0]), None),
    "denormal": (np.array([5e-324, -5e-324, 1.7976931348623157e308]), None),
    "with_nulls": (np.array([1.5, 0.0, 2.5, 0.0]),
                   np.array([True, False, True, False])),
    "all_null": (np.zeros(9), np.zeros(9, dtype=bool)),
    "nan_valid_next_to_null": (np.array([np.nan, 0.0, np.nan]),
                               np.array([True, False, True])),
    "long_random": (rng.standard_normal(10_000), None),
    "long_with_nulls": (rng.standard_normal(777),
                        rng.integers(0, 2, 777).astype(bool)),
}


@pytest.mark.parametrize("name", list(EDGE_F64))
def test_bss_kernel_roundtrip(name):
    vals, mask = EDGE_F64[name]
    blob = kernels.encode_bss(vals, mask)
    got_vals, got_mask = kernels.decode_bss(blob)
    exp_mask = np.ones(vals.size, dtype=bool) if mask is None else mask
    np.testing.assert_array_equal(got_mask, exp_mask)
    # bit-exact comparison (covers NaN payloads, -0.0, denormals)
    exp_vals = np.where(exp_mask, vals, 0.0)
    np.testing.assert_array_equal(
        got_vals.view(np.uint64), np.asarray(exp_vals, dtype="<f8").view(np.uint64),
        err_msg=name)


def test_bss_rejects_wrong_blob():
    with pytest.raises(ValueError):
        kernels.decode_bss(kernels.encode_plain(np.array([1], dtype=np.int32)))


def test_bss_plane_layout():
    """Plane 7 (sign/exponent high byte) of equal-sign same-scale doubles
    must be constant — the compressibility property BSS exists for."""
    vals = np.linspace(1.0, 2.0, 64, endpoint=False)  # all in [1,2): one exponent
    blob = kernels.encode_bss(vals)
    n = 64
    nb = (n + 7) // 8
    planes = np.frombuffer(blob, dtype=np.uint8, offset=5 + nb).reshape(8, n)
    assert np.unique(planes[7]).size == 1


def _mk_histograms(spark, n):
    from parquet_playground_rs_spark.sources.histograms import histograms_df
    return histograms_df(spark, n, n_tags=3, n_points=40, seed=11)


def test_spark_bss_roundtrip(spark):
    from parquet_playground_rs_spark.operators import doubles as D

    hist = _mk_histograms(spark, 200).withColumn(
        "rid", F.monotonically_increasing_id()).cache()
    enc = D.encode_doubles_bss(hist, col="sumsDouble", id_col="rid")
    dec = D.decode_doubles_bss(enc)
    src = hist.select(F.col("rid").alias("row_id"),
                      F.col("sumsDouble").alias("orig"))
    joined = dec.join(src, "row_id")
    n = joined.count()
    assert n == 200
    bad = joined.filter(
        ~((F.col("vals").isNull() & F.col("orig").isNull())
          | (F.col("vals") == F.col("orig")))
    ).count()
    assert bad == 0
    # null elements preserved
    nulls = hist.select(
        F.sum(F.size(F.filter("sumsDouble", lambda x: x.isNull())))).first()[0]
    enc_nulls = enc.agg(F.sum("n_nulls")).first()[0]
    assert nulls == enc_nulls > 0


def test_spark_bss_special_values(spark):
    from parquet_playground_rs_spark.operators import doubles as D

    rows = [
        (0, [float("nan"), float("inf"), float("-inf"), -0.0]),
        (1, []),
        (2, None),
        (3, [None, 1.5, None]),
        (4, [5e-324]),
    ]
    df = spark.createDataFrame(rows, "rid long, sumsDouble array<double>")
    enc = D.encode_doubles_bss(df, id_col="rid")
    out = {r["row_id"]: r["vals"] for r in D.decode_doubles_bss(enc).collect()}
    assert [math.isnan(out[0][0]), out[0][1], out[0][2], out[0][3]] == \
        [True, float("inf"), float("-inf"), -0.0]
    assert math.copysign(1.0, out[0][3]) == -1.0  # -0.0 sign preserved
    assert out[1] == [] and out[2] == []  # null row coalesced to empty
    assert out[3] == [None, 1.5, None]
    assert out[4] == [5e-324]


def test_bss_size_probe_reports(spark):
    from parquet_playground_rs_spark.operators import doubles as D

    hist = _mk_histograms(spark, 300)
    row = D.bss_size_probe(hist, "sumsDouble").first()
    assert row["n_rows"] == 300
    assert row["raw_bytes"] == row["n_vals"] * 8
    assert row["raw_deflate"] > 0 and row["bss_deflate"] > 0


def test_bss_wins_on_smooth_series(spark):
    """The shape BSS exists for (the reference's cumulative sums,
    gen_synthetic_data.py:219-236): distinct values sharing exponent and
    high-mantissa structure. On the histogram table's linear ramps it's
    ~neutral; on verbatim-repeating values raw LZ matches win — which is
    exactly why this engine treats BSS as a selectable codec rather than
    forcing it like the reference does."""
    from parquet_playground_rs_spark.operators import doubles as D

    rng2 = np.random.default_rng(3)
    rows = [(i, (np.cumsum(rng2.standard_normal(200)) * 0.01 + 100).tolist())
            for i in range(60)]
    df = spark.createDataFrame(rows, "rid long, vals array<double>")
    row = D.bss_size_probe(df, "vals").first()
    assert row["bss_deflate"] < row["raw_deflate"] * 0.9, \
        (row["bss_deflate"], row["raw_deflate"])


def test_encode_bss_batch_sliced_list_array():
    """ADVICE r2: a sliced ListArray (offsets[0] != 0) must be normalized
    to a 0-based frame so the validity bitmap / n_valid cumsum and the
    plane gather address the same rows. Blobs must stay byte-identical to
    the per-row kernel."""
    import pyarrow as pa

    from parquet_playground_rs_spark.operators.doubles import (
        _encode_bss_batch, _list_f64_parts)

    rows = [[1.5, None, 3.25], [], [2.0], [None, None], [7.0, 8.0, None]]
    arr = pa.array(rows, type=pa.list_(pa.float64()))
    sl = arr.slice(2, 3)
    vals, valid, offsets = _list_f64_parts(sl)
    assert offsets[0] == 0 and int(offsets[-1]) == 6 == vals.size == valid.size
    data, boff = _encode_bss_batch(vals, valid, offsets)
    for i, row in enumerate(rows[2:5]):
        v = np.array([0.0 if x is None else x for x in row], dtype="<f8")
        m = np.array([x is not None for x in row], dtype=bool)
        expect = kernels.encode_bss(v, m)
        assert data[boff[i]:boff[i + 1]].tobytes() == expect, f"row {i}"


def test_bss_batch_decode_rejects_undecodable():
    """r3: same fail-loudly contract as the token batch decoder."""
    import pyarrow as pa
    import pytest as _pytest

    from parquet_playground_rs_spark.operators.doubles import _decode_bss_batch

    good = kernels.encode_bss(np.array([1.5, 2.5]))

    def run(blobs):
        offs = np.cumsum([0] + [len(b) for b in blobs]).astype(np.int64)
        data = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        return _decode_bss_batch(data, offs)

    with _pytest.raises(ValueError, match="truncated"):
        run([good, b"\x07\x00"])
    with _pytest.raises(ValueError, match="non-bss"):
        run([good, kernels.encode_plain(np.array([1], dtype=np.int32))])
    # empty-array blobs stay decodable
    vals, valid, offsets = run([good, kernels.encode_bss(np.empty(0))])
    assert offsets.tolist() == [0, 2, 2]
