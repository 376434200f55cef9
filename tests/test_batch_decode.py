"""Vectorized batch decode == per-row kernel decode, bit for bit."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_playground_rs_spark.functions import batch_decode, batch_encode, kernels
from tests.test_batch_encode import make_batch
from tests.test_kernels import EDGE_ARRAYS

rng = np.random.default_rng(7)


def roundtrip(arrays):
    values, offsets = make_batch(arrays)
    blobs, cids, _, _ = batch_encode.encode_batch(values, offsets)
    blocks = pa.array([bytes(b) for b in blobs], type=pa.binary())
    out_vals, out_offs = batch_decode.decode_binary_array(blocks)
    assert out_offs[-1] == sum(a.size for a in arrays)
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(out_vals[out_offs[i]: out_offs[i + 1]], a)


def test_edge_arrays():
    roundtrip(list(EDGE_ARRAYS.values()))


def test_per_codec_forced_blobs():
    """Blobs produced by the per-row kernels (all six codecs) decode too."""
    arrays, blobs = [], []
    for name, arr in EDGE_ARRAYS.items():
        for codec in kernels.TOKEN_CODECS:
            arrays.append(arr)
            blobs.append(kernels.encode(arr, codec))
    blocks = pa.array(blobs, type=pa.binary())
    out_vals, out_offs = batch_decode.decode_binary_array(blocks)
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(out_vals[out_offs[i]: out_offs[i + 1]], a)


def test_random_batches():
    for trial in range(4):
        arrays = []
        for _ in range(300):
            kind = rng.integers(0, 6)
            n = int(rng.integers(0, 200))
            if kind == 0:
                a = np.full(n, 7, dtype=np.int32)
            elif kind == 1:
                a = rng.integers(0, 16, n).astype(np.int32)
            elif kind == 2:
                a = np.cumsum(rng.integers(0, 9, n)).astype(np.int32)
            elif kind == 3:
                a = rng.integers(-(2**31), 2**31 - 1, n, dtype=np.int64).astype(np.int32)
            elif kind == 4:
                a = (rng.integers(0, 4, n) * 999_999_937 % (2**31)).astype(np.int32)
            else:
                a = np.repeat(rng.integers(0, 3, max(n // 7, 1)), 7)[:n].astype(np.int32)
            arrays.append(a)
        roundtrip(arrays)


def test_sliced_binary_array():
    """Decode must honor pyarrow array offsets (sliced input)."""
    arrays = [np.arange(50, dtype=np.int32), np.full(30, 5, np.int32),
              np.array([], np.int32), np.arange(100, 0, -1).astype(np.int32)]
    values, offsets = make_batch(arrays)
    blobs, _, _, _ = batch_encode.encode_batch(values, offsets)
    blocks = pa.array([bytes(b) for b in blobs], type=pa.binary())
    sl = blocks.slice(1, 2)
    out_vals, out_offs = batch_decode.decode_binary_array(sl)
    np.testing.assert_array_equal(out_vals[out_offs[0]: out_offs[1]], arrays[1])
    np.testing.assert_array_equal(out_vals[out_offs[1]: out_offs[2]], arrays[2])


def test_faster_than_per_row():
    import time
    arrays = []
    for _ in range(3000):
        n = int(rng.integers(64, 512))
        arrays.append(np.cumsum(rng.integers(0, 37, n)).astype(np.int32))
    values, offsets = make_batch(arrays)
    blobs, _, _, _ = batch_encode.encode_batch(values, offsets)
    blocks = pa.array([bytes(b) for b in blobs], type=pa.binary())
    batch_decode.decode_binary_array(blocks)  # warm
    t_batch = t_row = 1e9
    for _ in range(7):  # best-of-7: the CI box is noisy (shared hypervisor)
        t0 = time.perf_counter()
        batch_decode.decode_binary_array(blocks)
        t_batch = min(t_batch, time.perf_counter() - t0)
        t0 = time.perf_counter()
        for b in blobs:
            kernels.decode(b)
        t_row = min(t_row, time.perf_counter() - t0)
    # generous margin: this guards against a pathological regression (batch
    # path degenerating to per-row), not micro-speedups; host noise is 3x.
    assert t_batch < t_row * 2.0, (t_batch, t_row)


def test_fsst_group_decode_both_hybrid_sides():
    """r3: FSST batch decode is a measured hybrid — short rows through the
    vectorized group path, long rows through the per-row kernel. Both
    sides and the boundary must match the reference kernel decoder,
    including multi-round blobs, odd-length code streams (tail bytes), and
    extreme values."""
    import pyarrow as pa

    from parquet_playground_rs_spark.functions import batch_decode as bd

    rng2 = np.random.default_rng(31)
    rows = []
    for n in (1, 3, 17, 100, bd.FSST_GROUP_MAX_TOKENS,
              bd.FSST_GROUP_MAX_TOKENS + 1, 900, 5000):
        rows.append((rng2.zipf(1.3, n) % 500).astype(np.int32))
    rows.append(np.array([2**31 - 1, -(2**31), 0, -1], np.int32))
    rows.append(np.full(40, 7, np.int32))
    blobs = []
    for mr in (1, 2, 3):
        blobs += [kernels.encode_fsst(r, max_rounds=mr) for r in rows]
    expected = [kernels.decode(b) for b in blobs]
    vals, offs = bd.decode_binary_array(pa.array(blobs, type=pa.binary()))
    for i, e in enumerate(expected):
        np.testing.assert_array_equal(vals[offs[i]:offs[i + 1]], e,
                                      err_msg=f"blob {i}")


def test_batch_decode_rejects_undecodable_input():
    """r3: rows no codec branch claims must raise, never ship
    uninitialized output bytes."""
    import pyarrow as pa
    import pytest

    from parquet_playground_rs_spark.functions import batch_decode as bd

    good = kernels.encode_bitpack(np.arange(10, dtype=np.int32))
    with pytest.raises(ValueError, match="unknown codec"):
        bd.decode_binary_array(
            pa.array([good, b"\xee" + good[1:]], type=pa.binary()))
    with pytest.raises(ValueError, match="truncated"):
        bd.decode_binary_array(pa.array([good, b"\x01\x02"], type=pa.binary()))
    with pytest.raises(ValueError, match="null"):
        bd.decode_binary_array(pa.array([good, None], type=pa.binary()))
    # bss blobs belong to the doubles column, not the token table
    with pytest.raises(ValueError, match="unknown codec"):
        bd.decode_binary_array(pa.array(
            [kernels.encode_bss(np.array([1.0]))], type=pa.binary()))


def test_fsst_group_rejects_mixed_round_cohort():
    """_decode_fsst_group's cohort contract (round-5): mixed round counts
    must be rejected loudly — decode_binary_array groups rows by round
    count before calling, and the mixed-round merged-arena handling was
    deleted as dead code."""
    import numpy as np
    import pytest

    from parquet_playground_rs_spark.functions import batch_decode, kernels

    rng = np.random.default_rng(5)
    # few distinct symbols + long rows => multi-round FSST; short row with
    # fewer rounds to force a mixed cohort
    deep = rng.integers(0, 4, 3000).astype(np.int32)
    shallow = rng.integers(0, 4, 40).astype(np.int32)
    blobs = [kernels.encode_fsst(deep), kernels.encode_fsst(shallow)]
    d = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    starts = np.array([0, len(blobs[0])], dtype=np.int64)
    rounds = {int(d[s + 9]) for s in starts}
    if len(rounds) < 2:
        pytest.skip("corpus did not produce distinct round counts")
    with pytest.raises(AssertionError, match="uniform same-round-count"):
        batch_decode._decode_fsst_group(d, starts)
    # each uniform singleton still decodes exactly
    out0 = batch_decode._decode_fsst_group(d, starts[:1])
    assert np.array_equal(out0, deep)
