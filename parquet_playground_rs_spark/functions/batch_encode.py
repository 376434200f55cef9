"""Whole-batch vectorized encode: zero per-row Python in the hot path.

Replaces the per-row ``selector.encode_auto`` loop with segmented numpy over
the entire Arrow batch (values + offsets), the way a columnar engine treats
a page of arrays:

1. segmented stats (min/max/runs/delta-range) via ``np.*.reduceat`` /
   boundary-corrected global diffs — one numpy call per statistic per batch;
2. codec choice for all rows at once from closed-form size formulas
   (same math as selector.predicted_sizes);
3. group rows by (codec, bit-width) and bit-pack each group in ONE
   ``np.packbits`` scatter — rows are byte-aligned inside the group buffer
   so per-row blobs are just slices;
4. blob assembly = per-row header + slice concatenation (tiny constant
   cost, no numpy per row).

Output blobs use the same self-describing format as functions/kernels.py —
``kernels.decode`` reads them unchanged; that equivalence is the test gate
(tests/test_batch_encode.py).

Dictionary codec note: exact per-row cardinality is the one stat without a
cheap segmented form. It only changes the outcome for "few distinct values
spread over a wide range" rows, detected here by a vectorized 8-point probe
(all probes equal + wide width) -> those rare rows take the per-row dict/
fallback path. Everything else never calls np.unique.
"""

from __future__ import annotations

import struct

import numpy as np

from . import kernels, selector
from .kernels import CODEC_IDS

HEADER = selector.HEADER  # codec byte + u32 n


def _bits_needed_arr(span: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for non-negative int64 values."""
    out = np.zeros(span.shape, dtype=np.int64)
    nz = span > 0
    # log2 is exact enough below 2^53; span <= 2^33 here
    out[nz] = np.floor(np.log2(span[nz].astype(np.float64))).astype(np.int64) + 1
    return out


def batch_stats(values: np.ndarray, offsets: np.ndarray) -> dict[str, np.ndarray]:
    """Per-row stats for all rows of a batch, no per-row Python.

    values: int32[N] concatenated tokens; offsets: int64[n+1] row bounds.
    Returns arrays of shape [n]: n_tok, min, max, n_runs, dmin, dmax
    (delta min/max exact, row-boundary-corrected).

    Single pass over the token stream: min/max reduceat directly on int32,
    ONE shared int64 diff (dtype-parameterized subtract, no full-stream
    astype) reused for run counting and delta ranges, boundary diffs
    neutralized in place. Memory traffic per token ~28 bytes; the previous
    formulation (two diffs + two copies + int64 casts) moved ~90.
    """
    starts = offsets[:-1]
    ends = offsets[1:]
    n_tok = ends - starts
    nonempty = n_tok > 0
    n = starts.size

    mins = np.zeros(n, dtype=np.int64)
    maxs = np.zeros(n, dtype=np.int64)
    if values.size:
        ne_starts = starts[nonempty]
        mins[nonempty] = np.minimum.reduceat(values, ne_starts)
        maxs[nonempty] = np.maximum.reduceat(values, ne_starts)

    n_runs = nonempty.astype(np.int64)
    dmin = np.zeros(n, dtype=np.int64)
    dmax = np.zeros(n, dtype=np.int64)
    multi = n_tok > 1
    if values.size > 1 and multi.any():
        # d[k] = v[k+1]-v[k] in int64 (int32 deltas span up to 2^33)
        d = np.subtract(values[1:], values[:-1], dtype=np.int64)
        m_starts = starts[multi]
        m_ends = ends[multi]
        # run count: cumsum over change flags; changes within row i are
        # chg[d[start .. end-2]] = C[end-2] - C[start-1]
        csum = np.cumsum(d != 0, dtype=np.int64)
        hi = csum[m_ends - 2]
        lo = np.where(m_starts > 0, csum[np.maximum(m_starts, 1) - 1], 0)
        n_runs[multi] = 1 + hi - lo
        # delta ranges: neutralize inter-row boundary diffs (positions
        # ends[i]-1) in place — d is not used after this
        bpos = ends[:-1] - 1
        bpos = bpos[(bpos >= 0) & (bpos < d.size)]
        d[bpos] = np.iinfo(np.int64).max
        dmin[multi] = np.minimum.reduceat(d, m_starts)
        d[bpos] = np.iinfo(np.int64).min
        dmax[multi] = np.maximum.reduceat(d, m_starts)
    return {"n_tok": n_tok, "min": mins, "max": maxs, "n_runs": n_runs,
            "dmin": dmin, "dmax": dmax}


# Back-compat alias: the segmented stats ARE the batch stats now.
segmented_stats = batch_stats


def choose_codecs(s: dict[str, np.ndarray]) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    """Vectorized codec choice; returns (codec_id array, per-codec sizes)."""
    n_tok = s["n_tok"]
    bw = _bits_needed_arr(s["max"] - s["min"])
    dbw = _bits_needed_arr(s["dmax"] - s["dmin"])
    r = s["n_runs"]
    lbw = _bits_needed_arr(n_tok)  # run-length width upper bound

    packed = lambda n, w: 13 + (n * w + 7) // 8  # noqa: E731
    size_plain = HEADER + 4 * n_tok
    size_bitpack = HEADER + packed(n_tok, bw)
    size_fordelta = np.where(
        n_tok > 0, HEADER + 8 + packed(np.maximum(n_tok - 1, 0), dbw), size_plain
    )
    size_rle = HEADER + packed(r, bw) + packed(r, lbw)

    sizes = np.stack([size_plain, size_bitpack, size_fordelta, size_rle])
    order = np.array([CODEC_IDS["plain"], CODEC_IDS["bitpack"],
                      CODEC_IDS["fordelta"], CODEC_IDS["rle"]])
    # argmin keeps the first (plain) on ties -> safe fallback bias
    best = order[np.argmin(sizes, axis=0)]
    best = np.where(n_tok == 0, CODEC_IDS["plain"], best)
    return best, {
        "bw": bw, "dbw": dbw, "lbw": lbw,
        "best_size": sizes.min(axis=0),
        "size_plain": size_plain,
    }


def _dict_probe(values: np.ndarray, offsets: np.ndarray,
                rows: np.ndarray, max_distinct: int = 5) -> np.ndarray:
    """Vectorized 8-point sample probe: True where a row looks
    low-cardinality (few distinct values among the samples)."""
    if rows.size == 0:
        return np.zeros(0, dtype=bool)
    starts = offsets[rows]
    lens = offsets[rows + 1] - starts
    k = 8
    frac = (np.arange(k) / k)
    idx = (starts[:, None] + (lens[:, None] * frac).astype(np.int64))
    probes = values[idx]  # [rows, k]
    srt = np.sort(probes, axis=1)
    distinct = 1 + np.count_nonzero(np.diff(srt, axis=1), axis=1)
    return distinct <= max_distinct


def segmented_dict(values: np.ndarray, offsets: np.ndarray,
                   rows: np.ndarray):
    """Vectorized per-row dictionary encode for a subset of rows.

    One global lexsort replaces per-row np.unique: within each selected row
    the values are sorted, group boundaries mark uniques, dense ranks become
    the codes, scattered back to original positions.

    Returns (uniq_vals i32 concat, u_per_row, codes i64 concat in original
    order, code_width per row).
    """
    v = values
    starts = offsets[rows]
    lens = (offsets[rows + 1] - starts).astype(np.int64)
    k = rows.size
    total = int(lens.sum())
    row_ids = np.repeat(np.arange(k), lens)
    row_pref = np.concatenate(([0], np.cumsum(lens)))[:-1]
    sel = v[np.arange(total) + np.repeat(starts - row_pref, lens)]
    order = np.lexsort((sel, row_ids))
    sv = sel[order]
    sr = row_ids[order]
    newgrp = np.ones(total, dtype=bool)
    if total > 1:
        newgrp[1:] = (sv[1:] != sv[:-1]) | (sr[1:] != sr[:-1])
    uniq_vals = sv[newgrp]
    uniq_rows = sr[newgrp]
    u_per_row = np.bincount(uniq_rows, minlength=k).astype(np.int64)
    rank = np.cumsum(newgrp) - 1
    base = np.concatenate(([0], np.cumsum(u_per_row)))[:-1]
    codes_sorted = rank - base[sr]
    codes = np.empty(total, dtype=np.int64)
    codes[order] = codes_sorted
    width = _bits_needed_arr(np.maximum(u_per_row - 1, 0))
    return uniq_vals.astype(np.int32), u_per_row, codes, width, lens


def _group_pack(rel: np.ndarray, row_lens: np.ndarray, width: int) -> tuple[bytes, np.ndarray]:
    """Bit-pack concatenated relative values of several rows with one shared
    width; each row starts byte-aligned. Returns (buffer, per-row byte size,
    per-row byte offset).

    Layout is the little-endian bitstream (identical to
    ``np.packbits(bitorder="little")`` over per-value bit columns), but
    packed word-wise: every 8 values map to exactly ``width`` output bytes,
    built with 8 shift-or passes — ~15 bytes of memory traffic per value
    instead of the ~8*width a bit-matrix costs. That traffic is the measured
    scaling bottleneck on shared-memory hosts (BENCH/BASELINE.md).
    """
    nbytes = (row_lens * width + 7) // 8
    if width == 0:
        return b"", nbytes, np.zeros(row_lens.size, dtype=np.int64)
    # pad every row to a multiple of 8 values: row regions become
    # byte-aligned (pad_len*width bits % 8 == 0), so per-row slices sit at
    # byte offsets — no bit scatter.
    pad_lens = (row_lens + 7) // 8 * 8
    total_pad = int(pad_lens.sum())
    rel_pad = np.zeros(total_pad, dtype=np.uint64)
    gaps = np.concatenate(([0], np.cumsum(pad_lens - row_lens)))[:-1]
    rel_pad[np.arange(rel.size) + np.repeat(gaps, row_lens)] = rel.astype(
        np.uint64, copy=False)
    k = total_pad // 8
    grp = rel_pad.reshape(k, 8)
    out = np.zeros((k, width), dtype=np.uint8)
    for i in range(8):
        # value i of each group occupies stream bits [i*w, (i+1)*w)
        byte0, shift = divmod(i * width, 8)
        nb = (width + shift + 7) // 8  # <= 8 while width <= 57
        t = (grp[:, i] << np.uint64(shift)).astype("<u8", copy=False)
        out[:, byte0:byte0 + nb] |= t.view(np.uint8).reshape(k, 8)[:, :nb]
    pad_starts = np.concatenate(([0], np.cumsum(pad_lens)))[:-1]
    # row i's payload = packed[pad_starts[i]*w/8 : +nbytes[i]]
    pad_byte_off = pad_starts * width // 8
    return out.reshape(-1).tobytes(), nbytes, pad_byte_off


def encode_batch(values: np.ndarray, offsets: np.ndarray,
                 enable_fsst: bool = True):
    """Encode every row of a batch. Returns (blobs list[bytes], codec ids
    int8[n], stats dict of arrays).

    Hot path is fully vectorized; only rare probe-flagged rows (wide-range
    low-cardinality) fall back to the per-row selector.
    """
    values = kernels.as_int32(values)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = offsets.size - 1
    s = batch_stats(values, offsets)
    codec_ids, aux = choose_codecs(s)

    # dict candidacy: probe-flagged low-cardinality rows get an exact
    # segmented dictionary pass; dict wins where its size beats the current
    # choice. Gate: dict can only pay when code width could undercut bw.
    dict_rows = np.zeros(0, dtype=np.int64)
    dict_parts: dict[int, bytes] = {}
    # dict can only beat bitpack when code width (<=~4 bits for probe-
    # positive rows) undercuts bw by enough to pay the dictionary itself
    gate = np.flatnonzero((s["n_tok"] >= 32) & (aux["bw"] >= 6))
    if gate.size:
        gate = gate[_dict_probe(values, offsets, gate)]
    if gate.size:
        uniq_vals, u_per_row, codes, cw, lens = segmented_dict(values, offsets, gate)
        dict_sizes = (HEADER + 4 + 4 * u_per_row
                      + 13 + (lens * cw + 7) // 8)
        wins = dict_sizes < aux["best_size"][gate]
        dict_rows = gate[wins]
        if dict_rows.size:
            # group-pack the winning rows' codes by width
            uoff = np.concatenate(([0], np.cumsum(u_per_row)))
            coff = np.concatenate(([0], np.cumsum(lens)))
            win_idx = np.flatnonzero(wins)
            for w in np.unique(cw[win_idx]):
                sub = win_idx[cw[win_idx] == w]
                sub_codes = np.concatenate([codes[coff[j]: coff[j + 1]] for j in sub])
                buf, nbytes, boff = _group_pack(
                    sub_codes.astype(np.uint64), lens[sub], int(w))
                for bi, j in enumerate(sub):
                    i = int(gate[j])
                    head = (struct.pack("<BI", CODEC_IDS["dict"], int(lens[j]))
                            + struct.pack("<I", int(u_per_row[j]))
                            + uniq_vals[uoff[j]: uoff[j + 1]].tobytes()
                            + struct.pack("<IqB", int(lens[j]), 0, int(w)))
                    dict_parts[i] = head + buf[boff[bi]: boff[bi] + nbytes[bi]]
    dict_set = set(dict_rows.tolist())

    # fsst candidates: rows still near-incompressible after the lightweight
    # codecs; they first get their group blob, then an fsst trial may
    # replace it (below) — no per-row stats recomputation
    still_bad = [int(i) for i in np.flatnonzero(aux["best_size"] > 3 * s["n_tok"])
                 if int(i) not in dict_set and s["n_tok"][i] >= 64] \
        if enable_fsst else []
    per_row_fallback = set()

    v64 = values.astype(np.int64, copy=False)
    starts, ends = offsets[:-1], offsets[1:]
    blob_parts: list[bytes | None] = [None] * n

    # ---- group bodies by codec ------------------------------------------
    cid = codec_ids
    PLAIN, BITPACK, FORDELTA, RLE = (CODEC_IDS["plain"], CODEC_IDS["bitpack"],
                                     CODEC_IDS["fordelta"], CODEC_IDS["rle"])

    skip = per_row_fallback | dict_set

    # plain rows: slice raw bytes
    plain_rows = np.flatnonzero(cid == PLAIN)
    raw = values.view(np.uint8)
    for i in plain_rows:
        if i in skip:
            continue
        blob_parts[i] = (struct.pack("<BI", PLAIN, int(s["n_tok"][i]))
                         + raw[starts[i] * 4: ends[i] * 4].tobytes())

    # bitpack rows, grouped by width
    bp_rows = np.flatnonzero(cid == BITPACK)
    if skip:
        bp_rows = bp_rows[[int(i) not in skip for i in bp_rows]]
    if bp_rows.size:
        w_arr = aux["bw"][bp_rows]
        for w in np.unique(w_arr):
            grp = bp_rows[w_arr == w]
            lens = s["n_tok"][grp]
            sel = _concat_rows(v64, starts[grp], lens)
            rel = (sel - np.repeat(s["min"][grp], lens)).astype(np.uint64)
            buf, nbytes, boff = _group_pack(rel, lens, int(w))
            for gi, i in enumerate(grp):
                head = struct.pack("<BI", BITPACK, int(lens[gi])) + struct.pack(
                    "<IqB", int(lens[gi]), int(s["min"][i]), int(w))
                blob_parts[i] = head + buf[boff[gi]: boff[gi] + nbytes[gi]]

    # fordelta rows, grouped by delta width
    fd_rows = np.flatnonzero(cid == FORDELTA)
    if skip:
        fd_rows = fd_rows[[int(i) not in skip for i in fd_rows]]
    if fd_rows.size:
        w_arr = aux["dbw"][fd_rows]
        for w in np.unique(w_arr):
            grp = fd_rows[w_arr == w]
            lens = s["n_tok"][grp]
            dl = lens - 1
            # deltas per row
            sel = _concat_rows(v64, starts[grp], lens)
            ro = np.concatenate(([0], np.cumsum(lens)))
            d_all = np.diff(sel)
            keep = np.ones(d_all.size, dtype=bool)
            keep[ro[1:-1] - 1] = False  # drop inter-row diffs
            deltas = d_all[keep]
            rel = (deltas - np.repeat(s["dmin"][grp], dl)).astype(np.uint64)
            buf, nbytes, boff = _group_pack(rel, dl, int(w))
            firsts = v64[starts[grp]]
            for gi, i in enumerate(grp):
                head = (struct.pack("<BI", FORDELTA, int(lens[gi]))
                        + struct.pack("<q", int(firsts[gi]))
                        + struct.pack("<IqB", int(dl[gi]), int(s["dmin"][i]), int(w)))
                blob_parts[i] = head + buf[boff[gi]: boff[gi] + nbytes[gi]]

    # rle rows: global run extraction + two independent group-packs
    rle_rows = np.flatnonzero(cid == RLE)
    if skip:
        rle_rows = rle_rows[[int(i) not in skip for i in rle_rows]]
    if rle_rows.size:
        lens = s["n_tok"][rle_rows]
        sel = _concat_rows(v64, starts[rle_rows], lens)
        total = sel.size
        row_firsts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        is_start = np.zeros(total, dtype=bool)
        is_start[row_firsts] = True
        if total > 1:
            is_start[1:] |= sel[1:] != sel[:-1]
        start_pos = np.flatnonzero(is_start)
        run_vals = sel[start_pos]
        run_lens = np.diff(np.concatenate((start_pos, [total])))
        # runs per row (row boundaries always start runs -> contiguous)
        runs_per_row = s["n_runs"][rle_rows]
        row_run_off = np.concatenate(([0], np.cumsum(runs_per_row)))
        # per-row length ref/width
        lmin = np.minimum.reduceat(run_lens, row_run_off[:-1])
        lmax = np.maximum.reduceat(run_lens, row_run_off[:-1])
        vw = aux["bw"][rle_rows]
        lw = _bits_needed_arr(lmax - lmin)
        # pack run values (ref = row min) grouped by vw
        vbufs: dict[int, tuple] = {}
        for w in np.unique(vw):
            g = np.flatnonzero(vw == w)
            gv = np.concatenate([run_vals[row_run_off[j]: row_run_off[j + 1]] for j in g]) \
                if g.size else np.empty(0, np.int64)
            rel = (gv - np.repeat(s["min"][rle_rows[g]], runs_per_row[g])).astype(np.uint64)
            vbufs[int(w)] = (g, *_group_pack(rel, runs_per_row[g], int(w)))
        lbufs: dict[int, tuple] = {}
        for w in np.unique(lw):
            g = np.flatnonzero(lw == w)
            gl = np.concatenate([run_lens[row_run_off[j]: row_run_off[j + 1]] for j in g]) \
                if g.size else np.empty(0, np.int64)
            rel = (gl - np.repeat(lmin[g], runs_per_row[g])).astype(np.uint64)
            lbufs[int(w)] = (g, *_group_pack(rel, runs_per_row[g], int(w)))
        # per-row slice indices into the group buffers
        vslice: dict[int, bytes] = {}
        for w, (g, buf, nb, boff) in vbufs.items():
            for gi, j in enumerate(g):
                vslice[int(j)] = (struct.pack(
                    "<IqB", int(runs_per_row[j]), int(s["min"][rle_rows[j]]), w)
                    + buf[boff[gi]: boff[gi] + nb[gi]])
        lslice: dict[int, bytes] = {}
        for w, (g, buf, nb, boff) in lbufs.items():
            for gi, j in enumerate(g):
                lslice[int(j)] = (struct.pack(
                    "<IqB", int(runs_per_row[j]), int(lmin[j]), w)
                    + buf[boff[gi]: boff[gi] + nb[gi]])
        for j, i in enumerate(rle_rows):
            blob_parts[i] = (struct.pack("<BI", RLE, int(lens[j]))
                             + vslice[j] + lslice[j])

    # dict rows: bodies already group-packed above
    for i, b in dict_parts.items():
        blob_parts[i] = b
        codec_ids[i] = CODEC_IDS["dict"]

    # fsst trial on near-incompressible rows: replace only when smaller
    for i in still_bad:
        row = values[starts[i]: ends[i]]
        if selector.estimate_fsst(row) < len(blob_parts[i]):
            trial = kernels.encode_fsst(row)
            if len(trial) < len(blob_parts[i]):
                blob_parts[i] = trial
                codec_ids[i] = CODEC_IDS["fsst"]

    # size guard: plain is never beaten by a larger "compressed" blob
    for i in range(n):
        b = blob_parts[i]
        limit = HEADER + 4 * int(s["n_tok"][i])
        if len(b) > limit:
            blob_parts[i] = (struct.pack("<BI", PLAIN, int(s["n_tok"][i]))
                             + raw[starts[i] * 4: ends[i] * 4].tobytes())
            codec_ids[i] = PLAIN

    return blob_parts, codec_ids, s, aux


def _concat_rows(v64: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Gather a group's rows into one contiguous array (vectorized take)."""
    total = int(lens.sum())
    row_pref = np.concatenate(([0], np.cumsum(lens)))[:-1]
    idx = np.arange(total) + np.repeat(starts - row_pref, lens)
    return v64[idx]
