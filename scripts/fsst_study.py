#!/usr/bin/env python3
"""FSST upgrade study (VERDICT r1 item 6).

Question: would variable-length (2..8-gram) FSST symbols win often enough
on this engine's block mix to justify the decoder complexity?

Method: over three corpora (synthetic generator blocks, tokenized sf
documents, a Zipfian large-vocab stress corpus), for every encode block
compute
  - the engine's current best lightweight size (plain/bitpack/fordelta/
    rle/dict via the closed forms),
  - the actual fsst2 (current 2-gram) blob size,
  - an OPTIMISTIC lower bound for fsst-vl: recursive re-pair rounds on the
    code stream (2-gram -> 4-gram -> 8-gram), each round charging only the
    table bytes and assuming perfect escape-free coding — i.e. a real
    implementation can only be worse.
Report the fraction of blocks each variant would win.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parquet_playground_rs_spark.functions import kernels, selector  # noqa: E402


def optimistic_repair_size(tokens: np.ndarray, rounds: int = 2,
                           max_symbols: int = 255) -> int:
    """Lower bound for recursive-pairing FSST with `rounds` extra rounds.

    Round 0 is the existing 2-gram scheme; each further round pairs the
    previous round's code stream. Charges: per-round table (2 bytes per
    symbol entry pair-id) + final stream at 1 byte/code for in-table,
    2 bytes for literals — escape bitmaps and headers charged once,
    optimistically small."""
    raw = np.ascontiguousarray(tokens, dtype="<i4").view(np.uint8)
    stream = raw.view("<u2").astype(np.int64)  # round-0 pair stream
    total_table = 0
    for _ in range(rounds + 1):
        if stream.size < 2:
            break
        values, counts = np.unique(stream, return_counts=True)
        keep = counts >= 2
        values, counts = values[keep], counts[keep]
        if values.size > max_symbols:
            top = np.argpartition(counts, -max_symbols)[-max_symbols:]
            values, counts = values[top], counts[top]
        covered = counts.sum()
        total_table += 2 * values.size  # optimistic: 2 bytes/table entry
        # replace covered symbols by 1-byte codes, keep rest as 2-byte
        # literals; then pair the code stream for the next round
        n_in = int(covered)
        n_out = stream.size - n_in
        # next stream: codes paired up (optimistic: assume all codes are
        # adjacent and pairable)
        nxt = stream[: (n_in // 2) * 2]
        if nxt.size < 4:
            stream_size_bytes = n_in + 2 * n_out
            return 5 + total_table + stream_size_bytes
        a = nxt[0::2] << 16
        stream = a[: nxt[1::2].size] | nxt[1::2][: a.size]
        tail_bytes = 2 * n_out
    return 5 + total_table + stream.size + tail_bytes


def realistic_repair_size(tokens: np.ndarray, rounds: int = 2,
                          max_symbols: int = 255) -> int:
    """Realistic size for recursive-pairing FSST: every round pays its
    table (2B/entry for round 0 raw pairs, 2B/entry for code-pair symbols),
    its escape bitmap (ceil(items/8)), its literals (2B each); the final
    round's in-table codes cost 1B each. This is what a real implementation
    would write."""
    raw = np.ascontiguousarray(tokens, dtype="<i4").view(np.uint8)
    stream = raw.view("<u2").astype(np.int64)
    size = 5 + 4 + 1  # header + stream_len + n_rounds
    for r in range(rounds + 1):
        if stream.size == 0:
            break
        values, counts = np.unique(stream, return_counts=True)
        keep = counts >= 2
        values, counts = values[keep], counts[keep]
        if values.size > max_symbols:
            top = np.argpartition(counts, -max_symbols)[-max_symbols:]
            values = values[top]
        size += 2 + 2 * values.size          # n_symbols + table
        size += (stream.size + 7) // 8       # escape bitmap
        lut = np.isin(stream, values)
        n_in = int(lut.sum())
        n_out = stream.size - n_in
        size += 2 * n_out                    # literals
        codes = stream[lut]                  # u8 codes conceptually
        if r == rounds or codes.size < 4:
            size += codes.size               # final codes at 1B
            return size
        # pair codes for the next round (odd tail stays as a 1B code)
        if codes.size % 2:
            size += 1
            codes = codes[:-1]
        stream = (codes[0::2] << 8) | codes[1::2]
    return size


def study_blocks(name: str, arrays: list[np.ndarray]) -> dict:
    from parquet_playground_rs_spark.functions import batch_encode

    win2 = winvl = winreal = 0
    n = 0
    tot_lw = tot_real = 0
    for arr in arrays:
        if arr.size < 64:
            continue
        n += 1
        codec, stats, sizes = selector.choose_codec(arr, enable_fsst=False)
        best_lw = min(sizes.values())
        fsst2 = len(kernels.encode_fsst(arr))
        vl = optimistic_repair_size(arr)
        real = realistic_repair_size(arr)
        tot_lw += best_lw
        tot_real += min(real, best_lw)
        if fsst2 < best_lw:
            win2 += 1
        if vl < best_lw:
            winvl += 1
        if real < best_lw:
            winreal += 1
    return {"corpus": name, "blocks": n,
            "fsst2_wins": win2, "fsst2_rate": round(win2 / max(n, 1), 4),
            "fsstvl_optimistic_wins": winvl,
            "fsstvl_rate": round(winvl / max(n, 1), 4),
            "fsstvl_realistic_wins": winreal,
            "fsstvl_real_rate": round(winreal / max(n, 1), 4),
            "bytes_saved_if_shipped": int(tot_lw - tot_real),
            "bytes_lightweight": int(tot_lw)}


def main() -> None:
    from pyspark.sql import functions as F

    from parquet_playground_rs_spark.session import get_spark
    from parquet_playground_rs_spark.sources.generator import sequences_df
    from parquet_playground_rs_spark.sources.tokenizer import tokenize_documents

    spark = get_spark(app="fsst-study", cores=8, shuffle_partitions=8)

    # 1. synthetic generator corpus (the bench workload)
    seq = sequences_df(spark, 20_000, seed=42, partitions=8)
    syn = [np.array(r["tokens"], dtype=np.int32)
           for r in seq.limit(4000).collect()]

    # 2. tokenized documents (sf0.01)
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    dseq = tokenize_documents(docs)
    doc_arrays = [np.array(r["tokens"], dtype=np.int32)
                  for r in dseq.limit(4000).collect()]

    # 3. Zipfian stress: large vocab, heavy skew (BPE-like token stream)
    rng = np.random.default_rng(7)
    zipf = []
    for _ in range(2000):
        k = int(rng.integers(128, 4096))
        z = rng.zipf(1.3, k)
        zipf.append(np.minimum(z, 120_000).astype(np.int32))

    import json
    for name, arrays in (("synthetic", syn), ("documents", doc_arrays),
                         ("zipfian", zipf)):
        print(json.dumps(study_blocks(name, arrays)))
    spark.stop()


if __name__ == "__main__":
    main()
