#!/usr/bin/env python3
"""Measure the vocab-size-vs-corpus curve (Heaps' law) on the engine's
test corpora — the sizing evidence behind
sources/tokenizer.vocab_partitions_for.

Heaps: V(N) ~ K * N^beta. Fits K/beta from the documents tables at the
three driver SFs (duckdb — no Spark needed) and extrapolates to corpus
scale, showing the distinct-word set stays many orders of magnitude
below the corpus (so the word->id join is always a broadcast and the
vocab rank needs tens of partitions, not thousands).
"""

from __future__ import annotations

import math

import duckdb

SFS = ["sf0.001", "sf0.01", "sf0.1"]


def _fit(pts: list[tuple[str, int, int]]) -> tuple[float, float]:
    """Least-squares fit of log V = log K + beta log N."""
    xs = [math.log(n) for _, n, _ in pts]
    ys = [math.log(v) for _, _, v in pts]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs) or 1.0
    beta = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
    return math.exp(my - beta * mx), beta


def main() -> None:
    from parquet_playground_rs_spark.sources.tokenizer import (
        vocab_partitions_for,
    )

    pts = []
    for sf in SFS:
        path = f"/root/testdata/{sf}/documents.parquet"
        n_words, n_distinct = duckdb.sql(f"""
            WITH w AS (
              SELECT unnest(string_split(text, ' ')) AS word
              FROM read_parquet('{path}'))
            SELECT count(*), count(DISTINCT word) FROM w
        """).fetchone()
        pts.append((sf, int(n_words), int(n_distinct)))
        print(f"{sf}: N={n_words:,} tokens, V={n_distinct:,} distinct "
              f"(V/N={n_distinct / n_words:.4f})")
    K, beta = _fit(pts)
    print(f"documents-table fit: V ~= {K:.2f} * N^{beta:.3f} "
          f"(template corpus: 31-word vocabulary, beta ~ 0 — every "
          f"partition-count choice >= 1 is safe there)")

    # The driver documents are template text (fixed 31-word vocab), so
    # the Heaps exponent must be measured on a natural-ish corpus: a
    # deterministic Zipf(1.1) word stream over an open vocabulary — the
    # standard model of natural-language word frequencies (Zipf's law is
    # what PRODUCES Heaps behavior).
    import numpy as np

    # Heaps' exponent for a Zipf-s word source is beta = 1/s (s > 1).
    # s = 2.0 reproduces the beta ~= 0.5 measured on natural English;
    # s = 1.1 is the heavy-tailed worst case (open-vocabulary web text
    # with typos/IDs — beta ~= 0.9, vocab nearly corpus-scaled).
    for s in (2.0, 1.1):
        rng = np.random.default_rng(42)
        print(f"\nZipf({s}) synthetic corpus (deterministic, seed 42):")
        zpts = []
        for N in (10**5, 10**6, 10**7):
            words = rng.zipf(s, N)
            V = int(np.unique(words).size)
            zpts.append((f"N={N:.0e}", N, V))
            print(f"  N={N:.0e}: V={V:,} distinct (V/N={V / N:.4f})")
        K, beta = _fit(zpts)
        print(f"fit: V ~= {K:.2f} * N^{beta:.3f}")
        for N in (1e9, 1e12, 1e14):
            V = K * N ** beta
            print(f"  N={N:.0e} tokens -> V~={V:,.0f} distinct words "
                  f"-> {vocab_partitions_for(int(V))} vocab range "
                  f"partitions")


if __name__ == "__main__":
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
