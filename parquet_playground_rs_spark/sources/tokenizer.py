"""Tokenize the `documents` table into the engine's `sequences` shape.

Whitespace tokenization + a deterministic global vocabulary (word -> id by
alphabetical rank). The mapping is pure SQL in both Spark and DuckDB, which
makes every downstream token statistic oracle-checkable by the round driver.

Scale notes (100 TB corpus): the vocabulary is tiny relative to the corpus
(Heaps' law), so the word->id join is a **broadcast** join — no shuffle of
the exploded corpus; the only wide operation is the posexplode/groupBy pair
that rebuilds the arrays, which shuffles (doc_id, pos, id) — the minimum
possible payload. The alphabetical-rank window runs on the distinct-word set
only, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_vocab(docs: DataFrame) -> DataFrame:
    """(word string, token_id int) — id = alphabetical rank, 0-based."""
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word")).distinct()
    w = Window.orderBy("word")
    return words.select(
        "word", (F.row_number().over(w) - 1).cast("int").alias("token_id")
    )


def tokenize_documents(docs: DataFrame, vocab: DataFrame | None = None) -> DataFrame:
    """documents(doc_id, text, source, ...) -> (doc_id, tokens, n_tok, source).

    doc_id is cast to string per the input_hint shape.
    """
    if vocab is None:
        vocab = build_vocab(docs)
    exploded = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "source",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"),
    )
    with_ids = exploded.join(F.broadcast(vocab), "word")
    seqs = (
        with_ids.groupBy("doc_id", "source")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token_id"))),
                lambda s: s["token_id"],
            ).alias("tokens")
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .select("doc_id", "tokens", "n_tok", "source")
    )
    return seqs
