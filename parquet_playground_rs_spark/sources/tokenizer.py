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


# Target distinct words per vocab range partition: each partition's local
# rank is a window sort of ~this many SHORT strings — a few hundred MB at
# most, comfortably one task.
WORDS_PER_VOCAB_PARTITION = 2_000_000


def vocab_partitions_for(est_distinct_words: int) -> int:
    """Range-partition count for an estimated distinct-word count.

    Heaps' law sizes the estimate: V(N) ~ K * N^beta over corpus token
    count N, with beta = 1/s for a Zipf-s word source. Measured
    (scripts/vocab_curve.py, deterministic seeds): an English-like
    Zipf(2.0) corpus fits V ~= 1.5 * N^0.495 — ~1.3M distinct words at
    10^12 tokens, ONE partition; the heavy-tailed Zipf(1.1) worst case
    (open-vocabulary web text: typos, IDs) fits V ~= 1.24 * N^0.908 —
    ~10^11 distinct at 10^12 tokens, ~49k partitions. The driver's own
    documents table is 31-word template text (beta ~= 0). The default 32
    covers anything up to ~6.4e7 distinct words; pass the estimate when
    the corpus is in the heavy-tailed regime.
    """
    return max(1, -(-est_distinct_words // WORDS_PER_VOCAB_PARTITION))


def build_vocab(docs: DataFrame, num_partitions: int | None = None,
                est_distinct_words: int | None = None) -> DataFrame:
    """(word string, token_id int) — id = alphabetical rank, 0-based.

    Scalable two-pass rank instead of a global-order window (which would
    move the whole distinct-word set through ONE task — billions of rows at
    corpus scale): range-partition by word so partition p holds an
    alphabetical range, rank locally per partition, then add the partition
    offsets (sum of lower partitions' counts, <= num_partitions values,
    applied as a literal map — no join, no single-partition exchange).
    The global rank is off[pid] + local_rank - 1 regardless of where the
    range boundaries land, so the assignment is identical to the global
    window's and stays oracle-stable — by construction the returned ids
    are INVARIANT to the partition count (pytest-checked at two counts).

    Partition sizing: pass `num_partitions` directly, or
    `est_distinct_words` (a Heaps'-law corpus estimate — see
    vocab_partitions_for) to derive it; default 32 covers anything up to
    ~6.4e7 distinct words.

    The ranked frame is persisted (vocab-sized, tiny next to the corpus):
    the offset count and the returned mapping both read it, and the
    downstream word->id broadcast join reuses it.
    """
    from pyspark import StorageLevel

    if num_partitions is None:
        num_partitions = (vocab_partitions_for(est_distinct_words)
                          if est_distinct_words else 32)

    # The distinct-word set is computed once and persisted: the range
    # partitioner's boundary SAMPLING job and the range shuffle both
    # consume it, and without the persist each re-ran the full corpus
    # explode+distinct (round 9; the set is vocab-sized — tiny next to
    # the corpus, same justification as `local` below).
    words = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("word")
    ).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    ranged = words.repartitionByRange(num_partitions, "word") \
        .withColumn("pid", F.spark_partition_id())
    lw = Window.partitionBy("pid").orderBy("word")
    local = ranged.withColumn("lr", F.row_number().over(lw)) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    sizes = {r["pid"]: r["cnt"]
             for r in local.groupBy("pid").agg(F.count("*").alias("cnt")).collect()}
    # `local` is fully materialized by the collect above; the upstream
    # distinct-word cache has served both its consumers and is released.
    words.unpersist()
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):  # ascending pid == ascending word range
        offsets[pid] = acc
        acc += sizes[pid]
    if not offsets:
        return local.select(
            "word", (F.col("lr") - 1).cast("int").alias("token_id"))
    mapping = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv])
    return local.select(
        "word",
        (mapping[F.col("pid")] + F.col("lr") - 1).cast("int").alias("token_id"),
    )


def tokenize_documents(docs: DataFrame, vocab: DataFrame | None = None,
                       vocab_partitions: int | None = None,
                       est_distinct_words: int | None = None,
                       unk_id: int | None = None) -> DataFrame:
    """documents(doc_id, text, source, ...) -> (doc_id, tokens, n_tok, source).

    doc_id is cast to string per the input_hint shape. The vocab
    partition knob (count or Heaps'-law distinct-word estimate — see
    build_vocab) threads through for corpus-scale callers.

    OOV policy for a caller-supplied `vocab` (the realistic corpus-scale
    shape: tokenize today's data against yesterday's frozen vocabulary):
    - unk_id=None (default): any word absent from the vocab RAISES at
      execution with the offending word in the message. A silent drop
      (the pre-round-5 inner-join behavior) shortened token arrays with
      no signal — n_tok quietly disagreed with the word count. The raise
      is lazy like everything else in the plan: it fires when token
      VALUES are consumed (collect, encode, any expression over
      `tokens`); Catalyst prunes the check from queries that never read
      them (row counts, n_tok totals) — those results don't depend on
      the OOV ids and are computed over the full word count either way.
    - unk_id=<int>: absent words map to that id (the usual <unk> slot);
      n_tok keeps counting them.
    When the vocab is built here from `docs` itself it is complete by
    construction and the join stays a plain inner broadcast join.
    """
    own_vocab = vocab is None
    if own_vocab:
        vocab = build_vocab(docs, num_partitions=vocab_partitions,
                            est_distinct_words=est_distinct_words)
    exploded = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "source",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"),
    )
    if own_vocab:
        with_ids = exploded.join(F.broadcast(vocab), "word")
    else:
        joined = exploded.join(F.broadcast(vocab), "word", "left")
        if unk_id is not None:
            resolved = F.coalesce(F.col("token_id"), F.lit(int(unk_id)))
        else:
            # raise_error rides the null branch only; the message carries
            # the word so the failure is actionable, and building it from
            # the column keeps the expression non-foldable
            resolved = F.when(
                F.col("token_id").isNotNull(), F.col("token_id")
            ).otherwise(F.raise_error(F.concat(
                F.lit("tokenize_documents: word not in vocab (pass "
                      "unk_id= for an OOV slot): "), F.col("word"))))
        with_ids = joined.withColumn("token_id", resolved.cast("int"))
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
