"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship encode -> decode -> verify round-trip on
sf0.001. `queries()` exposes each implemented operator from SURVEY.md §2
(+ the training-data-pipeline extras) over the driver testdata tables;
`oracle_sql()` gives the DuckDB-equivalent SQL for every SQL-expressible
one. Integer sums/counts are used instead of floating averages wherever
possible so the value-hash comparison is exact.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF001 = "/root/testdata/sf0.001"

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_playground_rs_spark.sources.tokenizer import tokenize_documents

    return tokenize_documents(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Encode the tokenized sf0.001 documents, decode, verify, summarize."""
    from parquet_playground_rs_spark.operators import decode as dec
    from parquet_playground_rs_spark.operators import encode as enc

    seq = _sequences(spark, SF001).cache()
    encoded = enc.encode_tokens(seq, chunk_size=4096).cache()
    decoded = dec.decode_tokens(encoded)
    verdict = dec.verify_roundtrip(seq, decoded)
    summary = encoded.groupBy("codec").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum("meta.input_bytes").cast("long").alias("input_bytes"),
        F.sum("meta.output_bytes").cast("long").alias("output_bytes"),
    )
    return summary.crossJoin(
        verdict.select("n_mismatch", "n_joined")
    ).orderBy("codec")


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def _q_token_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = _sequences(spark, sf_dir)
    per_doc = seq.select(
        "doc_id", "source", "n_tok",
        F.aggregate("tokens", F.lit(0).cast("long"), lambda acc, x: acc + x)
        .alias("checksum"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tokens"),
            F.sum("checksum").cast("long").alias("token_checksum"),
            F.min("n_tok").cast("long").alias("min_n_tok"),
            F.max("n_tok").cast("long").alias("max_n_tok"),
        )
        .orderBy("source")
    )


_ORACLE_TOKENIZE = """
WITH w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         unnest(string_split(text, ' ')) AS word
  FROM documents
),
v AS (
  SELECT word, CAST(row_number() OVER (ORDER BY word) - 1 AS BIGINT) AS token_id
  FROM (SELECT DISTINCT word FROM w)
),
t AS (SELECT w.doc_id, w.source, v.token_id FROM w JOIN v USING (word))
"""

_Q_TOKEN_STATS_SQL = _ORACLE_TOKENIZE + """
, per_doc AS (
  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_tok,
         CAST(sum(token_id) AS BIGINT) AS checksum
  FROM t GROUP BY doc_id, source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
       CAST(sum(checksum) AS BIGINT) AS token_checksum,
       CAST(min(n_tok) AS BIGINT) AS min_n_tok,
       CAST(max(n_tok) AS BIGINT) AS max_n_tok
FROM per_doc GROUP BY source ORDER BY source
"""


def _q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_playground_rs_spark.sources.tokenizer import build_vocab

    vocab = build_vocab(_docs(spark, sf_dir))
    return vocab.agg(
        F.count("*").cast("long").alias("vocab_size"),
        F.min("token_id").cast("long").alias("min_id"),
        F.max("token_id").cast("long").alias("max_id"),
        F.sum(F.length("word")).cast("long").alias("total_word_chars"),
    )


_Q_VOCAB_SQL = """
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
v AS (
  SELECT word, CAST(row_number() OVER (ORDER BY word) - 1 AS BIGINT) AS token_id
  FROM (SELECT DISTINCT word FROM w)
)
SELECT CAST(count(*) AS BIGINT) AS vocab_size,
       CAST(min(token_id) AS BIGINT) AS min_id,
       CAST(max(token_id) AS BIGINT) AS max_id,
       CAST(sum(length(word)) AS BIGINT) AS total_word_chars
FROM v
"""


def _q_run_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length stats (selector input analog) over an ordered key stream."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.orderBy("o_orderkey")
    runs = orders.select(
        "o_orderstatus", F.lag("o_orderstatus").over(w).alias("prev")
    )
    return runs.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(
            F.when(F.col("prev").isNull() | (F.col("prev") != F.col("o_orderstatus")), 1)
            .otherwise(0)
        ).cast("long").alias("n_runs"),
        F.countDistinct("o_orderstatus").cast("long").alias("n_unique"),
    )


_Q_RUN_STATS_SQL = """
WITH r AS (
  SELECT o_orderstatus,
         lag(o_orderstatus) OVER (ORDER BY o_orderkey) AS prev
  FROM orders
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN prev IS NULL OR prev <> o_orderstatus THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_unique
FROM r
"""


def _q_cardinality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec-selector stats (cardinality / range / bit-width) over lineitem."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.agg(
        F.countDistinct("l_partkey").cast("long").alias("card_partkey"),
        F.countDistinct("l_suppkey").cast("long").alias("card_suppkey"),
        F.min("l_partkey").cast("long").alias("min_partkey"),
        F.max("l_partkey").cast("long").alias("max_partkey"),
        F.floor(F.log2(F.max("l_partkey") - F.min("l_partkey") + 1))
        .cast("long").alias("bit_width_partkey"),
        F.count("*").cast("long").alias("n_rows"),
    )


_Q_CARDINALITY_SQL = """
SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS card_partkey,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS card_suppkey,
       CAST(min(l_partkey) AS BIGINT) AS min_partkey,
       CAST(max(l_partkey) AS BIGINT) AS max_partkey,
       CAST(floor(log2(max(l_partkey) - min(l_partkey) + 1)) AS BIGINT) AS bit_width_partkey,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
"""


def _q_length_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-tail / skew profile of document lengths (n_tok skew proxy)."""
    docs = _docs(spark, sf_dir)
    return docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(F.when(F.col("n_chars") > 300, 1).otherwise(0)).cast("long").alias("n_over_300"),
        F.sum(F.when(F.col("n_chars") > 450, 1).otherwise(0)).cast("long").alias("n_over_450"),
    )


_Q_LENGTH_TAIL_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_300,
       CAST(sum(CASE WHEN n_chars > 450 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_450
FROM documents
"""


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (training-pipeline op)."""
    docs = _docs(spark, sf_dir)
    groups = docs.groupBy(F.md5(F.col("text")).alias("h")).agg(
        F.count("*").alias("c")
    )
    return groups.agg(
        F.count("*").cast("long").alias("n_distinct_texts"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).cast("long").alias("n_dup_groups"),
        F.sum(F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0)).cast("long").alias("n_removable"),
    )


_Q_DEDUP_EXACT_SQL = """
WITH g AS (SELECT md5(text) AS h, count(*) AS c FROM documents GROUP BY md5(text))
SELECT CAST(count(*) AS BIGINT) AS n_distinct_texts,
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
       CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT) AS n_removable
FROM g
"""


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring counters (stopword hits, word counts) per source."""
    docs = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    per_doc = docs.select(
        "source",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.filter(words, lambda x: x.isin(STOPWORDS))).cast("long").alias("n_stop"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("sum_words"),
            F.sum("n_stop").cast("long").alias("sum_stopwords"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .orderBy("source")
    )


_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)
_Q_TEXT_QUALITY_SQL = f"""
WITH per_doc AS (
  SELECT source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_SQL}))) AS BIGINT) AS n_stop,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS sum_words,
       CAST(sum(n_stop) AS BIGINT) AS sum_stopwords,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM per_doc GROUP BY source ORDER BY source
"""


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-weighted token fingerprint per doc; distinct count per source."""
    seq = _sequences(spark, sf_dir)
    fp = seq.select(
        "source",
        F.aggregate(
            F.zip_with(
                F.col("tokens"),
                F.sequence(F.lit(1), F.size("tokens")),
                lambda t, p: t.cast("long") * p.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("fp"),
    )
    return (
        fp.groupBy("source")
        .agg(
            F.countDistinct("fp").cast("long").alias("n_distinct_fp"),
            F.sum("fp").cast("long").alias("fp_sum"),
        )
        .orderBy("source")
    )


_Q_FINGERPRINT_SQL = _ORACLE_TOKENIZE.replace(
    "unnest(string_split(text, ' ')) AS word",
    "unnest(string_split(text, ' ')) AS word, "
    "generate_subscripts(string_split(text, ' '), 1) AS pos",
).replace(
    "t AS (SELECT w.doc_id, w.source, v.token_id FROM w JOIN v USING (word))",
    "t AS (SELECT w.doc_id, w.source, w.pos, v.token_id FROM w JOIN v USING (word))",
) + """
, fp AS (
  SELECT doc_id, source, CAST(sum(token_id * pos) AS BIGINT) AS fp
  FROM t GROUP BY doc_id, source
)
SELECT source,
       CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_fp,
       CAST(sum(fp) AS BIGINT) AS fp_sum
FROM fp GROUP BY source ORDER BY source
"""


# --- rows-only (non-SQL-expressible codec ops) ------------------------------

def _q_encode_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_playground_rs_spark.operators import encode as enc

    seq = _sequences(spark, sf_dir)
    encoded = enc.encode_tokens(seq, chunk_size=4096)
    return (
        encoded.groupBy("codec")
        .agg(
            F.count("*").cast("long").alias("n_blocks"),
            F.sum("meta.input_bytes").cast("long").alias("input_bytes"),
            F.sum("meta.output_bytes").cast("long").alias("output_bytes"),
        )
        .orderBy("codec")
    )


def _q_roundtrip_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_playground_rs_spark.operators import decode as dec
    from parquet_playground_rs_spark.operators import encode as enc

    seq = _sequences(spark, sf_dir).cache()
    decoded = dec.decode_tokens(enc.encode_tokens(seq, chunk_size=2048))
    return dec.verify_roundtrip(seq, decoded)


def _q_synthetic_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip over the deterministic generator (full edge-shape coverage)."""
    from parquet_playground_rs_spark.operators import decode as dec
    from parquet_playground_rs_spark.operators import encode as enc
    from parquet_playground_rs_spark.sources.generator import sequences_df

    seq = sequences_df(spark, 500, seed=42, partitions=4).cache()
    decoded = dec.decode_tokens(enc.encode_tokens(seq, chunk_size=1024))
    return dec.verify_roundtrip(seq, decoded)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "token_stats_by_source": _q_token_stats_by_source,
        "vocab_stats": _q_vocab_stats,
        "run_stats": _q_run_stats,
        "cardinality_stats": _q_cardinality_stats,
        "length_tail": _q_length_tail,
        "dedup_exact": _q_dedup_exact,
        "text_quality": _q_text_quality,
        "fingerprint": _q_fingerprint,
        "encode_summary": _q_encode_summary,
        "roundtrip_verify": _q_roundtrip_verify,
        "synthetic_roundtrip": _q_synthetic_roundtrip,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "token_stats_by_source": _Q_TOKEN_STATS_SQL,
        "vocab_stats": _Q_VOCAB_SQL,
        "run_stats": _Q_RUN_STATS_SQL,
        "cardinality_stats": _Q_CARDINALITY_SQL,
        "length_tail": _Q_LENGTH_TAIL_SQL,
        "dedup_exact": _Q_DEDUP_EXACT_SQL,
        "text_quality": _Q_TEXT_QUALITY_SQL,
        "fingerprint": _Q_FINGERPRINT_SQL,
        # encode_summary / roundtrip_verify / synthetic_roundtrip:
        # codec blobs are not SQL-expressible -> rows-only checks
    }
