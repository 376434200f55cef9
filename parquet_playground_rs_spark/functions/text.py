"""Text-analysis column functions for training-data pipelines.

Pure `pyspark.sql.functions` expressions (JVM-side, codegen'd) — no UDFs.
Each returns a Column usable in select/withColumn; the heuristics are
deliberately simple + deterministic so they stay oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

# tiny per-language marker vocabularies for the n-gram/stopword language ID
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "die", "und", "ist", "mit"],
    "fr": ["le", "la", "et", "est", "avec"],
    "es": ["el", "la", "y", "es", "con"],
    "it": ["il", "la", "e", "è", "con"],
}


def words(text: Column | str) -> Column:
    return F.split(F.col(text) if isinstance(text, str) else text, " ")


def n_words(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(words(text)).cast("long")


def n_subword_tokens(text: Column | str) -> Column:
    """BPE-ish token count: alpha runs, digit runs, punctuation singles.

    A cheap upper-bound proxy for tokenizer cost models: counts matches of
    `[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]`.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.regexp_extract_all(c, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), 0)
    ).cast("long")


def stopword_count(text: Column | str, stopwords: list[str] | None = None) -> Column:
    # None -> defaults; an EXPLICIT empty list means "no stopwords" (a
    # truthiness `or` would silently substitute the English defaults)
    sw = STOPWORDS_EN if stopwords is None else stopwords
    return F.size(F.filter(words(text), lambda x: x.isin(sw))).cast("long")


def punct_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(r"[^a-zA-Z0-9 ]"), 0)).cast("long")


def quality_score(text: Column | str) -> Column:
    """[0,1] quality heuristic: length band + stopword presence - punct excess.

    Not a trained model — a deterministic filter like the classic "Gopher
    rules" style cutoffs.
    """
    c = F.col(text) if isinstance(text, str) else text
    nw = n_words(c)
    sw_ratio = stopword_count(c) / F.greatest(nw, F.lit(1))
    punct_ratio = punct_count(c) / F.greatest(F.length(c), F.lit(1))
    len_ok = F.when((nw >= 10) & (nw <= 10000), F.lit(0.4)).otherwise(F.lit(0.0))
    sw_ok = F.least(sw_ratio * 2, F.lit(0.4))
    punct_pen = F.least(punct_ratio * 2, F.lit(0.2))
    return (len_ok + sw_ok + F.lit(0.2) - punct_pen).cast("double")


def gopher_keep(text: Column | str) -> Column:
    """Boolean corpus-filter rule in the Gopher-rules style, built from
    INTEGER comparisons only (word-count band, stopword floor, punctuation
    ceiling) — exactly reproducible in any SQL engine, so the filter's
    row selection is oracle-checkable without float-threshold edge risk:

        10 <= n_words <= 10000
        stopword_count * 10 >= n_words       (>= 10% stopwords)
        punct_count * 4 <= length(text)      (<= 25% punctuation chars)
    """
    c = F.col(text) if isinstance(text, str) else text
    nw = n_words(c)
    return ((nw >= 10) & (nw <= 10000)
            & (stopword_count(c) * 10 >= nw)
            & (punct_count(c) * 4 <= F.length(c)))


def lang_scores(text: Column | str) -> Column:
    """map<string,bigint> of marker-word hits per language."""
    w = words(text)
    entries = [
        F.struct(
            F.lit(lang).alias("key"),
            F.size(F.filter(w, lambda x: x.isin(markers))).cast("long").alias("value"),
        )
        for lang, markers in LANG_MARKERS.items()
    ]
    return F.map_from_entries(F.array(*entries))


def lang_id(text: Column | str) -> Column:
    """Best-scoring language code, 'und' when nothing matches."""
    scores = lang_scores(text)
    entries = F.map_entries(scores)
    best = F.array_sort(
        entries,
        lambda a, b: F.when(a["value"] > b["value"], -1)
        .when(a["value"] < b["value"], 1)
        # deterministic tie-break: alphabetical
        .when(a["key"] < b["key"], -1)
        .when(a["key"] > b["key"], 1)
        .otherwise(0),
    )[0]
    return F.when(best["value"] > 0, best["key"]).otherwise(F.lit("und"))


def rolling_fingerprint(tokens_col: Column | str, window: int = 8) -> Column:
    """Deterministic document fingerprint from token ids.

    Position-weighted polynomial accumulate mod 2^31-1 (keeps every
    intermediate < 2^52, safe under ANSI int64 arithmetic), computed with
    `aggregate` so it stays JVM-side. Equal arrays -> equal fingerprints;
    cheap winnowing/rabin analog for exact-content identity at scale.
    """
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    m = F.lit((1 << 31) - 1)
    return F.aggregate(
        c,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * F.lit(1000003) + x.cast("long") + F.lit(1), m),
    )
