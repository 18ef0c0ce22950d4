"""Text-analysis operators for training-data pipelines over ``documents``.

Language ID (marker-token counts), quality scoring (length / punctuation /
stopword ratios), token counting, and document fingerprinting — all pure
DataFrame expressions so the DuckDB oracle states identical math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker substrings per language; counts decide argmax (ties -> code order)
LANG_MARKERS = {
    "en": [" the ", " and "],
    "es": [" el ", " la "],
    "de": [" der ", " und "],
    "fr": [" le ", " et "],
}


def _count_occurrences(col, needle: str):
    # (len(s) - len(replace(s, needle, ''))) / len(needle) — portable
    return (
        F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))
    ) / len(needle)


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang): argmax of marker counts, 'und' if all zero."""
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    scores = {
        lang: sum(_count_occurrences(padded, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }
    best = None
    for lang in sorted(scores):
        s = scores[lang]
        if best is None:
            best = F.when(s > 0, F.lit(lang)).otherwise(F.lit("und"))
            best_score = s
        else:
            best = F.when(s > best_score, F.lit(lang)).otherwise(best)
            best_score = F.greatest(best_score, s)
    return docs.select("doc_id", best.alias("pred_lang"))


def token_count(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, space_ratio, score).

    score = round(min(1, n_tokens/100) * (1 - |avg_len - 5|/10), 6) — a
    deterministic toy quality heuristic with portable arithmetic.
    """
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("double")
    n_chars = F.length("text").cast("double")
    n_spaces = n_chars - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    avg_len = (n_chars - n_spaces) / n_tokens
    score = F.round(
        F.least(F.lit(1.0), n_tokens / 100.0)
        * (1.0 - F.abs(avg_len - 5.0) / 10.0),
        6,
    )
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(n_spaces / n_chars, 6).alias("space_ratio"),
        score.alias("score"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): 16-hex-digit content fingerprint of the
    whitespace-normalized lowercased text."""
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return docs.select(
        "doc_id", F.substring(F.md5(norm.cast("binary")), 1, 16).alias("fp")
    )
