"""Text-analysis functions for large-scale training-data pipelines.

All operators are pure ``pyspark.sql.functions`` column expressions —
JVM-side, whole-stage-codegen friendly, no Python UDFs in the hot path.
Each has an exact SQL twin (see plans/text_queries.py) so the DuckDB
oracle can verify them cell-for-cell.

Design note for 100 TB: every function here is row-local (no shuffle at
all); the enrichment runs inside the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minimal English stopword list for the language-ID heuristic. Kept tiny
#: and frozen — it is part of the deterministic operator contract.
EN_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "for", "on", "with", "as", "at", "by", "it", "this", "that",
)


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space split, empty tokens removed)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def avg_token_length(text: Column) -> Column:
    """Mean token length in characters; 0.0 for empty documents."""
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    n = F.size(toks)
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords; 0.0 for empty documents."""
    toks = tokens(text)
    stops = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    n = F.size(toks)
    return F.when(n > 0, stops.cast("double") / n).otherwise(F.lit(0.0))


def language_id(text: Column, threshold: float = 0.03) -> Column:
    """N-gram-free language-ID heuristic: stopword density ≥ threshold →
    'en', else 'unk'. A real model slots in behind the same column
    signature (string → string)."""
    return F.when(stopword_ratio(text) >= threshold, "en").otherwise("unk")


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic for corpus filtering:

    0.5 * saturating(length / 200 tokens)   — substance
    + 0.3 * (1 − stopword_ratio)            — information density
    + 0.2 * saturating(avg_token_len / 8)   — vocabulary richness

    Not a learned model — a cheap, reproducible pre-filter of the kind
    used before expensive pipeline stages.
    """
    n = token_count(text).cast("double")
    length_term = F.least(n / F.lit(200.0), F.lit(1.0))
    density_term = F.lit(1.0) - stopword_ratio(text)
    richness_term = F.least(avg_token_length(text) / F.lit(8.0), F.lit(1.0))
    return F.round(
        length_term * 0.5 + density_term * 0.3 + richness_term * 0.2, 6
    )


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit document fingerprint (hex). md5 is chosen for
    cross-engine availability, not cryptography."""
    return F.md5(text)
