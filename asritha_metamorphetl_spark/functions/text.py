"""Text-analysis functions for large-scale training-data pipelines.

All operators are pure ``pyspark.sql.functions`` column expressions —
JVM-side, whole-stage-codegen friendly, no Python UDFs in the hot path.
Each has an exact SQL twin (see plans/text_queries.py) so the DuckDB
oracle can verify them cell-for-cell.

Design note for 100 TB: every function here is row-local (no shuffle at
all); the enrichment runs inside the scan stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


#: Winnowing geometry: k-char grams, window of w consecutive hashes.
WINNOW_K = 5
WINNOW_W = 4
#: Polynomial base. Codepoints are masked ``% WINNOW_B`` in every
#: spelling (Column HOF, numpy kernel, SQL twin): Spark ascii()/Python
#: ord()/DuckDB ascii() return full Unicode codepoints (up to 0x10FFFF),
#: which would break the per-position < B premise on non-ASCII text and
#: degrade hash quality. ASCII codepoints (< 257) are unchanged by the
#: mask, so fingerprints on ASCII corpora are identical with or without
#: it; non-ASCII text now hashes with the same collision behavior.
WINNOW_B = 257

_WINNOW_POWS = tuple(WINNOW_B ** (WINNOW_K - 1 - j) for j in range(WINNOW_K))


def char_gram_hashes(text: Column, k: int = WINNOW_K) -> Column:
    """Polynomial (Rabin-Karp) hash of every k-char gram:

        h_i = Σ_j code(text[i+j]) · B^(k−1−j)

    Computed positionally rather than incrementally — same values as the
    rolling recurrence, but each position is independent, so the engine
    parallelizes within the row and the SQL twin is a plain list
    comprehension. With B=257 and k=5 the max value is ~1.1e12 per term —
    exact in int64 with no modulus, hence bit-identical across engines.
    Docs shorter than k chars produce an empty array.
    """
    n = F.length(text)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: sum(
            (
                (F.ascii(text.substr(i + F.lit(j), F.lit(1))) % WINNOW_B).cast(
                    "long"
                )
                * F.lit(p)
                for j, p in enumerate(_WINNOW_POWS)
            ),
            F.lit(0).cast("long"),
        ),
    )


def winnow_fingerprints(
    text: Column, k: int = WINNOW_K, w: int = WINNOW_W
) -> Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    the min hash of every window of w consecutive k-gram hashes, dedup'd.
    Guarantees any shared substring of length ≥ k+w−1 yields at least one
    shared fingerprint — the standard near-dup/plagiarism sketch.

    Default path is the Arrow-batched numpy kernel (`codes @ powers` via
    shifted slices + sliding-window minima): the per-char work makes the
    interpreted-HOF spelling ~10× slower (measured 8.6s vs <1s on the
    sf0.1 corpus). ``winnow_fingerprints_expr`` keeps the pure-Column
    spelling — value-identical (asserted in tests) and the direct mirror
    of the SQL oracle.
    """
    if (k, w) == (WINNOW_K, WINNOW_W):
        return _winnow_udf(text)
    return winnow_fingerprints_expr(text, k, w)


def winnow_fingerprints_expr(
    text: Column, k: int = WINNOW_K, w: int = WINNOW_W
) -> Column:
    """Pure-Column winnowing (see winnow_fingerprints). The gram-hash
    array is LET-BOUND (one-element array + transform) so the interpreted
    window lambda reads a materialized array instead of re-hashing the
    document per window — see word_shingles for why HOFs need this.
    """

    def select_mins(hs: Column) -> Column:
        m = F.size(hs)
        widx = F.when(m >= w, F.sequence(F.lit(1), m - (w - 1))).otherwise(
            F.array().cast("array<int>")
        )
        return F.array_distinct(
            F.transform(widx, lambda i: F.array_min(F.slice(hs, i, w)))
        )

    return F.element_at(
        F.transform(F.array(char_gram_hashes(text, k)), select_mins), 1
    )


def _make_winnow_udf(k: int, w: int):
    from numpy.lib.stride_tricks import sliding_window_view
    from pyspark.sql.functions import pandas_udf

    pows = np.array([WINNOW_B ** (k - 1 - j) for j in range(k)], dtype=np.int64)

    @pandas_udf("array<bigint>")
    def winnow(vs: pd.Series) -> pd.Series:
        out = []
        for t in vs:
            if t is None or len(t) < k:
                out.append([])
                continue
            # ord() per char == Spark ascii()/DuckDB ascii() codepoints;
            # masked % B to match the Column/SQL spellings on non-ASCII
            codes = np.array([ord(c) % WINNOW_B for c in t], dtype=np.int64)
            n = codes.shape[0]
            grams = sum(
                codes[j : n - k + 1 + j] * pows[j] for j in range(k)
            )
            if grams.shape[0] < w:
                out.append([])
                continue
            mins = sliding_window_view(grams, w).min(axis=1)
            out.append(np.unique(mins).tolist())
        return pd.Series(out)

    return winnow


_WINNOW_UDF_CACHE = None


def _winnow_udf(col: Column) -> Column:
    # Created lazily: pandas_udf needs an active SparkContext to parse
    # its DDL return type, and this module imports before any session
    # exists (e.g. at test collection).
    global _WINNOW_UDF_CACHE
    if _WINNOW_UDF_CACHE is None:
        _WINNOW_UDF_CACHE = _make_winnow_udf(WINNOW_K, WINNOW_W)
    return _WINNOW_UDF_CACHE(col)


#: BPE-style pre-tokenization pattern: letter runs, SINGLE digits,
#: punctuation runs (single-space whitespace excluded) — the shape GPT-2
#: class tokenizers split on before byte-pair merges. Identical character
#: classes in Java (Spark) and RE2-ish (DuckDB) regex dialects.
BPE_SPLIT_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def bpe_token_count(text: Column) -> Column:
    """Subword-ish token count: matches of BPE_SPLIT_PATTERN. An upper
    proxy for real BPE token counts (merges only reduce it) — the cheap
    budget estimator a corpus pipeline runs before a real tokenizer."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), 0))
