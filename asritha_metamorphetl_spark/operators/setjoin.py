"""Prefix-filtered exact set-similarity self-join (PPJoin-style).

The provably-COMPLETE exact-Jaccard join (Chaudhuri/Ganti/Kaushik 2006
SSJoin; Xiao et al. 2008 PPJoin): where ``ngram_jaccard_pairs`` bounds
its inverted index with a doc-frequency cap (dropping stop-shingles —
fast, but a pair whose only common shingles are frequent is silently
missed) and MinHash-LSH is probabilistic by construction, prefix
filtering guarantees NO missed pair at the chosen threshold:

    order the universe of set elements globally (rarest first); a set x
    only needs its first  |x| - ceil(t·|x|) + 1  elements as join keys,
    because any y with J(x, y) >= t must share at least one of them —
    if x and y disagreed on both prefixes entirely, their overlap is
    too small to reach t.

Pipeline (all equi-joins, no cartesian anywhere):
1. distinct word-shingles per doc, HASHED to 48-bit longs immediately
   (16-byte join rows instead of text; md5-derived so the oracle
   replays them bit-for-bit);
2. global element order = (document frequency asc, hash asc) — rare
   shingles first, so prefixes are maximally selective;
3. per-doc prefix via a row_number window over the narrow hashed rows;
4. candidate pairs = prefix self-join on the shingle key + the length
   filter t·|x| <= |y| <= |x|/t (another completeness-preserving cut);
5. exact verify: count ALL common shingles for candidate pairs only.

Threshold arithmetic is RATIONAL (t = num/den) and stays in integers —
``ceil(t·n) = (num·n + den − 1) div den`` and the final test is
``n_common · den >= num · (|x| + |y| − n_common)`` — so Spark and the
SQL oracle agree exactly, with no float ceil at any decision point.

Scale shape: the shingle frame is localCheckpointed once (it feeds the
sizes aggregate, the frequency aggregate, the prefix window, and both
verify joins — five consumers that would otherwise each re-tokenize
the corpus); every join is a hash equi-join on a long key; candidate
volume is bounded by prefix selectivity, not corpus².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.functions.hashing import (
    shingle_hash,
    word_shingles,
)


def _ceil_frac(n, num: int, den: int):
    """ceil(num*n/den) in pure integer arithmetic."""
    return F.expr(f"({num} * {n} + {den - 1}) div {den}")


def _hashed_shingles(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, sh) distinct word-shingles per doc, hashed to 48-bit
    longs — 16-byte join rows instead of text, md5-derived so the
    oracle replays them bit-for-bit. localCheckpointed: every join in
    this module consumes it several times (sizes, frequencies, the
    prefix window, both verify sides) and one materialization beats
    re-tokenizing the corpus per consumer."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(word_shingles(F.col(text_col)))
            ).alias("s"),
        )
        .select("doc_id", shingle_hash(F.col("s")).alias("sh"))
        .localCheckpoint(eager=False)
    )


def prefix_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    t_num: int = 4,
    t_den: int = 5,
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= t_num/t_den — EXACT and
    COMPLETE (see module docstring). Returns
    (doc_a, doc_b, n_common, jaccard)."""
    if not (0 < t_num < t_den):
        raise ValueError("threshold must satisfy 0 < t_num/t_den < 1")
    sh = _hashed_shingles(docs, text_col, id_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("n_df"))
    win = Window.partitionBy("doc_id").orderBy("n_df", "sh")
    ranked = (
        sh.join(dfreq, "sh")
        .withColumn("rn", F.row_number().over(win))
        .join(sizes, "doc_id")
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("n_sh") - _ceil_frac("n_sh", t_num, t_den) + 1
    ).select("doc_id", "sh", "n_sh")
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"), "sh", F.col("n_sh").alias("na")
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"), "sh", F.col("n_sh").alias("nb")
    )
    cand = (
        pa.join(pb, "sh")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("nb") >= _ceil_frac("na", t_num, t_den))
            & (F.col("na") >= _ceil_frac("nb", t_num, t_den))
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.min("na").alias("na"), F.min("nb").alias("nb"))
    )
    common = (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_a"), "sh"), "doc_a"
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "sh"),
            ["doc_b", "sh"],
        )
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    union_sz = F.col("na") + F.col("nb") - F.col("n_common")
    return common.filter(
        F.col("n_common") * t_den >= t_num * union_sz
    ).select(
        "doc_a",
        "doc_b",
        "n_common",
        F.round(F.col("n_common").cast("double") / union_sz, 6).alias(
            "jaccard"
        ),
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    t_num: int = 9,
    t_den: int = 10,
) -> DataFrame:
    """All pairs where the SMALLER document's shingle set is >= t
    contained in the other: |A ∩ B| >= t · min(|A|, |B|) — the
    quote/subset detector. Jaccard misses exactly these pairs when
    sizes are skewed (an article quoted whole inside a larger page has
    J ≈ |small|/|large| — arbitrarily low — at containment 1.0), and
    web corpora are full of them.

    Completeness uses the prefix filter on the SMALLER side only: if
    the smaller set x has overlap >= t·|x| with y, missing all of x's
    first |x| − ⌈t·|x|⌉ + 1 rarest shingles would cap the overlap at
    ⌈t·|x|⌉ − 1 < t·|x| — so x's prefix must hit y SOMEWHERE, and the
    candidate join runs prefix(x) against the FULL index. Rarest-first
    ordering keeps the fan-out bounded: a prefix shingle's postings
    list is short by construction. Orientation is normalized to
    (doc_small, doc_large) by (set size, id), so each pair appears
    once. Threshold arithmetic is rational/integer, as in
    ``prefix_jaccard_pairs``.

    Returns (doc_small, doc_large, n_common, containment)."""
    if not (0 < t_num <= t_den):
        raise ValueError("threshold must satisfy 0 < t_num/t_den <= 1")
    sh = _hashed_shingles(docs, text_col, id_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("n_df"))
    win = Window.partitionBy("doc_id").orderBy("n_df", "sh")
    ranked = (
        sh.join(dfreq, "sh")
        .withColumn("rn", F.row_number().over(win))
        .join(sizes, "doc_id")
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("n_sh") - _ceil_frac("n_sh", t_num, t_den) + 1
    ).select(
        F.col("doc_id").alias("doc_small"),
        "sh",
        F.col("n_sh").alias("n_small"),
    )
    full = sh.join(sizes, "doc_id").select(
        F.col("doc_id").alias("doc_large"),
        "sh",
        F.col("n_sh").alias("n_large"),
    )
    # smaller side = prefix side, oriented by (size, id); ties by id
    cand = (
        prefix.join(full, "sh")
        .filter(
            (F.col("n_small") < F.col("n_large"))
            | (
                (F.col("n_small") == F.col("n_large"))
                & (F.col("doc_small") < F.col("doc_large"))
            )
        )
        .groupBy("doc_small", "doc_large")
        .agg(F.min("n_small").alias("n_small"))
    )
    common = (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_small"), "sh"),
            "doc_small",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_large"), "sh"),
            ["doc_large", "sh"],
        )
        .groupBy("doc_small", "doc_large", "n_small")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return common.filter(
        F.col("n_common") * t_den >= t_num * F.col("n_small")
    ).select(
        "doc_small",
        "doc_large",
        "n_common",
        F.round(
            F.col("n_common").cast("double") / F.col("n_small"), 6
        ).alias("containment"),
    )
