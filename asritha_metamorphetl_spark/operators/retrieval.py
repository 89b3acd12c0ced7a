"""Keyword retrieval over the document corpus: distributed BM25.

The training-data counterpart of "grep the corpus": rank documents for
keyword queries with the Okapi BM25 weighting (Robertson & Walker 1994)
— the tool a curation team uses to inspect what a filter kept, find
contamination by keyword, or pull topical slices. Everything is JVM
expressions over one inverted-index shuffle; the query set broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.functions import text as T


def matched_postings(toks: DataFrame, terms: DataFrame) -> DataFrame:
    """(doc_id, term, tf) postings for queried terms only: the token
    explode meets the broadcast distinct-term set BEFORE the tf
    aggregation, so the shuffle moves O(matching postings), never
    O(corpus tokens). Split out so the plan gate can pin this shape
    directly (``bm25_topk`` checkpoints the result, which hides the
    Generate branch from the final plan)."""
    distinct_terms = terms.select("term").distinct()
    return (
        toks.select("doc_id", F.explode("t").alias("term"))
        .join(F.broadcast(distinct_terms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    queries: list[tuple[int, list[str]]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    idf_decimals: int = 6,
    score_decimals: int = 4,
) -> DataFrame:
    """Top-k documents per keyword query under BM25.

    Shape at scale: tokens explode map-side and are immediately
    SEMI-JOINED against the broadcast query-term set, so the inverted
    index only ever materializes postings for queried terms — corpus
    text never shuffles, only (doc, term, tf) rows for matching terms.
    Document frequencies and the corpus stats (N, avgdl) are bounded
    aggregates; the per-(query, doc) score is one hash agg keyed by ids.

    Determinism across engines: idf is rounded before weighting and the
    final score before ranking (ties by doc id) — the same rounding
    discipline as every scored operator here, so last-ulp ``ln``
    differences between libm implementations can't reorder results off
    a measure-zero boundary.

    Returns (query_id, doc_id, score, rnk), k rows per query.
    """
    spark = docs.sparkSession
    term_rows = [(qid, t) for qid, terms in queries for t in terms]
    terms = spark.createDataFrame(term_rows, "query_id int, term string")

    toks = docs.select(
        F.col(id_col).alias("doc_id"), T.tokens(F.col(text_col)).alias("t")
    )
    # lens also has two consumers (the stats aggregate and the scored
    # join) and each would re-run the full tokenize; the frame is two
    # narrow columns per doc, so materializing it is far cheaper than a
    # second pass over the corpus text.
    lens = toks.select("doc_id", F.size("t").alias("dl")).localCheckpoint(
        eager=False
    )
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        matched_postings(toks, terms)
        # TWO consumers (dfreq below and the scored join) would each
        # re-run the tokenize+explode+semi-join+agg corpus scan — the
        # dominant cost, paid twice. The postings frame is bounded
        # (queried terms only), so materialize it once; localCheckpoint
        # frees its blocks with the plan, unlike persist. (Same fix as
        # SemDeDup's three-consumer assignment frame.)
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(
        F.count_distinct(F.col("doc_id")).alias("df")
    )
    one_minus_b = 1.0 - b
    k1p1 = k1 + 1.0
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ),
        idf_decimals,
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(one_minus_b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * F.lit(k1p1)) / denom
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(terms), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), score_decimals).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "score", "rnk")
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    on: tuple[str, str] = ("query_id", "doc_id"),
    rank_col: str = "rnk",
    kk: int = 60,
    k: int = 10,
    score_decimals: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of any
    number of per-query ranked lists: ``score = Σ 1/(kk + rank_i)``,
    missing-from-a-list contributes 0. The standard fusion for hybrid
    retrieval — keyword (BM25) and dense (ANN) rankers surface
    different documents, and RRF merges them without score calibration
    because it consumes only RANKS.

    Scale shape: each input is already a top-k list (k rows per query,
    bounded), so the full-outer joins and the final ranking window move
    O(queries · k · lists) rows — never corpus-scale data. Scores are
    rounded before ranking, doc id breaks ties, so fusion is
    deterministic and oracle-replayable like every ranked operator
    here. Returns (on..., rrf_score, rnk), k rows per query.
    """
    if len(ranked_lists) < 2:
        raise ValueError("rrf_fuse needs at least two ranked lists")
    cols = list(on)
    fused = None
    for i, df in enumerate(ranked_lists):
        d = df.select(*cols, F.col(rank_col).alias(f"__r{i}"))
        fused = d if fused is None else fused.join(d, cols, "full_outer")
    score = None
    for i in range(len(ranked_lists)):
        c = F.coalesce(
            F.lit(1.0) / (F.lit(float(kk)) + F.col(f"__r{i}")), F.lit(0.0)
        )
        score = c if score is None else score + c
    w = Window.partitionBy(cols[0]).orderBy(
        F.col("rrf_score").desc(), F.col(cols[1]).asc()
    )
    return (
        fused.select(
            *cols, F.round(score, score_decimals).alias("rrf_score")
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
