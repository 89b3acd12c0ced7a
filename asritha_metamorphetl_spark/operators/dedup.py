"""Deduplication operators for training-data pipelines.

Four strategies, all partition-parallel (no global windows, no driver-side
loops) — the scale path is the shuffle on content keys:

- exact_duplicates: hash-groupBy on normalized text. One shuffle keyed by
  the fingerprint; at 100 TB this is the cheapest possible dedup.
- minhash_lsh_pairs: shingle → MinHash signature → LSH band bucket join.
  Cost is linear in corpus size (each doc emits BANDS bucket keys); the
  self-join happens per bucket, never all-pairs.
- simhash buckets: 16-bit SimHash as a cheap near-dup blocking key.
- ngram_jaccard_pairs: exact Jaccard via an inverted shingle index —
  the verification stage behind MinHash candidates; a document-frequency
  cap drops stop-shingles so bucket joins cannot quadratically explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.functions import hashing as H
from asritha_metamorphetl_spark.functions.text import fingerprint, winnow_fingerprints


def _spread(df: DataFrame) -> DataFrame:
    """Ensure at least default-parallelism partitions before heavy per-row
    hashing. A small parquet (one input split) would otherwise run the
    whole shingle/hash pipeline serially on one core — measured 8.6 s vs
    0.4 s on the sf0.1 documents table. On a real cluster with many input
    splits this is a no-op; the repartition shuffle only triggers when the
    scan under-parallelizes, and it also seeds an exchange both sides of
    the LSH self-join can reuse (ReusedExchange) instead of recomputing
    the signature pipeline twice."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_duplicates(
    df: DataFrame, text_col: str, id_col: str, member_cap: int = 20
) -> DataFrame:
    """Groups of byte-identical documents: (fingerprint, canonical_id,
    n_dupes, member_ids). Canonical = min id (deterministic survivor).

    ``member_ids`` is a SAMPLE — the ``member_cap`` smallest ids of the
    group. An uncapped ``collect_list`` concentrates a pathological dup
    cluster (boilerplate / empty docs) into one task's aggregation
    buffer; here membership is ranked with a window over the fingerprint
    partition (sort-based, spills to disk instead of OOMing) and only
    the first ``member_cap`` rows reach the list aggregate, so per-group
    state is bounded no matter how degenerate the cluster. ``n_dupes``
    still counts the FULL group. One exchange total: the window's
    hash-partitioning on fp is reused by the groupBy."""
    from pyspark.sql import Window

    fps = df.select(
        F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fp")
    )
    w_rank = Window.partitionBy("fp").orderBy("doc_id")
    w_group = Window.partitionBy("fp")
    staged = fps.select(
        "fp",
        "doc_id",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_group).alias("n_all"),
    ).filter((F.col("n_all") > 1) & (F.col("rn") <= member_cap))
    return staged.groupBy("fp").agg(
        F.min("doc_id").alias("canonical_id"),
        F.max("n_all").alias("n_dupes"),
        F.sort_array(F.collect_list("doc_id")).alias("member_ids"),
    )


def lsh_banded(
    df: DataFrame,
    text_col: str,
    id_col: str,
    spread: bool = True,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, band_key) LSH band rows: shingle → MinHash signature →
    exploded band keys. The shared front half of every MinHash dedup
    variant (self-join, incremental, cross-split). At 100 TB this frame
    is what you PERSIST for the base corpus — bucketed by band_key — so
    incremental batches only compute signatures for the delta.

    ``spread=False`` skips the under-parallelization repartition: right
    for streaming MICRO-BATCH callers (the ingest-dedup fold), where the
    batch is small by contract, its parallelism is the source's concern,
    and the repartition shuffle + per-core task overhead would dominate
    the actual hashing. Band-row CONTENT is identical either way.

    ``carry_cols`` names extra input columns to ride through unchanged
    next to (doc_id, band_key) — e.g. a base/delta flag, so a caller
    that needs flagged band rows can band ONE frame instead of banding
    each flag class separately (r14: the incremental pair join)."""
    carry = [F.col(c) for c in carry_cols]
    staged = _spread(df) if spread else df
    shingled = staged.select(
        F.col(id_col).alias("doc_id"),
        *carry,
        H.word_shingles(F.col(text_col)).alias("sh"),
    ).filter(F.size("sh") > 0)
    # Stage the md5 hashes as their own column so the 12 signature mins
    # reuse them (HOFs get no codegen CSE — an inline expression would
    # re-run md5 per signature row).
    hashed = shingled.select(
        "doc_id", *carry, H.hashed48(F.col("sh")).alias("hv")
    )
    sig = hashed.select(
        "doc_id", *carry, *H.minhash_signature(F.col("hv"))
    )
    return sig.select(
        "doc_id",
        *carry,
        F.explode(
            H.lsh_band_keys([F.col(f"mh_{i}") for i in range(H.MINHASH_K)])
        ).alias("band_key"),
    )


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Candidate near-duplicate pairs (doc_a < doc_b) via MinHash + LSH
    banding. Pairs collide when any band's signature rows all agree."""
    banded = lsh_banded(df, text_col, id_col)
    # Pin an exchange on the join key: both self-join sides are identical
    # subplans, so ReuseExchange materializes the signature pipeline ONCE
    # and the join consumes the same shuffle output — and hash-partitioning
    # by band_key is exactly what the join needs, so no extra shuffle.
    banded = banded.repartition(F.col("band_key"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(right, "band_key")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash_keys(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, simhash) blocking keys for near-dup clustering."""
    staged = _spread(df).select(
        F.col(id_col).alias("doc_id"),
        H.token_hash_values(F.col(text_col)).alias("tv"),
    )
    return staged.select(
        "doc_id", H.simhash_from_values(F.col("tv")).alias("simhash")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    max_doc_freq: int = 100,
) -> DataFrame:
    """Exact shingle-set Jaccard similarity for pairs sharing ≥1 rare
    shingle. ``max_doc_freq`` drops shingles present in more than that
    many documents (stop-shingles) — without it the inverted-index join
    degenerates to all-pairs on boilerplate text; with it, cost is bounded
    by sum(df_s²) over rare shingles. Deterministic given the cap.
    """
    # Explode the distinct shingle STRINGS, then key the inverted index
    # on xxhash64 of the flat column: the hash runs inside whole-stage
    # codegen over exploded rows (measured ~4× faster than md5+nibble
    # arithmetic inside a higher-order lambda, which is interpreted per
    # element), and the shuffle still moves 8-byte bigint keys. The
    # oracle twin groups on the raw strings — identical output unless
    # xxhash64 collides within the corpus's shingle set (~|S|²/2⁶⁵;
    # immaterial even at 100 TB shingle cardinality).
    shingles = (
        _spread(df).select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(H.word_shingles(F.col(text_col)))
            ).alias("sh_str"),
        )
    ).select("doc_id", F.xxhash64("sh_str").alias("s"))
    # Four consumers (sizes, rare, both join sides) sit on this frame; an
    # exchange keyed on the shingle makes them all ReuseExchange the one
    # materialized hash pipeline instead of recomputing it per consumer —
    # and it pre-partitions for the groupBy(s) and the index join.
    shingles = shingles.repartition(F.col("s"))
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))

    # df_s == 1 shingles can never produce a pair (the self-join would
    # only match a row to itself) — dropping them shrinks the join input
    # without changing any output row. Result-identical to the SQL twin,
    # which keeps them and filters a=b pairs later.
    rare = (
        shingles.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df_s"))
        .filter((F.col("df_s") > 1) & (F.col("df_s") <= max_doc_freq))
        .select("s")
    )
    indexed = shingles.join(rare, "s")

    a = indexed.alias("a")
    b = indexed.alias("b")
    common = (
        a.join(b, "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def winnow_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_common: int = 2,
    max_doc_freq: int = 50,
) -> DataFrame:
    """Near-dup candidates via winnowing fingerprints (see
    functions/text.py): docs sharing ≥ ``min_common`` window-min k-gram
    hashes. Winnowing guarantees any shared run of ≥ k+w−1 chars yields a
    shared fingerprint, so this catches copied PASSAGES (contiguous
    text), complementing MinHash's whole-document set similarity.

    Same inverted-index shape as ngram_jaccard_pairs: one exchange pinned
    on the fingerprint feeds the frequency filter and both self-join
    sides; fingerprints seen once (no pair possible) or in more than
    ``max_doc_freq`` docs (boilerplate) are dropped before the join."""
    fps = _spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(winnow_fingerprints(F.col(text_col))).alias("fp"),
    )
    fps = fps.repartition(F.col("fp"))
    usable = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df_f"))
        .filter((F.col("df_f") >= 2) & (F.col("df_f") <= max_doc_freq))
        .select("fp")
    )
    indexed = fps.join(usable, "fp")
    a = indexed.alias("a")
    b = indexed.alias("b")
    return (
        a.join(b, "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str | None = None,
    threshold: float = 0.45,
    score_decimals: int = 4,
    use_batch_scorer: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, score) with
    rounded cosine >= threshold and id_a < id_b.

    ``block_col`` is the scale lever: with a blocking key (cluster id,
    LSH bucket, shard) pair generation is bounded by the largest block
    (sum of n_b^2), never all-pairs; each block joins independently in
    its own partitions. ``block_col=None`` is the exact small-N path
    (all-pairs within one virtual block) — correct at any size but
    O(n^2), so callers at corpus scale must supply a block key.
    ``operators.similarity.semdedup`` is the self-blocking composition:
    it derives the block key itself (Voronoi cells around deterministic
    seeds) and applies the SemDeDup keep rule on top of this pair
    machinery's shape — reach for it when no natural block key exists.

    Exactness contract: within a block the pairs are EXACT (full cosine
    on every candidate), unlike minhash_lsh_pairs where the signature can
    miss; the filter compares the ROUNDED score so the decision is
    reproducible across engines and partitionings.

    ``use_batch_scorer``: the default (False) scores with the pure-Column
    left-fold cosine, whose summation order is fixed and engine-checkable
    — a score landing within an ulp of the round()/threshold boundary
    still decides identically to a SQL oracle using the same fold. Set
    True for non-oracle hot paths to use the Arrow-batched numpy kernel
    (~10-100x on millions of candidates; its float-sum order may flip
    boundary-straddling scores vs an oracle).
    """
    from asritha_metamorphetl_spark.operators.similarity import (
        _to_double,
        cosine_batch,
        dot,
        l2_norm,
    )

    blocks = [block_col] if block_col is not None else []
    # Norms are per-row, not per-pair: folding them before the self-join
    # is bit-identical to ``cosine`` (same fold, same division shape) but
    # costs O(n) folds instead of O(pairs) — at ~n^2/2 pairs per block
    # that removes two-thirds of the per-pair HOF work.
    side = df.select(
        *blocks,
        F.col(id_col).alias("id"),
        _to_double(F.col(vec_col)).alias("v"),
    ).withColumn("n", l2_norm(F.col("v")))
    a = side.toDF(*blocks, "id_a", "va", "na")
    b = side.toDF(*blocks, "id_b", "vb", "nb")
    joined = (
        a.join(b, on=blocks, how="inner")
        if blocks
        else a.crossJoin(b)
    )
    score = (
        cosine_batch(F.col("va"), F.col("vb"))
        if use_batch_scorer
        else dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    )
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(score, score_decimals).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def duplicated_passage_spans(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal duplicated-passage spans: for each document, the token
    ranges [span_start, span_end] (1-based, inclusive) in which every
    contiguous k-gram (k = SHINGLE_SIZE) occurs in at least ``min_docs``
    distinct documents — the distributed approximation of exact-substring
    deduplication (Lee et al. 2021, arXiv:2107.06499), whose suffix-array
    construction does not distribute while this fixed-length-gram form
    is two shuffles.

    Shape: posexplode grams with their positions (map-side), one hash
    aggregate on the xxhash64 gram key for the document-frequency test
    (collision odds ~|G|²/2⁶⁵ — same argument as ngram_jaccard_pairs),
    one shuffle join back to positions, then a per-document
    gaps-and-islands merge (pos - row_number, windowed by doc) whose
    state is bounded by document length, never corpus size.

    Returns (id_col, span_start, span_end, n_grams).
    """
    from asritha_metamorphetl_spark.functions.hashing import (
        SHINGLE_SIZE,
        word_shingles,
    )

    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(word_shingles(F.col(text_col))).alias("pos0", "s"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        F.xxhash64(F.col("s")).alias("g"),
    )
    dupg = (
        sh.groupBy("g")
        .agg(F.count_distinct(F.col("doc_id")).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("g")
    )
    duppos = sh.join(dupg, "g").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    grp = duppos.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        grp.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + (SHINGLE_SIZE - 1)).cast("bigint").alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(
            F.col("doc_id").alias(id_col),
            "span_start",
            "span_end",
            "n_grams",
        )
    )


def minhash_lsh_pairs_incremental(
    base: DataFrame, delta: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Incremental near-dup candidates: every LSH band collision that
    involves at least one DELTA document — (base, delta) cross pairs
    plus (delta, delta) internal pairs — while base×base is never
    joined. This is the O(delta) dedup path: re-running the full
    self-join over an append-only corpus repays the quadratic base term
    on every batch, but a new batch only needs its pairs against the
    existing corpus and itself (the standard incremental-ingest shape;
    the full-corpus ``minhash_lsh_pairs`` remains the bootstrap).

    Plan shape: the base side contributes its band rows exactly once as
    the probe side of one equi-join on band_key (at scale, a PERSISTED
    band table — see ``lsh_banded`` — bucketed on band_key, making the
    join co-located with zero base shuffle); the delta side is banded
    fresh. No join output row has two base documents by construction,
    not by filter.

    Returns (doc_a, doc_b, pair_type): pair_type 'base_delta' (doc_a is
    the existing document) or 'delta_delta' (doc_a < doc_b).
    """
    # Band ONE flagged union instead of banding base and delta apart
    # (r14): the signature pipeline (shingle → md5 → 12 minhash mins)
    # used to run three times — base once on the union side, delta
    # TWICE (union side + probe side). Flag first, band once, and PIN
    # the flagged band table (a repartition on the join key is not
    # enough: the optimizer pushes the is_new filter below the banding,
    # splitting the subtrees so ReuseExchange never fires). The pinned
    # frame is exactly the artifact production PERSISTS for the corpus
    # (see lsh_banded's docstring); the probe side is the is_new filter
    # over it. Identical pair set — the join condition and
    # forward-pairing filters are untouched.
    flagged = base.select(
        F.col(id_col), F.col(text_col), F.lit(False).alias("is_new")
    ).unionByName(
        delta.select(
            F.col(id_col), F.col(text_col), F.lit(True).alias("is_new")
        )
    )
    banded = lsh_banded(
        flagged, text_col, id_col, carry_cols=("is_new",)
    ).localCheckpoint(eager=False)
    left = banded.alias("l")
    right = banded.filter(F.col("is_new")).alias("r")
    return (
        left.join(right, "band_key")
        .filter(F.col("l.doc_id") != F.col("r.doc_id"))
        # base rows pair with every colliding delta row; delta rows only
        # pair forward (a < b) so each delta-delta pair appears once
        .filter(~F.col("l.is_new") | (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.when(~F.col("l.is_new"), F.lit("base_delta"))
            .otherwise(F.lit("delta_delta"))
            .alias("pair_type"),
        )
        .distinct()
    )


def cross_corpus_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Per-eval-document n-gram contamination against a training corpus
    — the passage-level benchmark-decontamination check (the k-gram
    overlap rule GPT-3/PaLM-style training runs apply before reporting
    eval numbers): an eval document is contaminated where one of its
    contiguous k-grams (k = SHINGLE_SIZE) also occurs anywhere in the
    training split. Whole-document contamination audits
    (``cross_split_contamination``) miss partial quote/paraphrase
    leakage; this catches any shared passage of k tokens.

    Scale shape — the eval side is SMALL by construction (benchmarks vs
    a 100 TB train corpus), so its distinct gram set BROADCASTS into
    the train-side scan: train grams explode map-side and semi-join the
    broadcast eval grams BEFORE any aggregation, so the only shuffled
    train data is the (tiny) hit set; the train corpus itself never
    shuffles. One join back to eval positions, one per-doc aggregate.

    Returns one row per eval document: (id_col, n_grams,
    n_contaminated, contamination_rate, contaminated) — zero-gram
    (short) docs report clean zeros."""
    # Pinned (round 13): ``eg`` feeds BOTH the broadcast gram set and
    # the per-doc hit join — unpinned, the eval-side tokenization
    # (explode + hash over every eval document) computed twice. The
    # eval side is small by construction, so the pin is cheap.
    eg = (
        eval_df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(H.word_shingles(F.col(text_col))).alias("pos0", "s"),
        )
        .select("doc_id", F.xxhash64(F.col("s")).alias("g"))
        .localCheckpoint(eager=False)
    )
    eval_grams = eg.select("g").distinct()
    train_hits = (
        train.select(F.explode(H.word_shingles(F.col(text_col))).alias("s"))
        .select(F.xxhash64(F.col("s")).alias("g"))
        .join(F.broadcast(eval_grams), "g")  # BEFORE distinct: the
        .distinct()  # shuffle carries only grams eval actually contains
    )
    per_doc = eg.join(train_hits.withColumn("_hit", F.lit(1)), "g", "left")
    counts = per_doc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_contaminated"),
    )
    return (
        eval_df.select(F.col(id_col).alias("doc_id"))
        .join(counts, "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0))
            .cast("bigint")
            .alias("n_grams"),
            F.coalesce(F.col("n_contaminated"), F.lit(0))
            .cast("bigint")
            .alias("n_contaminated"),
            F.when(
                F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                F.round(
                    F.coalesce(F.col("n_contaminated"), F.lit(0)).cast(
                        "double"
                    )
                    / F.col("n_grams"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination_rate"),
            (F.coalesce(F.col("n_contaminated"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )
