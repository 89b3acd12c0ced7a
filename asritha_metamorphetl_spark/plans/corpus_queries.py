"""Corpus-assembly queries: sequence packing and document chunking.

The last mile of a pretraining data pipeline: after dedup/filter/mix,
documents are concatenated into one token stream and chopped into
fixed context-length training sequences (packing), and RAG-style
serving splits each document into overlapping character-window chunks.
Both are manifest computations — pure position arithmetic — so they are
exactly SQL-expressible and every query pairs with a DuckDB oracle.

Scale shape:
- packing needs an exclusive global prefix sum under a total document
  order; ``operators/packing.py`` computes it with one range exchange +
  an O(partitions) driver collect (never a single-partition window).
- chunk expansion is a per-row bounded ``explode(sequence(...))`` — no
  shuffle at all until the caller aggregates.

No counterpart exists in the reference (single-node engine, no
pretraining surface); these extend the README extensions the same way
the dedup/similarity operators do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.functions import text as T
from asritha_metamorphetl_spark.operators.packing import pack_sequences
from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

CTX_LEN = 2048  # tokens per training sequence
CHUNK_LEN = 500  # chars per retrieval chunk
CHUNK_STRIDE = 400  # chars between chunk starts (100-char overlap)

# Exclusive running token total under ORDER BY doc_id — the oracle's
# single-partition window IS the semantics; the Spark side computes the
# identical numbers with the partitioned two-pass plan.
_PACKED_ORACLE_BASE = f"""
WITH toks AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
                AS BIGINT) AS n_tokens
    FROM documents
),
run AS (
    SELECT doc_id, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
                    ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) AS BIGINT) AS begin_offset
    FROM toks
),
packed AS (
    SELECT doc_id, n_tokens, begin_offset,
           CAST(FLOOR(begin_offset / {CTX_LEN}) AS BIGINT) AS seq_begin,
           CAST(FLOOR((begin_offset + GREATEST(n_tokens, 1) - 1)
                      / {CTX_LEN}) AS BIGINT) AS seq_end
    FROM run
)
"""


@register(
    "packed_training_sequences",
    oracle=_PACKED_ORACLE_BASE
    + """
SELECT doc_id, n_tokens, begin_offset, seq_begin, seq_end,
       CAST(seq_end - seq_begin + 1 AS BIGINT) AS n_seqs
FROM packed
""",
)
def packed_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing manifest: each document's global token
    offset and the range of ctx-length sequences it occupies
    (operators/packing.py — range exchange + O(partitions) collect, no
    single-partition window)."""
    docs = Catalog(sf_dir).load(spark, "documents")
    toks = docs.select(
        "doc_id", T.token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    return pack_sequences(toks, "n_tokens", [F.col("doc_id")], CTX_LEN)


@register(
    "packed_sequence_stats",
    oracle=_PACKED_ORACLE_BASE
    + f"""
, spans AS (
    SELECT p.doc_id, p.n_tokens, p.begin_offset,
           unnest(generate_series(p.seq_begin, p.seq_end)) AS seq_id
    FROM packed p
)
SELECT seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN CAST(FLOOR(begin_offset / {CTX_LEN}) AS BIGINT)
                          = seq_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_starting_docs,
       CAST(SUM(GREATEST(
                LEAST((seq_id + 1) * {CTX_LEN}, begin_offset + n_tokens)
                - GREATEST(seq_id * {CTX_LEN}, begin_offset),
                0)) AS BIGINT) AS n_tokens
FROM spans
GROUP BY seq_id
""",
)
def packed_sequence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence view of the packing: document count, documents that
    START inside the sequence, and token occupancy (= ctx_len for every
    interior sequence — the packing invariant). The explode is bounded
    per row by n_seqs, so the expansion is data-proportional, and the
    groupBy is a plain hash agg on seq_id."""
    packed = packed_training_sequences(spark, sf_dir)
    spans = packed.select(
        "doc_id",
        "n_tokens",
        "begin_offset",
        F.explode(F.sequence("seq_begin", "seq_end")).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * CTX_LEN
    seq_hi = (F.col("seq_id") + 1) * CTX_LEN
    overlap = F.greatest(
        F.least(seq_hi, F.col("begin_offset") + F.col("n_tokens"))
        - F.greatest(seq_lo, F.col("begin_offset")),
        F.lit(0),
    )
    starts_here = F.floor(F.col("begin_offset") / CTX_LEN) == F.col("seq_id")
    return spans.groupBy("seq_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(starts_here.cast("int")).cast("bigint").alias("n_starting_docs"),
        F.sum(overlap).cast("bigint").alias("n_tokens"),
    )


@register(
    "doc_chunks",
    oracle=f"""
WITH base AS (
    SELECT doc_id, text, len(text) AS n_chars FROM documents
),
idx AS (
    SELECT doc_id, text, n_chars,
           unnest(generate_series(
               0,
               CAST(FLOOR((GREATEST(n_chars, 1) - 1)
                          / {CHUNK_STRIDE}) AS BIGINT))) AS chunk_idx
    FROM base
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * {CHUNK_STRIDE} AS BIGINT) AS chunk_begin,
       CAST(LEAST({CHUNK_LEN},
                  n_chars - chunk_idx * {CHUNK_STRIDE}) AS BIGINT)
           AS chunk_chars,
       md5(substr(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS BIGINT),
                  {CHUNK_LEN})) AS chunk_sig
FROM idx
""",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping character-window chunk manifest (RAG ingestion):
    chunk index, begin offset, actual length, and the md5 of the chunk
    text (proves byte-identical chunking across engines without
    shipping the text). Pure per-row expansion — explode(sequence) then
    substring, all JVM expressions, zero shuffles."""
    docs = Catalog(sf_dir).load(spark, "documents")
    n_chars = F.length("text")
    last_idx = F.floor((F.greatest(n_chars, F.lit(1)) - 1) / CHUNK_STRIDE).cast(
        "bigint"
    )
    idx = docs.select(
        "doc_id",
        "text",
        n_chars.alias("n_chars"),
        F.explode(F.sequence(F.lit(0).cast("bigint"), last_idx)).alias("chunk_idx"),
    )
    begin = F.col("chunk_idx") * CHUNK_STRIDE
    return idx.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        begin.cast("bigint").alias("chunk_begin"),
        F.least(F.lit(CHUNK_LEN), F.col("n_chars") - begin)
        .cast("bigint")
        .alias("chunk_chars"),
        F.md5(
            F.substring(F.col("text"), (begin + 1).cast("int"), CHUNK_LEN).cast(
                "binary"
            )
        ).alias("chunk_sig"),
    )


# ---------------------------------------------------------------------------
# Corpus vocabulary telemetry: exact heavy hitters under bounded memory
# ---------------------------------------------------------------------------

#: Heavy-hitter share: report every token carrying >= 0.2% of all token
#: occurrences. The Misra-Gries candidate pass uses ceil(1/share)+1
#: counters per task, which PROVABLY supersets this threshold (see
#: operators/frequent.py); the verify pass makes the output exact, so
#: the oracle is the plain GROUP BY ... HAVING.
HH_MIN_SHARE = 0.002


@register(
    "heavy_hitter_tokens",
    oracle=f"""
WITH toks AS (
    SELECT list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents
),
exploded AS (SELECT unnest(t) AS token FROM toks)
SELECT token, COUNT(*) AS freq
FROM exploded
GROUP BY token
HAVING COUNT(*) >= (SELECT CAST(CEIL({HH_MIN_SHARE} * COUNT(*)) AS BIGINT)
                    FROM exploded)
""",
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters with bounded memory: per-partition
    Misra-Gries candidate extraction (O(k) state per task even when the
    vocabulary explodes — the regime where a full GROUP BY shuffles the
    whole token domain) + an exact recount of the broadcast candidate
    set (operators/frequent.py). The two-pass shape is the production
    answer at 100 TB; the result is EXACT, which is why a plain
    GROUP BY/HAVING oracle can check it. The eviction path itself is
    pinned by tests/test_round7_ops.py on a large synthetic
    vocabulary (this fixture's vocabulary is intentionally small)."""
    from asritha_metamorphetl_spark.operators.frequent import heavy_hitters

    docs = Catalog(sf_dir).load(spark, "documents")
    n_tok = docs.agg(
        F.sum(T.token_count(F.col("text"))).cast("bigint")
    ).head()[0]
    exploded = docs.select(F.explode(T.tokens(F.col("text"))).alias("token"))
    return heavy_hitters(
        exploded, "token", F.lit(int(n_tok)), min_share=HH_MIN_SHARE
    )
