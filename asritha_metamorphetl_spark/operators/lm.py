"""N-gram language-model quality scoring (CCNet-style perplexity filter).

The standard web-corpus curation step (CCNet, RefinedWeb, Gopher's
downstream filters): train a cheap n-gram LM, score every document,
drop the tails. Re-expressed for Spark at 100 TB:

* **Train** = two map-side-combinable hash aggregates (bigram counts,
  prefix counts). No driver-side model object.
* **Score** = explode each document's bigrams and JOIN against the
  count tables, then re-aggregate per document. The model is DATA, not
  a broadcast blob — at web scale the bigram table is billions of rows
  and a join on the bigram key (hash-partitioned, AQE-skew-handled)
  is the only shape that works. For small models Spark's AQE converts
  the same plan to broadcast joins automatically.

Scores are integer-quantized conditional probabilities (ppm,
``(1e6 * c(w1,w2)) div c(w1)``) rather than float log-probs: the
division is integer math, so Spark and a SQL oracle agree bit-for-bit
and the score is safe to hash-gate in CI. ``avg_ppm`` is monotone in
the geometric-mean-free average conditional probability — low = the
LM finds the document surprising. A production deployment can swap in
``F.log`` of the same joined columns for true log-perplexity; the
plan shape (and everything this module tests) is identical.

Tokenization is whitespace splitting — matching the repo's other text
operators (functions/text.py) and SQL-replicable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PPM = 1_000_000


def doc_bigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode each document into (doc_id, w1, w2) bigram rows via a
    JVM higher-order function — no Python in the loop."""
    toks = docs.select(
        "doc_id", F.split(F.col(text_col), " ").alias("t")
    )
    pairs = F.expr(
        "transform(slice(t, 1, size(t) - 1), (w, i) -> "
        "struct(w AS w1, t[i + 1] AS w2))"
    )
    return (
        toks.select("doc_id", F.explode(pairs).alias("bg"))
        .select("doc_id", "bg.w1", "bg.w2")
    )


def train_bigram_counts(bigrams: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The 'model': (bigram counts, prefix counts). Both are partial-agg
    hash aggregates; prefix counts derive from the bigram table so the
    raw corpus is scanned once."""
    bg = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cbg"))
    prefix = bg.groupBy("w1").agg(F.sum("cbg").alias("cp"))
    return bg, prefix


def score_documents(
    bigrams: DataFrame, bg_counts: DataFrame, prefix_counts: DataFrame
) -> DataFrame:
    """Per-document LM score: join each bigram occurrence to its counts,
    quantize the conditional probability to integer ppm, aggregate.
    Returns (doc_id, n_bigrams, sum_ppm, avg_ppm); low avg_ppm = the
    model is surprised by the document.

    The joins are LEFT outer: a bigram absent from the model scores
    ppm = 0 — maximal surprise — and still counts in ``n_bigrams``.
    (Inner joins would silently DROP unseen bigrams, inflating avg_ppm
    for exactly the out-of-corpus documents a perplexity filter exists
    to catch.) When the model was trained on the scored corpus itself
    every bigram hits, and the left join degenerates to the inner plan
    — same shuffles, no extra cost."""
    scored = (
        bigrams.join(bg_counts, ["w1", "w2"], "left")
        .join(prefix_counts, ["w1"], "left")
        .select(
            "doc_id",
            F.coalesce(
                F.expr(f"({_PPM} * cbg) div cp"), F.lit(0).cast("long")
            ).alias("ppm"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("ppm").alias("sum_ppm"),
        (F.sum("ppm") / F.count(F.lit(1)).cast("double")).alias("avg_ppm"),
    )


def doc_skipgrams(
    docs: DataFrame, text_col: str = "text", window: int = 2
) -> DataFrame:
    """Explode each document into (doc_id, w1, w2, dist) skip-gram
    co-occurrence rows for every distance 1..``window`` — the corpus
    statistic word2vec/GloVe-style embedding training consumes.

    Same JVM higher-order-function shape as ``doc_bigrams``: each
    distance is one ``transform(slice(...))`` over the token array, so
    pair generation happens inside the scan stage with ZERO shuffles —
    the only exchange a consumer pays is its own aggregate. ``slice``
    length is clamped to 0 for documents shorter than the distance."""
    toks = docs.select(
        "doc_id", F.split(F.col(text_col), " ").alias("t")
    )
    per_dist = [
        F.expr(
            f"transform(slice(t, 1, greatest(size(t) - {d}, 0)), "
            f"(w, i) -> struct(w AS w1, t[i + {d}] AS w2, {d} AS dist))"
        )
        for d in range(1, window + 1)
    ]
    allp = per_dist[0] if window == 1 else F.concat(*per_dist)
    return (
        toks.select("doc_id", F.explode(allp).alias("sg"))
        .select("doc_id", "sg.w1", "sg.w2", "sg.dist")
    )


def cooccurrence_counts(
    skipgrams: DataFrame, min_count: int = 1
) -> DataFrame:
    """(w1, w2, dist, n_pairs) corpus co-occurrence table: one
    partial-agg hash aggregate over the skip-gram rows (map-side
    combine does the heavy lifting — frequent pairs collapse before
    the shuffle), thresholded to drop the long noise tail."""
    counts = skipgrams.groupBy("w1", "w2", "dist").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    return counts.filter(F.col("n_pairs") >= min_count)


def pmi_scores(skipgrams: DataFrame, min_count: int = 1) -> DataFrame:
    """Pointwise mutual information over the co-occurrence table —
    the GloVe/feature-association statistic:

        pmi(w1, w2) = ln( c12 * T / (r(w1) * c(w2)) )

    with T the total pair count and r/c the pair-table marginals, all
    derived FROM the aggregated pair counts (the raw corpus is scanned
    once, by ``doc_skipgrams``; everything after is O(vocabulary)).
    The two marginal joins run on the token key — at web scale that is
    a hash join AQE can broadcast when the vocabulary fits, and the
    1-row total attaches as a broadcast nested loop. The log's inputs
    are exact integers, so the rounded (6 dp) score replays in SQL."""
    counts = (
        skipgrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        # FOUR consumers (the filtered output, both marginals, the
        # total) would each re-run the skip-gram explode over the
        # corpus — the dominant scan, paid four times. The pair-count
        # frame is O(vocabulary²) bounded, so materialize it once;
        # localCheckpoint frees its blocks with the plan (same fix as
        # bm25_topk's postings and SemDeDup's assignment frame).
        .localCheckpoint(eager=False)
    )
    r = counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c = counts.groupBy("w2").agg(F.sum("c12").alias("c2"))
    total = counts.agg(F.sum("c12").alias("t"))
    return (
        counts.filter(F.col("c12") >= min_count)
        .join(r, "w1")
        .join(c, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    F.col("c12").cast("double")
                    * F.col("t")
                    / (F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def token_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats) —
    the gibberish detector orthogonal to the repetition ratios: a doc
    of one repeated token scores 0, natural prose sits in a band, and
    random noise maxes out near ln(n_distinct). Computed as
    ``ln(n) − (Σ c·ln c)/n`` so the only float work is one log per
    DISTINCT token per doc, after two hash aggregates keyed by
    (doc, token) and doc — both map-side-combinable, nothing
    corpus-global. Returns (doc_id, n_tokens, n_distinct,
    entropy_nats rounded 6 dp)."""
    uni = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    per_tok = uni.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    return per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log(F.col("c").cast("double")))
            / F.sum("c"),
            6,
        ).alias("entropy_nats"),
    )


# ---------------------------------------------------------------------------
# BPE merge learning (byte-pair encoding, Sennrich et al. 2016)
# ---------------------------------------------------------------------------

def bpe_initial_sequences(
    words: DataFrame, word_col: str = "w", freq_col: str = "freq"
) -> DataFrame:
    """Word-frequency table → canonical BPE symbol sequences.

    A sequence is encoded as ONE string with ``||`` between symbols and
    at both ends (``hello`` → ``||h||e||l||l||o||``). The double-bar
    form makes each merge a plain leftmost non-overlapping string
    ``replace`` — ``|a||b|`` → ``|ab|`` consumes one bar from each side,
    so chained occurrences (``a b a b``) all merge in one pass while a
    symbol can never match INSIDE a neighbor (``xa by`` does not contain
    ``|a||b|``). Both Spark's and the SQL oracle's ``replace`` scan
    leftmost non-overlapping, which is exactly BPE's merge order —
    the semantics are engine-identical by construction."""
    chars = F.expr(f"regexp_extract_all({word_col}, '.', 0)")
    return words.select(
        F.col(freq_col).alias("freq"),
        F.concat(
            F.lit("||"), F.array_join(chars, "||"), F.lit("||")
        ).alias("seq"),
    )


def bpe_pair_counts(seqs: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-symbol pair counts over the current
    sequences: one row-local transform over 1-based symbol indices, one
    aggregate — the vocabulary table is the only thing shuffled, never
    the corpus."""
    syms = F.filter(F.split("seq", "\\|\\|"), lambda x: x != "")
    pairs = F.expr(
        "transform(sequence(1, size(_syms) - 1),"
        " i -> concat(element_at(_syms, i), ' ', element_at(_syms, i + 1)))"
    )
    return (
        seqs.select("freq", syms.alias("_syms"))
        .filter(F.size("_syms") >= 2)
        .select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_learn_merges(
    words: DataFrame,
    steps: int,
    word_col: str = "w",
    freq_col: str = "freq",
) -> list[tuple[int, str, int]]:
    """Learn ``steps`` BPE merges: repeatedly take the most frequent
    adjacent symbol pair (count desc, pair asc — a deterministic,
    SQL-replayable tiebreak) and fuse it everywhere.

    This is how production tokenizers train at corpus scale: the corpus
    is reduced ONCE to a word-frequency table (Zipf-bounded — millions
    of rows for a 100 TB corpus, not trillions), and every iteration
    touches only that table: a row-local pair expansion, one aggregate,
    a TakeOrdered(1) argmax, and a map-side ``replace``. The driver
    round-trips exactly one (pair, count) row per step — the same
    bounded-decision pattern as ``kmeans_step_centroids`` — and each
    merged state is lazily localCheckpoint-ed so step N never re-runs
    steps 1..N-1's replaces from lineage.

    Returns ``[(step, merged_pair, pair_count), ...]``; ``merged_pair``
    is the space-separated pair, e.g. ``('e s')``."""
    seqs = bpe_initial_sequences(words, word_col, freq_col).localCheckpoint(
        eager=False
    )
    out: list[tuple[int, str, int]] = []
    for step in range(1, steps + 1):
        top = (
            bpe_pair_counts(seqs)
            .orderBy(F.col("cnt").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, cnt = top[0]["pair"], int(top[0]["cnt"])
        a, b = pair.split(" ")
        seqs = seqs.select(
            "freq",
            F.replace(
                F.col("seq"), F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|")
            ).alias("seq"),
        ).localCheckpoint(eager=False)
        out.append((step, pair, cnt))
    return out
