"""Bigram-LM scoring: hand-computed ppm values on a four-word corpus."""

from __future__ import annotations

from pyspark.sql import Row

from asritha_metamorphetl_spark.operators.lm import (
    doc_bigrams,
    score_documents,
    train_bigram_counts,
)


def _corpus(spark):
    # bigrams: (a b) x2, (b a) x1, (a c) x1, (b c) x1
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a c"),
            Row(doc_id=2, text="a b c"),
            Row(doc_id=3, text="x"),  # <2 tokens: no bigrams, no score
        ]
    )


def test_bigram_explosion(spark):
    bg = doc_bigrams(_corpus(spark))
    got = sorted((r.doc_id, r.w1, r.w2) for r in bg.collect())
    assert got == [
        (1, "a", "b"), (1, "a", "c"), (1, "b", "a"),
        (2, "a", "b"), (2, "b", "c"),
    ]


def test_scores_match_hand_computation(spark):
    bg = doc_bigrams(_corpus(spark))
    counts, prefix = train_bigram_counts(bg)
    scores = {r.doc_id: r for r in score_documents(bg, counts, prefix).collect()}
    # prefixes: a->3, b->2. ppm: (a,b)=666666, (a,c)=333333, (b,a)=500000, (b,c)=500000
    assert set(scores) == {1, 2}  # doc 3 has no bigrams
    d1, d2 = scores[1], scores[2]
    assert d1.n_bigrams == 3 and d1.sum_ppm == 666666 + 333333 + 500000
    assert d2.n_bigrams == 2 and d2.sum_ppm == 666666 + 500000
    assert d2.avg_ppm == d2.sum_ppm / 2.0
    # doc 1 contains the rarer continuations -> lower average probability
    assert d1.avg_ppm < d2.avg_ppm


def test_unseen_bigrams_penalize_not_vanish(spark):
    """A document whose bigrams are absent from the model must score
    ppm=0 for them (maximal surprise) with n_bigrams counting ALL its
    bigrams — inner-join semantics would drop them and make an
    out-of-corpus document look FLUENT (ADVICE r4)."""
    from pyspark.sql import Row

    from asritha_metamorphetl_spark.operators.lm import (
        doc_bigrams,
        score_documents,
        train_bigram_counts,
    )

    train = spark.createDataFrame(
        [Row(doc_id=1, text="the cat sat"), Row(doc_id=2, text="the cat ran")]
    )
    model_bg, model_prefix = train_bigram_counts(doc_bigrams(train))
    # doc 10: one in-model bigram ("the cat", ppm=1e6) + two unseen
    score_in = spark.createDataFrame(
        [Row(doc_id=10, text="zig zag the cat")]
    )
    out = {
        r.doc_id: r
        for r in score_documents(
            doc_bigrams(score_in), model_bg, model_prefix
        ).collect()
    }
    r = out[10]
    assert r.n_bigrams == 3          # zig-zag, zag-the, the-cat all counted
    assert r.sum_ppm == 1_000_000    # only "the cat" scores; unseen = 0
    assert abs(r.avg_ppm - 1_000_000 / 3) < 1e-9
