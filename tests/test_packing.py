"""Sequence-packing operator: the partitioned prefix sum must equal the
single-partition-window semantics exactly, under any partition count,
including empty and ctx-spanning documents."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.operators.packing import (
    global_running_sum,
    pack_sequences,
)

CTX = 100


@pytest.fixture(scope="module")
def docs(spark):
    # ids deliberately unsorted on arrival; token counts include 0 (empty
    # doc), 1, a ctx-multiple, and a >2·ctx giant that spans 3 sequences.
    rows = [(7, 30), (1, 250), (4, 0), (2, 100), (9, 1), (5, 73), (3, 0)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def _naive(docs):
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return docs.select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("begin_offset"),
    )


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_running_sum_matches_window_any_partitioning(docs, parts):
    got = {
        r["doc_id"]: r["begin_offset"]
        for r in global_running_sum(
            docs, [F.col("doc_id")], F.col("n_tokens"),
            out_col="begin_offset", num_partitions=parts,
        ).collect()
    }
    want = {r["doc_id"]: r["begin_offset"] for r in _naive(docs).collect()}
    assert got == want


def test_pack_sequences_invariants(docs):
    out = pack_sequences(docs, "n_tokens", [F.col("doc_id")], CTX).collect()
    by_id = {r["doc_id"]: r for r in out}

    # Offsets are the exclusive prefix sum in doc_id order.
    running = 0
    for doc_id in sorted(by_id):
        r = by_id[doc_id]
        assert r["begin_offset"] == running
        running += r["n_tokens"]

    for r in out:
        # Sequence range covers exactly the tokens the doc occupies.
        assert r["seq_begin"] == r["begin_offset"] // CTX
        last = r["begin_offset"] + max(r["n_tokens"], 1) - 1
        assert r["seq_end"] == last // CTX
        assert r["n_seqs"] == r["seq_end"] - r["seq_begin"] + 1
        # An empty doc never spans a boundary.
        if r["n_tokens"] == 0:
            assert r["n_seqs"] == 1

    # The 250-token doc at offset 0 spans sequences 0..2.
    giant = by_id[1]
    assert (giant["seq_begin"], giant["seq_end"]) == (0, 2)


def test_adjacent_docs_tile_the_stream(docs):
    """Doc k+1 starts exactly where doc k ends — no gaps, no overlaps."""
    out = sorted(
        pack_sequences(docs, "n_tokens", [F.col("doc_id")], CTX).collect(),
        key=lambda r: r["doc_id"],
    )
    for prev, cur in zip(out, out[1:]):
        assert cur["begin_offset"] == prev["begin_offset"] + prev["n_tokens"]


# ---------------------------------------------------------------------------
# grouped_running_sum: the per-group partitioned prefix sum must equal the
# per-group single-task window exactly, under any partition count.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def grouped_docs(spark):
    # Three sources of very different sizes: a dominant one (the "web"
    # case the distributed shape exists for), a small one, and a
    # singleton; one row with a NULL group key (a window treats NULL as
    # an ordinary group — the operator must too).
    rows = [(i, "web", (i * 37) % 100 + 1) for i in range(200)]
    rows += [(1000 + i, "code", 10 * i + 5) for i in range(7)]
    rows += [(2000, "books", 999), (3000, None, 42)]
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")


def _naive_grouped(docs):
    hk = F.md5(F.col("doc_id").cast("string"))
    w = (
        Window.partitionBy("source")
        .orderBy(hk, "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return docs.select(
        "doc_id",
        "source",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("rb"),
    )


@pytest.mark.parametrize("parts", [1, 4, 32])
def test_grouped_running_sum_matches_window_any_partitioning(
    grouped_docs, parts
):
    from asritha_metamorphetl_spark.operators.packing import grouped_running_sum

    hk_docs = grouped_docs.withColumn(
        "__hk", F.md5(F.col("doc_id").cast("string"))
    )
    got = {
        (r["doc_id"], r["source"]): r["rb"]
        for r in grouped_running_sum(
            hk_docs,
            ["source"],
            [F.col("__hk"), F.col("doc_id")],
            F.col("n_tokens"),
            out_col="rb",
            num_partitions=parts,
        ).collect()
    }
    want = {
        (r["doc_id"], r["source"]): r["rb"]
        for r in _naive_grouped(grouped_docs).collect()
    }
    assert got == want


def test_grouped_running_sum_rejects_unbounded_group_key(spark):
    """The offset collect is O(partitions + groups); a group key with
    unbounded cardinality must raise, never OOM the driver."""
    from asritha_metamorphetl_spark.operators.packing import grouped_running_sum

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.col("id").cast("string").alias("source"),  # unique per row
        F.lit(1).alias("n_tokens"),
    )
    with pytest.raises(ValueError, match="unbounded"):
        grouped_running_sum(
            df,
            ["source"],
            [F.col("doc_id")],
            F.col("n_tokens"),
            num_partitions=4,
            max_groups=50,
        ).collect()


def test_grouped_running_sum_identical_across_evaluations(spark):
    """Regression (r6): the two-pass offset shape must yield identical
    results when the SAME operator runs repeatedly in one session and
    under different partition counts — RangePartitioner's RDD-id-seeded
    boundary sampling made an un-pinned plan nondeterministic across
    evaluations (a whole source once vanished from token_budget_mix)."""
    from pyspark.sql import functions as F

    from asritha_metamorphetl_spark.operators.packing import (
        grouped_running_sum,
    )

    df = spark.range(0, 3000).select(
        F.col("id"),
        (F.col("id") % 7).cast("string").alias("grp"),
        (F.col("id") % 13 + 1).alias("val"),
    )

    def run(parts):
        rows = grouped_running_sum(
            df.repartition(parts),
            ["grp"],
            [F.col("id")],
            F.col("val"),
            out_col="rb",
        ).collect()
        return {r.id: r.rb for r in rows}

    first = run(3)
    for parts in (3, 3, 11):
        assert run(parts) == first
    # spot-check the math on one group
    vals = sorted(
        (i, (i % 13 + 1)) for i in range(0, 3000) if i % 7 == 2
    )
    acc, expect = 0, {}
    for i, v in vals:
        expect[i] = acc
        acc += v
    assert {i: first[i] for i, _ in vals} == expect
