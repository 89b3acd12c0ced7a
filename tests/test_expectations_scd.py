"""Expectation-suite and SCD2 merge tests."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest


def test_expectations_single_pass_counts(spark):
    from asritha_metamorphetl_spark.quality.expectations import (
        expect_accepted_values,
        expect_between,
        expect_not_null,
        expect_regex,
        expect_unique,
        validate,
    )

    df = spark.createDataFrame(
        [
            (1, "O", 10.0, "1-URGENT"),
            (2, "O", -5.0, "2-HIGH"),
            (2, "X", 3.0, "bad"),
            (None, "F", None, "5-LOW"),
        ],
        "id int, status string, amount double, prio string",
    )
    rules = [
        expect_not_null("id"),
        expect_accepted_values("status", ["O", "F", "P"]),
        expect_between("amount", 0, 100),
        expect_regex("prio", "^[1-5]-"),
        expect_unique(["id"]),
    ]
    got = {r.rule: r.violations for r in validate(df, rules).collect()}
    assert got == {
        "not_null_id": 1,
        "accepted_values_status": 1,
        "between_amount": 2,  # -5 and NULL
        "regex_prio": 1,
        "unique_id": 1,  # one extra row for id=2
    }


def test_enforce_raises_with_failing_rules(spark):
    from asritha_metamorphetl_spark.quality.expectations import (
        ExpectationError,
        expect_not_null,
        enforce,
    )

    clean = spark.createDataFrame([(1,), (2,)], "id int")
    assert enforce(clean, [expect_not_null("id")]) is clean
    dirty = spark.createDataFrame([(1,), (None,)], "id int")
    with pytest.raises(ExpectationError) as err:
        enforce(dirty, [expect_not_null("id")])
    assert err.value.failures == {"not_null_id": 1}


@pytest.fixture()
def dim_v1(spark):
    from asritha_metamorphetl_spark.operators.scd import scd2_init

    updates = spark.createDataFrame(
        [(1, "alice", "NY"), (2, "bob", "LA"), (3, "carol", None)],
        "id int, name string, city string",
    )
    return scd2_init(updates, dt.date(2026, 1, 1))


def test_scd2_versions_only_changed_rows(spark, dim_v1):
    from asritha_metamorphetl_spark.operators.scd import scd2_apply

    batch2 = spark.createDataFrame(
        [
            (1, "alice", "SF"),     # city change → new version
            (2, "bob", "LA"),       # unchanged → untouched
            (3, "carol", "CHI"),    # NULL→value → new version (null-safe)
            (4, "dave", "DC"),      # brand-new key
        ],
        "id int, name string, city string",
    )
    out = scd2_apply(
        dim_v1, batch2, ["id"], ["name", "city"], dt.date(2026, 2, 1)
    )
    rows = sorted(
        out.collect(), key=lambda r: (r.id, r.effective_from)
    )
    # 3 v1 rows + 3 new versions (1, 3 changed; 4 new) = 6, bob stays at 1 row
    assert len(rows) == 6
    current = {r.id: r for r in rows if r.is_current}
    assert set(current) == {1, 2, 3, 4}
    assert current[1].city == "SF" and current[3].city == "CHI"
    closed = [r for r in rows if not r.is_current]
    assert {r.id for r in closed} == {1, 3}
    for r in closed:
        assert r.effective_to == dt.date(2026, 2, 1)
    # exactly one current row per key, version intervals never overlap
    for rid in {1, 3}:
        versions = [r for r in rows if r.id == rid]
        assert versions[0].effective_to == versions[1].effective_from


def test_scd2_idempotent_on_unchanged_batch(spark, dim_v1):
    from asritha_metamorphetl_spark.operators.scd import scd2_apply

    same = dim_v1.select("id", "name", "city")
    out = scd2_apply(dim_v1, same, ["id"], ["name", "city"], dt.date(2026, 3, 1))
    assert out.count() == 3
    assert out.filter(~F.col("is_current")).count() == 0


def test_expectations_empty_frame_reports_zero(spark):
    """Aggregates over an empty frame return NULL — the suite must report
    0 violations, not silently produce NULLs that read as passes."""
    from asritha_metamorphetl_spark.quality.expectations import (
        expect_not_null,
        expect_unique,
        validate,
    )

    empty = spark.createDataFrame([], "id int, v string")
    got = {
        r.rule: r.violations
        for r in validate(
            empty, [expect_not_null("id"), expect_unique(["id"])]
        ).collect()
    }
    assert got == {"not_null_id": 0, "unique_id": 0}


def test_expect_unique_null_keys_match_sql_twin(spark):
    """Engine and the documented SQL-twin spelling must agree on NULL
    keys: struct-wrapped countDistinct counts the NULL tuple, so two
    NULL-keyed rows are ONE duplicate, not two."""
    import duckdb

    from asritha_metamorphetl_spark.quality.expectations import (
        expect_unique,
        validate,
    )

    df = spark.createDataFrame(
        [(1,), (1,), (None,), (None,), (2,)], "k int"
    )
    got = {r.rule: r.violations for r in validate(df, [expect_unique(["k"])]).collect()}
    want = duckdb.sql(
        "SELECT COUNT(*) - COUNT(DISTINCT ROW(k)) AS v"
        " FROM (VALUES (1),(1),(NULL),(NULL),(2)) t(k)"
    ).fetchone()[0]
    assert got["unique_k"] == want == 2


def test_scd2_asof_join_selects_version_valid_at_fact_time(spark):
    """Each fact gets the bracket covering its own timestamp; facts
    before all versions drop on inner / null on left."""
    import datetime as dt

    from pyspark.sql import Row

    from asritha_metamorphetl_spark.operators.scd import scd2_asof_join

    d = dt.date
    dim = spark.createDataFrame(
        [
            Row(k=1, attr="old", effective_from=d(2020, 1, 1),
                effective_to=d(2021, 1, 1), is_current=False),
            Row(k=1, attr="new", effective_from=d(2021, 1, 1),
                effective_to=None, is_current=True),
        ]
    )
    facts = spark.createDataFrame(
        [
            Row(k=1, ts=d(2019, 6, 1), x=1),   # pre-history
            Row(k=1, ts=d(2020, 6, 1), x=2),   # old version
            Row(k=1, ts=d(2021, 1, 1), x=3),   # boundary: new (from <= ts)
            Row(k=1, ts=d(2025, 1, 1), x=4),   # open current version
        ]
    )
    inner = {r.x: r.attr for r in
             scd2_asof_join(facts, dim, ["k"], "ts").collect()}
    assert inner == {2: "old", 3: "new", 4: "new"}
    left = {r.x: r.attr for r in
            scd2_asof_join(facts, dim, ["k"], "ts", how="left").collect()}
    assert left == {1: None, 2: "old", 3: "new", 4: "new"}
