"""CLI adapter: list/explain/oracle against the active test session."""

from __future__ import annotations

import pytest

from asritha_metamorphetl_spark.__main__ import main
from tests.conftest import SF_CORRECT


def test_cli_list_names_every_registered_query(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    from asritha_metamorphetl_spark.plans.registry import all_queries

    for name in all_queries():
        assert name in out


def test_cli_explain_prints_physical_plan(spark, capsys):
    assert main(["explain", "pricing_summary", "--sf-dir", SF_CORRECT]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "HashAggregate" in out


def test_cli_oracle_verdict_green(spark, capsys):
    assert main(["oracle", "top5_orders", "--sf-dir", SF_CORRECT]) == 0
    assert "hash=True" in capsys.readouterr().out


def test_cli_unknown_query_suggests_names(spark):
    with pytest.raises(SystemExit, match="unknown query"):
        main(["run", "pricing", "--sf-dir", SF_CORRECT])
