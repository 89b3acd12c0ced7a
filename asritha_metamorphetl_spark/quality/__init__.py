"""Data-quality operators: constraint asserts + dataset reconciliation."""

from asritha_metamorphetl_spark.quality.asserts import DuplicateKeyError, assert_unique
from asritha_metamorphetl_spark.quality.orchestrate import (
    ReconcileRequest,
    ReconcileRun,
    submit_reconciliation,
)
from asritha_metamorphetl_spark.quality.reconcile import ReconcileResult, reconcile

__all__ = [
    "DuplicateKeyError",
    "assert_unique",
    "ReconcileRequest",
    "ReconcileRun",
    "ReconcileResult",
    "reconcile",
    "submit_reconciliation",
]
