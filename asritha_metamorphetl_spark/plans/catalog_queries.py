"""Driver-visible query catalog (grows with every implemented operator).

Each ``@register`` pairs a Spark plan with its DuckDB oracle SQL — this is
the operator-coverage surface the correctness gate checks (SURVEY.md §2).
"""

from __future__ import annotations

from asritha_metamorphetl_spark.pipelines import customer_sales_report as _csr
from asritha_metamorphetl_spark.pipelines import product_performance as _pp
from asritha_metamorphetl_spark.pipelines import supplier_performance as _sp
from asritha_metamorphetl_spark.plans.registry import register

register("supplier_performance", oracle=_sp.ORACLE_SQL)(_sp.supplier_performance)
register("product_performance", oracle=_pp.ORACLE_SQL)(_pp.product_performance)
register("customer_sales_report", oracle=_csr.ORACLE_SQL)(_csr.customer_sales_report)
