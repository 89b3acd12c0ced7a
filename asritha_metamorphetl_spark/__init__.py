"""asritha_metamorphetl_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference system
Metamorph-ETL/Asritha-MetamorphETL (surveyed in /root/repo/SURVEY.md) as an
idiomatic Spark engine:

- declarative DataFrame/SQL logical plans (Catalyst optimizes; we never
  hand-schedule),
- named "processing node" combinators mirroring the reference's
  SQ_/FIL_/JNR_/AGG_/EXP_ mapping language
  (reference: ETL_Airflow/dags/tasks/m_supplier_performance_task.py:13-177),
- a data-quality module (PK asserts + full reconciliation, reference:
  Raptor wheel Raptor/Raptor.py:478-684) rebuilt on left_anti joins and
  higher-order functions,
- large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal plumbing) designed partition-first for 100 TB.
"""

from asritha_metamorphetl_spark.session import create_session, get_session

__version__ = "0.1.0"

__all__ = ["create_session", "get_session", "__version__"]
