"""Mart pipelines re-expressing the reference's DAG tasks Spark-first."""
