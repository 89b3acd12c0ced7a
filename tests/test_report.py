"""HTML report rendering (reference K4) — bounded, injectable delivery."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_reconcile_report_html(spark):
    from asritha_metamorphetl_spark.quality import reconcile
    from asritha_metamorphetl_spark.report import send_report

    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "id int, v string"
    )
    target = base.withColumn(
        "v", F.when(F.col("id") == 7, "CHANGED").otherwise(F.col("v"))
    ).filter("id != 11")
    r = reconcile(base, target, ["id"])

    sent = {}

    def fake_sender(subject: str, body: str) -> None:
        sent["subject"] = subject
        sent["body"] = body

    html_doc = send_report(r, fake_sender, title="orders recon")
    assert sent["subject"] == "orders recon"
    assert sent["body"] == html_doc
    assert "CHANGED" in html_doc  # the mismatching cell is shown
    assert "Rows only in source" in html_doc
    # bounded rendering: never more than the 15-row cap per table
    assert html_doc.count("<tr>") < 6 * 20
    r.unpersist()
