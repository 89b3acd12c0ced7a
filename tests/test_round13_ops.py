"""Round-13 optimization equivalence tests: the pretrained-index path
(``centroids_raw`` / ``codebooks`` / ``res_codebooks`` passed into the
ANN operators, as the shared model fixtures in plans/fixtures.py do)
must produce BIT-IDENTICAL results to the inline-training path it
replaces — the operators' training is deterministic, so handing the
trained artifact back in can only change the number of Spark jobs,
never a row."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_topk_pretrained_centroids_identical(spark):
    from asritha_metamorphetl_spark.operators.similarity import (
        ivf_topk,
        ivf_train_centroids,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(300)
    q = emb.filter(F.col("vec_id") < 3)
    kw = dict(k=5, nlist=8, nprobe=3, refine_iters=2)
    inline = ivf_topk(emb, q, "vec_id", "embedding", **kw)
    C = ivf_train_centroids(
        emb, "vec_id", "embedding", nlist=8, refine_iters=2
    )
    pre = ivf_topk(emb, q, "vec_id", "embedding", **kw, centroids_raw=C)
    assert _rows(inline) == _rows(pre)


def test_pq_adc_topk_pretrained_books_identical(spark):
    from asritha_metamorphetl_spark.operators.similarity import (
        pq_adc_topk,
        pq_train_codebooks,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(300)
    q = emb.filter(F.col("vec_id") < 3)
    kw = dict(k=5, m=4, ncodes=8, refine_iters=1, shortlist=40)
    inline = pq_adc_topk(emb, q, "vec_id", "embedding", **kw)
    B = pq_train_codebooks(
        emb, "embedding", "vec_id", m=4, ncodes=8, refine_iters=1
    )
    pre = pq_adc_topk(emb, q, "vec_id", "embedding", **kw, codebooks=B)
    assert _rows(inline) == _rows(pre)


def test_ivfpq_topk_pretrained_models_identical(spark):
    from asritha_metamorphetl_spark.operators.similarity import (
        ivf_train_centroids,
        ivfpq_topk,
        pq_train_codebooks,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(300)
    q = emb.filter(F.col("vec_id") < 3)
    kw = dict(
        k=5, nlist=8, nprobe=3, ivf_refine_iters=1,
        m=4, ncodes=8, pq_refine_iters=1, shortlist=40,
    )
    inline = ivfpq_topk(emb, q, "vec_id", "embedding", **kw)
    C = ivf_train_centroids(
        emb, "vec_id", "embedding", nlist=8, refine_iters=1
    )
    B = pq_train_codebooks(
        emb, "embedding", "vec_id", m=4, ncodes=8, refine_iters=1
    )
    pre = ivfpq_topk(
        emb, q, "vec_id", "embedding", **kw, centroids_raw=C, codebooks=B
    )
    assert _rows(inline) == _rows(pre)


def test_ivfpq_residual_pretrained_models_identical(spark):
    from asritha_metamorphetl_spark.operators.similarity import (
        ivf_train_centroids,
        ivfpq_residual_topk,
        ivfpq_residual_train_books,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(300)
    q = emb.filter(F.col("vec_id") < 3)
    kw = dict(
        k=5, nlist=8, nprobe=3, ivf_refine_iters=1,
        m=4, ncodes=8, pq_refine_iters=1, shortlist=40,
    )
    inline = ivfpq_residual_topk(emb, q, "vec_id", "embedding", **kw)
    C = ivf_train_centroids(
        emb, "vec_id", "embedding", nlist=8, refine_iters=1
    )
    RB = ivfpq_residual_train_books(
        emb, "vec_id", "embedding", centroids_raw=C, m=4, ncodes=8,
        refine_iters=1,
    )
    pre = ivfpq_residual_topk(
        emb, q, "vec_id", "embedding", **kw,
        centroids_raw=C, res_codebooks=RB,
    )
    assert _rows(inline) == _rows(pre)


def test_profile_table_hash_aggregates_no_sort(spark):
    """The round-13 profiler split: string-kind min/max move to a
    keyless side aggregate so the main multi-distinct Expand pipeline
    hash-aggregates — the plan must contain NO standalone Sort node
    (the old shape sort-aggregated the expanded frame three times),
    and the values must match a naive per-column computation."""
    from pyspark.sql import functions as F

    from asritha_metamorphetl_spark.operators.profile import profile_table

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    specs = [
        ("o_orderkey", "int"),
        ("o_orderstatus", "str"),
        ("o_totalprice", "cents"),
    ]
    prof = profile_table(orders, specs)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Sort " not in plan.replace("SortAggregate", "XAggregate"), plan
    got = {r["column"]: r.asDict() for r in prof.collect()}
    n = orders.count()
    for col, kind in specs:
        row = got[col]
        assert row["n_rows"] == n
        assert row["n_nulls"] == orders.filter(F.col(col).isNull()).count()
        assert row["n_distinct"] == orders.select(col).distinct().count()
    assert got["o_orderstatus"]["min_repr"] == orders.agg(
        F.min("o_orderstatus")
    ).first()[0]
    assert got["o_totalprice"]["max_repr"] == str(
        orders.agg(
            F.max(F.round(F.col("o_totalprice") * 100).cast("long"))
        ).first()[0]
    )


def test_model_fixture_memo_builds_once(spark, tmp_path, monkeypatch):
    """The _cached_model memo must build once per (session, sf, label)
    and attribute the build in FIXTURE_BUILD_LOG."""
    import numpy as np

    from asritha_metamorphetl_spark import session as S
    from asritha_metamorphetl_spark.plans import fixtures as FX

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return np.ones((2, 2))

    label = "test_model_memo"
    a = FX._cached_model(spark, label, str(tmp_path), build)
    b = FX._cached_model(spark, label, str(tmp_path), build)
    assert calls["n"] == 1
    assert a is b
    tag = tmp_path.name
    assert f"{label}@{tag}" in S.FIXTURE_BUILD_LOG
    assert "seconds" in S.FIXTURE_BUILD_LOG[f"{label}@{tag}"]
