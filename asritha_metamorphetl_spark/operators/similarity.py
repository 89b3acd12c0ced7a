"""Similarity search over embedding columns (array<float>).

Two strategies:

- ``brute_force_topk``: exact cosine top-k of every query vector against
  the corpus. The query set broadcasts (it is small by construction); the
  corpus never shuffles — each partition scores its slice and the global
  top-k is a ranking window partitioned BY QUERY, so parallelism = number
  of queries × corpus partitions. This is the correctness baseline.
- ``lsh_bucketed_topk``: random-hyperplane LSH — corpus and queries are
  bucketed by sign-pattern hashes; scoring happens only within matching
  buckets. At 100 TB this turns an O(Q×N) scan into O(Q×bucket) with a
  recall knob (number of hash tables). Hyperplanes derive from a seeded
  deterministic generator, so results are reproducible.

Vector math uses ``zip_with``/``aggregate`` higher-order functions —
JVM-side, no Python in the loop.
"""

from __future__ import annotations

import threading

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def finite_vectors(df: DataFrame, col: str = "embedding") -> DataFrame:
    """FINITE-VECTOR gate (VERDICT r12 directive #6): keep only rows
    whose vector has exclusively finite components AND strictly
    positive norm. Cosine of a zero vector is 0/0, a single NaN
    component contaminates every dot product the row touches, and Inf
    turns residual/centering math into NaN factories (Inf − Inf) —
    degenerate vectors are ingest rot, not queryable content, so the
    similarity/clustering families EXCLUDE them at the scan, mirrored
    verbatim in each oracle via ``finite_vec_where`` (the two must
    never drift). On a clean catalog the gate passes every row, so
    plans and hashes are unchanged; the filter is row-local (scan
    stage, no shuffle) and costs one O(dim) fold per row. Subnormally
    TINY vectors pass on purpose: their norm is positive and double
    math preserves direction, so excluding them would over-filter."""
    v = F.col(col)
    has_nonfinite = F.exists(
        v,
        lambda x: F.isnan(x.cast("double"))
        | (F.abs(x.cast("double")) == F.lit(float("inf"))),
    )
    return df.filter((~has_nonfinite) & (dot(_to_double(v), _to_double(v)) > 0))


def finite_vec_where(col: str = "embedding") -> str:
    """The DuckDB mirror of ``finite_vectors`` — a WHERE-clause body
    (no leading WHERE). Kept beside the engine gate so the pair cannot
    drift: finite components AND positive squared norm, both computed
    in double.

    The norm conjunct is a null-safe element-wise x*x sum rather than
    ``list_dot_product`` — SQL AND does not short-circuit, and DuckDB's
    list_dot_product RAISES on a list containing NULL, so the old form
    crashed every gated oracle on a null-component vector that the
    engine gate merely drops (found by the gate-triple hypothesis fuzz
    in tests/test_round13_plans.py). A NULL component makes the
    isfinite CASE fall to its ELSE 1 branch, so the first conjunct
    already excludes the row; the x*x transform keeps the second
    conjunct evaluable (SUM skips NULL terms) instead of fatal. On
    finite non-null data the two forms are arithmetically identical
    (terms are nonnegative, so summation order cannot flip > 0)."""
    return (
        f"list_aggregate(list_transform({col}, "
        "x -> CASE WHEN isfinite(CAST(x AS DOUBLE)) THEN 0 ELSE 1 END), "
        "'sum') = 0 "
        f"AND COALESCE(list_aggregate(list_transform({col}::DOUBLE[], "
        "x -> x * x), 'sum'), 0) > 0"
    )


_COSINE_UDF_CACHE = None


def cosine_batch(a: Column, b: Column) -> Column:
    """Arrow-batched cosine over two array<double> columns: one stacked
    numpy einsum per batch instead of an interpreted fold per row. Use on
    hot paths scoring millions of candidate pairs; `cosine` (pure HOF)
    stays for plans that must avoid Python workers entirely. Float-sum
    order differs from the fold by ≤1 ulp — both paths round scores
    before any comparison, so downstream decisions are unaffected."""
    global _COSINE_UDF_CACHE
    if _COSINE_UDF_CACHE is None:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
            if len(va) == 0:  # empty Arrow batch — vstack would raise
                return pd.Series([], dtype="float64")
            A = np.vstack(va.to_numpy()).astype(np.float64)
            B = np.vstack(vb.to_numpy()).astype(np.float64)
            num = np.einsum("ij,ij->i", A, B)
            den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            return pd.Series(num / den)

        _COSINE_UDF_CACHE = _cos
    return _COSINE_UDF_CACHE(a, b)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    score_decimals: int = 4,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, score), k rows per query.

    Scores are rounded before ranking so float-epsilon ties resolve by the
    deterministic id tiebreak instead of summation noise — this is what
    makes the result reproducible across engines and partitionings.
    """
    # Norms are per-row, not per-pair: computing them before the join is
    # bit-identical (same fold over the same vector, same division shape
    # as ``cosine``) but does O(Q+N) norm folds instead of O(Q*N).
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", l2_norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", l2_norm(F.col("cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                score_decimals,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — no numpy dependency
    in the plan; reproducible across runs and engines)."""
    state = seed & 0x7FFFFFFF
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append(state / float(1 << 31) * 2.0 - 1.0)
        planes.append(row)
    return planes


def _resolve_mat(m) -> np.ndarray:
    """A centroid argument may be a raw ndarray (tests, tiny nlist) or a
    Spark ``Broadcast`` handle. Broadcasting matters at scale: a closure-
    captured matrix is re-pickled into EVERY task's serialized closure
    (~0.6 GB per task at nlist=100k × dim=768), while a broadcast ships
    once per executor over the torrent protocol and the closure carries
    only the handle."""
    return m.value if hasattr(m, "value") else m


def broadcast_centroids(spark, C: np.ndarray):
    """Explicitly broadcast a centroid matrix for the assignment UDFs.
    All internal call sites (``ivf_topk``/``semdedup``/``lloyd_refine``)
    go through this, so the pandas-UDF closures stay O(1) regardless of
    nlist.

    Lifecycle: loops that finish their action unpersist eagerly (see
    ``lloyd_refine``/``pq_train_codebooks``). Broadcasts captured by a
    RETURNED lazy plan (the ``pq_adc_topk`` encode stage, the
    ``all_pairs_near`` matrix) cannot be unpersisted here — the plan
    hasn't executed yet — so they live until the result DataFrame and
    this handle are garbage-collected, at which point Spark's
    ContextCleaner removes the blocks. Callers invoking these operators
    many times in one session should run each call inside
    ``managed_broadcasts()`` (unpersists every handle minted in the
    scope once the caller's action has run) or drop result references
    and let the ContextCleaner work."""
    return _register_broadcast(
        spark.sparkContext.broadcast(np.ascontiguousarray(C))
    )


#: Innermost-scope stacks of ``managed_broadcasts`` collectors; every
#: broadcast minted by this module registers with the active scope.
#: THREAD-LOCAL: Spark drivers routinely submit jobs from several
#: threads, and a process-global stack would let thread B's scope exit
#: unpersist a broadcast thread A minted for a still-lazy plan.
_BROADCAST_SCOPES = threading.local()


def _collector_stack() -> list:
    stack = getattr(_BROADCAST_SCOPES, "stack", None)
    if stack is None:
        stack = _BROADCAST_SCOPES.stack = []
    return stack


def _register_broadcast(handle):
    stack = _collector_stack()
    if stack:
        stack[-1].append(handle)
    return handle


class managed_broadcasts:
    """Context manager for repeated-invocation sessions: collects every
    Broadcast this module mints inside the scope and unpersists them on
    exit, so N successive ``pq_adc_topk``/``ivf_topk`` calls hold O(1)
    broadcast blocks instead of accumulating N codebooks on the
    executors. RUN THE ACTION INSIDE THE SCOPE — the returned plans
    are lazy, and an unpersisted broadcast re-ships from the driver on
    any later re-execution (correct but slow); pass ``destroy=True``
    only when the results will never be recomputed."""

    def __init__(self, destroy: bool = False):
        self._destroy = destroy
        self.handles: list = []

    def __enter__(self):
        _collector_stack().append(self.handles)
        return self

    def __exit__(self, *exc):
        _collector_stack().pop()
        for h in self.handles:
            try:
                if self._destroy:
                    h.destroy()
                else:
                    h.unpersist()
            except Exception:  # already cleaned by the ContextCleaner
                pass
        return False


def auto_nlist(n_vectors: int, floor: int = 16, ceil: int = 1 << 17) -> int:
    """Size the IVF/SemDeDup cell count from the corpus count:
    ``nlist ≈ √N`` balances the two cost terms — assignment work is
    O(N·nlist) and the within-cell pair test is O(N²/nlist), so √N
    makes both O(N^1.5) (the classic IVF sizing; SemDeDup's paper runs
    the same regime, ~100k clusters for ~10^10 docs). Clamped to
    [floor, ceil] so tiny fixtures keep enough members per cell to test
    anything and the centroid matrix stays broadcastable (~400 MB at
    the ceiling with 768-dim float64)."""
    if n_vectors < 1:
        return floor
    return max(floor, min(ceil, int(round(n_vectors ** 0.5))))


def _coarse_groups(C_norm: np.ndarray, n_coarse: int) -> np.ndarray:
    """Deterministic coarse grouping of fine centroids for two-level
    assignment: the first ``n_coarse`` fine centroids act as coarse
    representatives, and every fine centroid joins the representative
    with the highest rounded cosine (representative index breaks ties) —
    the same rounded-argmax rule as row assignment, so an oracle can
    replay it. Returns group id per fine cell, shape (nlist,)."""
    reps = C_norm[:n_coarse]
    sims = np.round(C_norm @ reps.T, 6)  # (nlist, n_coarse)
    return np.argsort(-sims, axis=1, kind="stable")[:, 0].astype(np.int64)


def _coarse_group_info(C_norm, n_coarse: int):
    """Driver-side, once per operator call: group each fine centroid
    under its best coarse representative (``_coarse_groups``), then lay
    the cell ids out group-contiguously (order + CSR-style starts) so
    the assignment kernels can gather each group's centroid block in
    O(1). Broadcast beside the centroids when a session is available
    (~1 MB at the nlist ceiling) instead of re-pickling into every task
    closure; returns a Broadcast handle or the raw tuple."""
    C_drv = _resolve_mat(C_norm)
    groups = _coarse_groups(C_drv, n_coarse)  # (nlist,)
    order = np.argsort(groups, kind="stable").astype(np.int64)
    counts = np.bincount(groups, minlength=n_coarse)
    starts = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    info = (order, starts)
    spark = None
    try:  # pragma: no cover - session lookup is environment-dependent
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    except Exception:
        spark = None
    if hasattr(C_norm, "value") and spark is not None:
        return _register_broadcast(spark.sparkContext.broadcast(info))
    return info


def _cell_assign_udf(C_norm, n_out: int, n_coarse: int = 0, w_coarse: int = 2):
    """Arrow-batched nearest-cell assignment against row-normalized
    centroid matrix ``C_norm`` (ndarray or Broadcast): one matmul per
    batch, cosine rounded to 6 decimals before the stable argsort so the
    argmax is reproducible across engines (numpy matmul vs a SQL
    oracle's list_cosine_similarity differ in the last ulps; rounding
    plus the cell-index tiebreak pins the assignment).

    ``n_coarse`` > 0 switches to TWO-LEVEL assignment: each row scores
    only the ``n_coarse`` coarse representatives (the first n_coarse
    fine centroids), keeps its ``w_coarse`` best coarse groups, and
    scores JUST the fine centroids belonging to those groups via a
    gathered per-group matmul — per-row fine work is the candidate
    count w·nlist/n_coarse (average), so at n_coarse ≈ √nlist total
    per-row compute is O(√nlist), not the O(nlist) a masked full
    matmul would still pay. The coarse grouping of the fine centroids
    is computed ONCE here on the driver (not per Arrow batch) and
    ships with the centroid broadcast. The winner can differ from the
    flat argmax when the true nearest cell's group isn't probed
    (measured agreement: see ivf_twolevel_agreement); both levels use
    the same rounded-argmax tiebreak rule, so the two-level result is
    deterministic and SQL-replayable. Two-level output arrays hold
    min(n_out, candidate count) cells — only probed-group members are
    ever returned (the flat path always returns n_out)."""
    from pyspark.sql.functions import pandas_udf

    group_info = (
        _coarse_group_info(C_norm, n_coarse) if n_coarse > 0 else None
    )

    @pandas_udf("array<int>")
    def cells(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:  # empty Arrow batch — vstack would raise
            return pd.Series([], dtype="object")
        C = _resolve_mat(C_norm)
        X = np.vstack(vs.to_numpy()).astype(np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), _NORM_FLOOR)
        if n_coarse > 0:
            order, starts = _resolve_mat(group_info)
            reps = C[:n_coarse]
            csims = np.round(X @ reps.T, 6)  # (N, n_coarse)
            topw = np.argsort(-csims, axis=1, kind="stable")[:, :w_coarse]
            # Gathered per-group scoring: for each coarse group, one
            # (rows probing it × group cells) matmul. Per-group top-t
            # then a global (score desc, cell asc) cut is equivalent to
            # the argsort over all candidates: the global top-n_out
            # takes at most n_out members from any single group.
            rows_l: list[np.ndarray] = []
            cells_l: list[np.ndarray] = []
            scores_l: list[np.ndarray] = []
            for g in range(n_coarse):
                cg = order[starts[g]:starts[g + 1]]  # ascending cell ids
                if len(cg) == 0:  # duplicate-centroid degenerate group
                    continue
                ridx = np.nonzero((topw == g).any(axis=1))[0]
                if len(ridx) == 0:
                    continue
                S = np.round(X[ridx] @ C[cg].T, 6)
                t = min(n_out, len(cg))
                # stable argsort + ascending cg = cell-index tiebreak
                part = np.argsort(-S, axis=1, kind="stable")[:, :t]
                rows_l.append(np.repeat(ridx, t))
                cells_l.append(cg[part].ravel())
                scores_l.append(np.take_along_axis(S, part, axis=1).ravel())
            if not rows_l:  # every probed group degenerate-empty
                return pd.Series([np.empty(0, dtype="int32")] * len(X))
            rows = np.concatenate(rows_l)
            cand = np.concatenate(cells_l)
            scs = np.concatenate(scores_l)
            ordx = np.lexsort((cand, -scs, rows))
            rows_s, cells_s = rows[ordx], cand[ordx]
            cuts = np.flatnonzero(np.diff(rows_s)) + 1
            per_row = np.split(cells_s.astype("int32"), cuts)
            row_ids = rows_s[np.concatenate(([0], cuts))] if len(rows_s) else []
            out = [np.empty(0, dtype="int32")] * len(X)
            for rid, grp in zip(row_ids, per_row):
                out[rid] = grp[:n_out]
            return pd.Series(out)
        sims = np.round(X @ C.T, 6)  # (N, nlist)
        # stable argsort: primary = -similarity, tiebreak = cell index,
        # so probe order is deterministic under equal similarity.
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :n_out]
        return pd.Series(list(idx.astype("int32")))

    return cells


#: Zero-division floor for row normalization: the smallest NORMAL
#: float64, not 1e-12 — a 1e-12 floor silently crushed subnormally
#: TINY (but directionally valid) vectors to ~zero similarity, which
#: the double-math oracle does not do (hostile-embedding fixture,
#: class vec_id%29==5: norms ~1e-19 < the old floor). Zero vectors
#: never reach the kernels (finite_vectors gates them out), so the
#: floor only guards a hypothetical ungated caller against 0/0.
_NORM_FLOOR = float(np.finfo(np.float64).tiny)


def _normalize_rows(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), _NORM_FLOOR)


def _cell_sim_udf(
    C_norm, sim_decimals: int = 6, n_coarse: int = 0, w_coarse: int = 2
):
    """Arrow-batched (nearest cell, rounded similarity) assignment — the
    same rounded-matmul-argmax as ``_cell_assign_udf`` (``C_norm`` may
    be an ndarray or a Broadcast), additionally surfacing the winning
    similarity so callers that need both never recompute the cosine
    with a different summation order (which could flip a rounding
    boundary vs the SQL oracle).

    ``n_coarse`` > 0 routes through the same gathered two-level kernel
    as ``_cell_assign_udf`` — per-row work O(n_coarse + w·nlist/
    n_coarse) instead of O(nlist) — with the coarse grouping computed
    once driver-side. The winner (and therefore its csim) can differ
    from the flat argmax when the true cell's group isn't probed; both
    levels keep the rounded-argmax tiebreak, so the result stays
    deterministic. Degenerate rows whose probed groups are all empty
    (duplicate-centroid corner) fall back to cell -1 / csim NaN."""
    from pyspark.sql.functions import pandas_udf

    group_info = (
        _coarse_group_info(C_norm, n_coarse) if n_coarse > 0 else None
    )

    @pandas_udf("struct<cell:int,csim:double>")
    def cell_sim(vs: pd.Series) -> pd.DataFrame:
        if len(vs) == 0:
            return pd.DataFrame({"cell": pd.array([], dtype="int32"),
                                 "csim": pd.array([], dtype="float64")})
        C = _resolve_mat(C_norm)
        X = np.vstack(vs.to_numpy()).astype(np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), _NORM_FLOOR)
        if n_coarse > 0:
            order, starts = _resolve_mat(group_info)
            reps = C[:n_coarse]
            csims = np.round(X @ reps.T, sim_decimals)
            topw = np.argsort(-csims, axis=1, kind="stable")[:, :w_coarse]
            best_cell = np.full(len(X), -1, dtype=np.int64)
            best_sim = np.full(len(X), -np.inf)
            for g in range(n_coarse):
                cg = order[starts[g]:starts[g + 1]]
                if len(cg) == 0:
                    continue
                ridx = np.nonzero((topw == g).any(axis=1))[0]
                if len(ridx) == 0:
                    continue
                S = np.round(X[ridx] @ C[cg].T, sim_decimals)
                top = np.argsort(-S, axis=1, kind="stable")[:, 0]
                s = S[np.arange(len(ridx)), top]
                c = cg[top]
                # keep rule mirrors the stable argsort: higher sim wins;
                # equal sim -> lower cell id wins
                upd = (s > best_sim[ridx]) | (
                    (s == best_sim[ridx]) & (c < best_cell[ridx])
                )
                best_sim[ridx] = np.where(upd, s, best_sim[ridx])
                best_cell[ridx] = np.where(upd, c, best_cell[ridx])
            return pd.DataFrame(
                {
                    "cell": best_cell.astype("int32"),
                    "csim": np.where(
                        np.isfinite(best_sim), best_sim, np.nan
                    ),
                }
            )
        sims = np.round(X @ C.T, sim_decimals)
        idx = np.argsort(-sims, axis=1, kind="stable")[:, 0]
        return pd.DataFrame(
            {
                "cell": idx.astype("int32"),
                "csim": sims[np.arange(len(idx)), idx],
            }
        )

    return cell_sim


def lloyd_refine(
    c_frame: DataFrame, C_raw: np.ndarray, iters: int, mean_decimals: int = 6
) -> np.ndarray:
    """Refine seed centroids with ``iters`` distributed Lloyd iterations.

    Each iteration: assign every corpus vector to its nearest centroid
    (Arrow matmul in the scan stage, no shuffle), recompute each centroid
    as the per-dimension member mean (posexplode → one hash agg keyed by
    (cell, dim) — output is nlist×dim rows, bounded), and collect that to
    the driver. Means are rounded so the refined centroids are identical
    across engines regardless of summation order; cells that lose all
    members keep their previous centroid. Driver state stays
    O(nlist·dim) — never grows with the corpus.

    ``c_frame`` must have an array<double> column ``cv``.
    """
    C_raw = C_raw.copy()
    for _ in range(iters):
        bc = broadcast_centroids(c_frame.sparkSession, _normalize_rows(C_raw))
        assigned = c_frame.withColumn(
            "cell",
            F.element_at(_cell_assign_udf(bc, 1)(F.col("cv")), 1),
        )
        mean_rows = (
            assigned.select("cell", F.posexplode("cv").alias("dim", "val"))
            .groupBy("cell", "dim")
            .agg(F.round(F.avg("val"), mean_decimals).alias("val"))
            .collect()
        )
        bc.unpersist(blocking=False)  # this iteration's blocks are done
        new_C = C_raw.copy()  # empty cells keep their previous centroid
        for r in mean_rows:
            new_C[r["cell"], r["dim"]] = r["val"]
        C_raw = new_C
    return C_raw


def ivf_train_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    nlist: int,
    refine_iters: int = 0,
) -> np.ndarray:
    """Train the IVF centroid matrix and return it RAW (unnormalized):
    deterministic lowest-id seeding + ``refine_iters`` distributed Lloyd
    iterations (``lloyd_refine``). This is the bounded O(nlist·dim)
    driver-state index artifact that ``ivf_topk`` / ``ivfpq_topk`` /
    ``ivfpq_residual_topk`` accept pretrained — in production the index
    is trained once per corpus snapshot and every serve/eval consumer
    loads the artifact instead of re-running the training passes
    (round 13: each training is a seed top-k plus one full corpus pass
    per Lloyd iteration)."""
    cent_rows = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .orderBy("cid")
        .limit(nlist)
        .collect()
    )  # driver-side, bounded O(nlist·dim) — never grows with the corpus
    C_raw = np.vstack([np.asarray(r["cv"], dtype=np.float64) for r in cent_rows])
    if refine_iters > 0:
        c = corpus.select(_to_double(F.col(vec_col)).alias("cv"))
        C_raw = lloyd_refine(c, C_raw, refine_iters)
    return C_raw


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nlist: int | None = 16,
    nprobe: int = 4,
    refine_iters: int = 0,
    score_decimals: int = 4,
    n_coarse: int = 0,
    w_coarse: int = 2,
    centroids_raw: np.ndarray | None = None,
) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) partitioning.
    ``nlist=None`` auto-sizes the cell count to ``auto_nlist(count)``
    ≈ √N (one count job) — the right default when the corpus size is
    unknown at authoring time.

    ``n_coarse`` > 0 opts the corpus AND probe assignment into the
    gathered TWO-LEVEL kernel (O(n_coarse + w·nlist/n_coarse) per row
    instead of O(nlist)) — the paper-regime switch for nlist ≳ 4096,
    where flat assignment compute dominates. It is an approximation of
    the flat argmax (a row whose true cell's coarse group isn't probed
    lands elsewhere), so the registered oracle-exact queries keep the
    flat default; agreement/recall telemetry for the two-level path is
    driver-checked by ``ivf_twolevel_agreement``.

    The corpus is Voronoi-partitioned into ``nlist`` cells around
    centroids seeded from the ``nlist`` lowest-id corpus vectors and then
    refined by ``refine_iters`` distributed Lloyd iterations
    (``lloyd_refine``) — refinement makes the cells a property of the
    data distribution rather than of row ordering. Each corpus vector
    lands in its nearest cell; each query probes its ``nprobe`` nearest
    cells and scores only those members.

    Scale shape: centroid assignment is one Arrow-batched matmul per
    batch inside the scan stage (no shuffle); each Lloyd iteration adds
    one bounded (cell, dim) hash agg; the probe join shuffles by cell id,
    so per-cell work is independent and the all-pairs scan never
    materializes. Recall is tuned by nprobe/nlist/refine_iters (see
    tests/test_llm_ops.py for the measured recall on the fixture).
    """
    if centroids_raw is not None:
        # pretrained artifact: nlist IS its row count — auto_nlist's
        # corpus.count() would be a wasted full-scan job here
        nlist = centroids_raw.shape[0]
    elif nlist is None:
        nlist = auto_nlist(corpus.count())
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    )
    if centroids_raw is None:
        centroids_raw = ivf_train_centroids(
            corpus, id_col, vec_col, nlist=nlist, refine_iters=refine_iters
        )
    C = broadcast_centroids(corpus.sparkSession, _normalize_rows(centroids_raw))

    c = c.withColumn(
        "cell",
        F.element_at(
            _cell_assign_udf(C, 1, n_coarse=n_coarse, w_coarse=w_coarse)(
                F.col("cv")
            ),
            1,
        ),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
    ).withColumn(
        "cell",
        F.explode(
            _cell_assign_udf(C, nprobe, n_coarse=n_coarse, w_coarse=w_coarse)(
                F.col("qv")
            )
        ),
    )

    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), score_decimals).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def semdedup(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    nlist: int | None = 16,
    threshold: float = 0.95,
    sim_decimals: int = 4,
    csim_decimals: int = 6,
    n_coarse: int = 0,
    w_coarse: int = 2,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): cluster the embeddings, then inside each cluster
    drop all but one member of every near-duplicate group — the
    embedding-space complement of MinHash/exact dedup, catching
    paraphrases and templated rewrites that share no n-grams.

    Clustering makes the pairwise comparison tractable at scale: the
    all-pairs test runs only WITHIN a cluster (sum of cluster² work,
    shuffled on the bounded cell id), never across the corpus. Cells
    are Voronoi regions around the ``nlist`` lowest-id vectors — the
    same deterministic seeding as ``ivf_topk`` — and assignment is the
    same Arrow-batched matmul in the scan stage.

    Keep rule (deterministic, SQL-replicable): ``x`` is dropped iff
    some same-cluster ``y`` has ``round(cos(x, y)) >= threshold`` and
    ``(csim_y, y_id) < (csim_x, x_id)`` — i.e. among near-duplicates
    the member FARTHEST from its centroid survives (the paper's
    keep-low-centroid-similarity choice: edge points carry more
    information than cluster-center boilerplate), ids breaking ties.
    Unlike the paper's greedy scan this EXISTS-rule drops every member
    that has any kept-ranked near-duplicate, so chains of duplicates
    collapse slightly more aggressively — but it is order-independent,
    partitioning-independent, and expressible as one self-join + one
    anti-join (no sequential state), which is what makes it both
    scalable and oracle-checkable.

    Returns one row per corpus vector: (id, cell, csim, kept).
    ``nlist=None`` auto-sizes to ``auto_nlist(count)`` ≈ √N — the
    paper's regime (~100k clusters at ~10^10 docs), keeping assignment
    and the within-cell pair test both O(N^1.5). ``n_coarse`` > 0 opts
    the assignment into the gathered two-level kernel (per-row
    O(√nlist) instead of O(nlist) — the further reduction that matters
    at the 100k-cluster ceiling); it approximates the flat argmax, so
    the registered oracle-exact query keeps the flat default."""
    if nlist is None:
        nlist = auto_nlist(corpus.count())
    cent_rows = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .orderBy("cid")
        .limit(nlist)
        .collect()
    )  # bounded O(nlist·dim) driver state, as in ivf_topk
    C_raw = np.vstack([np.asarray(r["cv"], dtype=np.float64) for r in cent_rows])
    C = broadcast_centroids(corpus.sparkSession, _normalize_rows(C_raw))

    assigned = (
        corpus.select(
            F.col(id_col).alias("vid"), _to_double(F.col(vec_col)).alias("v")
        )
        .withColumn(
            "a",
            _cell_sim_udf(
                C, csim_decimals, n_coarse=n_coarse, w_coarse=w_coarse
            )(F.col("v")),
        )
        .select(
            "vid",
            "v",
            F.col("a.cell").alias("cell"),
            F.col("a.csim").alias("csim"),
        )
        # The assignment frame feeds THREE consumers (both pair-join
        # sides and the final anti-join) — without pinning, the scan +
        # Arrow assignment kernel re-runs per consumer (measured 3× the
        # cost locally). localCheckpoint materializes it once; blocks
        # free with the plan, unlike persist.
        .localCheckpoint(eager=False)
    )

    a = assigned.select("cell", F.col("vid").alias("x_id"),
                        F.col("v").alias("xv"), F.col("csim").alias("x_csim"))
    b = assigned.select("cell", F.col("vid").alias("y_id"),
                        F.col("v").alias("yv"), F.col("csim").alias("y_csim"))
    dropped = (
        a.join(b, "cell")
        .filter(F.col("x_id") != F.col("y_id"))
        # Arrow-batched cosine (one einsum per batch) — the interpreted
        # HOF fold was the dominant cost at sum-of-cluster² pairs. Safe
        # vs the oracle: the rounded score feeds only the >= threshold
        # comparison, so a <=1-ulp summation difference only matters for
        # a pair landing exactly on the threshold's rounding boundary
        # (measure zero; same rule as the LSH/embedding dedup paths).
        .filter(
            F.round(cosine_batch(F.col("xv"), F.col("yv")), sim_decimals)
            >= F.lit(threshold)
        )
        .filter(
            (F.col("y_csim") < F.col("x_csim"))
            | (
                (F.col("y_csim") == F.col("x_csim"))
                & (F.col("y_id") < F.col("x_id"))
            )
        )
        .select(F.col("x_id").alias("vid"))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("_d", F.lit(1)), "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            "cell",
            "csim",
            F.col("_d").isNull().alias("kept"),
        )
    )


def _bucket_keys_udf(all_planes, n_planes: int, probe_flips: int = 0):
    """Vectorized sign-pattern bucketing: one Arrow batch → one
    (N × dim) @ (dim × tables·planes) matmul → per-table bucket keys.

    The naive spelling — one ``aggregate(zip_with(...))`` HOF per plane,
    32 of them per row — runs interpreted (HOFs never enter whole-stage
    codegen), which made bucketing the dominant cost of the whole LSH
    pipeline. A pandas UDF turns the same math into a single BLAS matmul
    per batch; this is the sanctioned Python fast path (Arrow transfer,
    ~100× over per-row evaluation), and sign extraction stays fully
    vectorized (bit-weights dot + string concat in numpy).

    ``probe_flips`` > 0 enables multi-probe (query side only): per table,
    also emit the buckets reached by flipping each of the ``probe_flips``
    least-confident bits — the planes with the smallest |projection|,
    where the sign decision was closest to the boundary and a true
    neighbor most plausibly landed on the other side. |projections| are
    rounded to 6 decimals before ranking (plane index breaks ties) so
    probe choice is reproducible across engines."""
    from pyspark.sql.functions import pandas_udf

    M = np.array(
        [p for _, planes in all_planes for p in planes], dtype=np.float64
    )  # (n_tables*n_planes, dim)
    n_tables = len(all_planes)
    weights = 1 << np.arange(n_planes - 1, -1, -1)  # bits → bucket int

    @pandas_udf("array<string>")
    def buckets(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:  # empty Arrow batch — vstack would raise
            return pd.Series([], dtype="object")
        X = np.vstack(vs.to_numpy()).astype(np.float64)  # (N, dim)
        proj = X @ M.T  # (N, tables*planes)
        signs = (proj >= 0).astype(np.int64)
        cols = []
        for t in range(n_tables):
            tp = slice(t * n_planes, (t + 1) * n_planes)
            vals = signs[:, tp] @ weights
            cols.append(np.char.add(f"{t}:", vals.astype(str)))
            if probe_flips > 0:
                # stable argsort on rounded |proj| = least-confident
                # planes first, plane index as tiebreak.
                conf = np.argsort(
                    np.round(np.abs(proj[:, tp]), 6), axis=1, kind="stable"
                )
                for j in range(min(probe_flips, n_planes)):
                    flipped = vals ^ (
                        1 << (n_planes - 1 - conf[:, j])
                    ).astype(np.int64)
                    cols.append(np.char.add(f"{t}:", flipped.astype(str)))
        stacked = np.stack(cols, axis=1)
        return pd.Series(list(stacked))

    return buckets


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 8,
    probe_flips: int = 0,
    score_decimals: int = 4,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Each table hashes a vector to an n_planes-bit sign pattern; candidates
    are corpus rows sharing a bucket with the query in ANY table. Scoring
    and ranking then mirror brute_force_topk over the candidate set.
    ``probe_flips`` > 0 turns on multi-probe: each query additionally
    probes, per table, the buckets reached by flipping its
    ``probe_flips`` least-confident sign bits — recall rises steeply at
    modest candidate growth because the extra probes target exactly the
    boundaries where near neighbors get separated. The corpus side is
    never multi-probed (one bucket per table per corpus row), so the
    corpus index stays the same size.

    Defaults (4 planes × 8 tables) are tuned for low-similarity corpora:
    when true neighbors sit near cosine ≈ 0.3 (e.g. random embeddings),
    each extra plane halves candidate cost but sharply cuts recall —
    measured on the sf0.001 fixture: 8×2 → 0.06 recall, 4×8 → 0.52,
    3×8 → 0.78; multi-probe at 4×8 with 1 flip → 0.86 at 1.6× the
    candidates, 2 flips → 0.96 at 2.0×. Tune per-corpus;
    high-similarity dedup workloads can afford many more planes.
    """

    all_planes = [
        (t, _hyperplanes(dim, n_planes, seed=42 + t)) for t in range(n_tables)
    ]
    bucket_keys = _bucket_keys_udf(all_planes, n_planes)
    query_keys = (
        _bucket_keys_udf(all_planes, n_planes, probe_flips=probe_flips)
        if probe_flips > 0
        else bucket_keys
    )

    from asritha_metamorphetl_spark.operators.dedup import _spread

    c = _spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
    )
    # Bucket frames carry IDs only — the candidate dedup below must never
    # shuffle or compare 64-double arrays.
    c_b = c.select("neighbor_id", F.explode(bucket_keys(F.col("cv"))).alias("bucket"))
    q_b = q.select("query_id", F.explode(query_keys(F.col("qv"))).alias("bucket"))
    pairs = (
        c_b.join(F.broadcast(q_b), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # Re-attach vectors only for surviving candidates, then score.
    scored = (
        pairs.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), score_decimals).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): subspace vector compression + ADC search
# ---------------------------------------------------------------------------


def _pq_assign_udf(B_bc, m: int, subdim: int, dist_decimals: int = 6):
    """Arrow-batched PQ encoding: nearest codeword per subspace under
    rounded squared-L2 distance (``B_bc`` is an (m, ncodes, subdim)
    ndarray or Broadcast handle). One reshaped batch → one broadcasted
    numpy subtraction per subspace block; distances are rounded before
    the argmin so the code choice is reproducible across engines
    (``np.argmin`` returns the FIRST minimum — lowest code wins ties,
    the same ordering a SQL oracle's ``ROW_NUMBER ... ORDER BY d2 ASC,
    code ASC`` replays)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def codes(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:  # empty Arrow batch — vstack would raise
            return pd.Series([], dtype="object")
        B = _resolve_mat(B_bc)  # (m, ncodes, subdim)
        X = np.vstack(vs.to_numpy()).astype(np.float64)
        if X.shape[1] != m * subdim:
            # actionable message instead of an opaque reshape error
            # when a pretrained codebook's subdim disagrees with the
            # corpus vector dim (dim must equal m * subdim)
            raise ValueError(
                f"pq encode: vector dim {X.shape[1]} != m*subdim "
                f"({m}*{subdim}={m * subdim}) — codebook/corpus mismatch"
            )
        X = X.reshape(len(X), m, subdim)
        # d2[n, m, ncodes]: squared L2 between each row-subvector and
        # every codeword of that subspace.
        d2 = ((X[:, :, None, :] - B[None, :, :, :]) ** 2).sum(-1)
        d2 = np.round(d2, dist_decimals)
        idx = np.argmin(d2, axis=2).astype("int32")  # first-min = low code
        return pd.Series(list(idx))

    return codes


def pq_train_codebooks(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    m: int,
    ncodes: int,
    refine_iters: int = 1,
    mean_decimals: int = 6,
) -> np.ndarray:
    """Train per-subspace PQ codebooks, returning (m, ncodes, subdim).

    Seeding is deterministic — the ``ncodes`` lowest-id corpus vectors,
    sliced into ``m`` contiguous subvectors (the same convention as
    ``ivf_topk``'s centroid seeding) — then ``refine_iters`` distributed
    Lloyd iterations refine every subspace IN ONE PASS over the corpus:
    an Arrow-batched encode assigns all m codes per row (no shuffle),
    a posexplode keyed by (subspace, code, dim-within-subspace) computes
    member means in one hash agg whose output is m·ncodes·subdim rows —
    bounded, independent of corpus size — and the driver folds the
    rounded means back into the codebook (empty codes keep their
    previous codeword). Driver state stays O(m·ncodes·subdim).

    At 100 TB you train on a bounded sample (pass ``corpus.limit(...)``
    or a hash-sampled frame) and encode the full corpus with the result;
    the codebooks broadcast explicitly so the encode closure is O(1).
    """
    dim_row = corpus.select(F.size(F.col(vec_col)).alias("d")).head()
    subdim = int(dim_row["d"]) // m
    if subdim * m != int(dim_row["d"]):
        raise ValueError(f"dim {dim_row['d']} not divisible by m={m}")
    seed_rows = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .orderBy("cid")
        .limit(ncodes)
        .collect()
    )  # bounded O(ncodes·dim) driver state
    if len(seed_rows) < ncodes:
        raise ValueError(
            f"pq_train_codebooks: corpus has only {len(seed_rows)} rows but "
            f"ncodes={ncodes} codewords must be seeded from distinct "
            "lowest-id vectors — shrink ncodes or grow the training sample"
        )
    S = np.vstack([np.asarray(r["cv"], dtype=np.float64) for r in seed_rows])
    B = np.ascontiguousarray(S.reshape(ncodes, m, subdim).transpose(1, 0, 2))

    c = corpus.select(_to_double(F.col(vec_col)).alias("cv"))
    for _ in range(refine_iters):
        bc = broadcast_centroids(corpus.sparkSession, B)
        enc = c.withColumn("codes", _pq_assign_udf(bc, m, subdim)(F.col("cv")))
        mean_rows = (
            enc.select("codes", F.posexplode("cv").alias("dim", "val"))
            .withColumn("sub", (F.col("dim") / subdim).cast("int"))
            .withColumn("subpos", F.col("dim") % subdim)
            .withColumn("code", F.element_at("codes", F.col("sub") + 1))
            .groupBy("sub", "code", "subpos")
            .agg(F.round(F.avg("val"), mean_decimals).alias("val"))
            .collect()
        )  # bounded m·ncodes·subdim rows
        bc.unpersist(blocking=False)
        newB = B.copy()  # empty codes keep their previous codeword
        for r in mean_rows:
            newB[r["sub"], r["code"], r["subpos"]] = r["val"]
        B = newB
    return B


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    m: int = 4,
    ncodes: int = 16,
    refine_iters: int = 1,
    shortlist: int = 50,
    dist_decimals: int = 4,
    part_decimals: int = 6,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """Approximate L2 top-k via product quantization with asymmetric
    distance computation (ADC; Jégou et al. 2011, "Product Quantization
    for Nearest Neighbor Search") and exact re-ranking.

    Pipeline: train codebooks (``pq_train_codebooks``), encode every
    corpus vector to ``m`` one-byte codes map-side (Arrow batch against
    the broadcast codebooks — a 100 TB corpus of 768-dim float32 shrinks
    ~384× in the search structure), build one distance lookup table per
    query on the driver (O(Q·m·ncodes·subdim), queries are small by
    construction), and score candidates entirely JVM-side: the ADC
    distance is ``m`` array lookups + adds per row — no Python, no
    per-pair vector math. The ADC shortlist (``shortlist`` per query,
    ranked by rounded ADC distance, id tiebreak) is then re-ranked by
    EXACT squared L2 — the standard production shape, where PQ prunes
    and the exact metric decides.

    Returns (query_id, neighbor_id, dist, rnk): k rows per query,
    ascending exact squared-L2 distance, rounded so ranking is
    reproducible across engines.
    """
    spark = corpus.sparkSession
    if codebooks is None:
        B = pq_train_codebooks(
            corpus, vec_col, id_col, m=m, ncodes=ncodes,
            refine_iters=refine_iters,
        )
    else:
        B = codebooks  # pretrained index artifact (ivf_train_centroids note)
        if B.shape[:2] != (m, ncodes):
            raise ValueError(
                f"pq_adc_topk: pretrained codebooks shaped {B.shape[:2]}, "
                f"expected (m, ncodes)=({m}, {ncodes})"
            )
    subdim = B.shape[2]  # == dim // m; skips the dim-probe head() job

    bc = broadcast_centroids(spark, B)
    enc = corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    ).withColumn("codes", _pq_assign_udf(bc, m, subdim)(F.col("cv")))

    # Per-query LUT: lut[s*ncodes + j] = rounded squared L2 between the
    # query's s-th subvector and codeword j of subspace s. Bounded
    # driver work — queries are small by construction (same contract as
    # brute_force_topk's broadcast side).
    q_rows = (
        queries.select(
            F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
        )
        .collect()
    )
    lut_data = []
    for r in q_rows:
        qv = np.asarray(r["qv"], dtype=np.float64).reshape(m, subdim)
        lut = np.round(
            ((qv[:, None, :] - B) ** 2).sum(-1), part_decimals
        ).reshape(-1)
        lut_data.append((r["query_id"], [float(x) for x in lut], list(r["qv"])))
    # id type follows the input schema — string-keyed corpora must not
    # be forced through a hardcoded long.
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    id_type = queries.schema[id_col].dataType
    lut_df = spark.createDataFrame(
        lut_data,
        StructType(
            [
                StructField("query_id", id_type),
                StructField("lut", ArrayType(DoubleType())),
                StructField("qv", ArrayType(DoubleType())),
            ]
        ),
    )

    # ADC distance: m lookups + adds, pure JVM expressions.
    adc = F.lit(0.0)
    for s in range(m):
        adc = adc + F.element_at(
            "lut", F.element_at("codes", F.lit(s + 1)) + F.lit(s * ncodes + 1)
        )
    cand = (
        enc.crossJoin(F.broadcast(lut_df))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cv",
            "qv",
            F.round(adc, dist_decimals).alias("adc_dist"),
        )
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    short = cand.withColumn("srn", F.row_number().over(w_short)).filter(
        F.col("srn") <= shortlist
    )
    # Exact re-rank on the shortlist only: sequential-fold squared L2
    # (deterministic summation order), rounded before ranking.
    exact = F.round(
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        dist_decimals,
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        short.select("query_id", "neighbor_id", exact.alias("dist"))
        .withColumn("rnk", F.row_number().over(w_k))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "dist", "rnk")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    ivf_refine_iters: int = 1,
    m: int = 4,
    ncodes: int = 16,
    pq_refine_iters: int = 1,
    shortlist: int = 50,
    score_decimals: int = 4,
    part_decimals: int = 6,
    centroids_raw: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ: the production ANN shape at 100 TB — IVF cells ROUTE
    (each query touches only its ``nprobe`` nearest cells' members, so
    the candidate set is ~N·nprobe/nlist, never the corpus), PQ/ADC
    SCORES the candidates from one-byte codes (``m`` lookups + adds per
    candidate, pure JVM — full-precision vectors never move), and the
    exact metric decides on the shortlist re-rank. Composes the two
    registered halves: ``ivf_topk``'s centroid machinery (deterministic
    lowest-id seeding + distributed Lloyd refinement, broadcast
    centroids, Arrow-batched rounded-argmax assignment) and
    ``pq_adc_topk``'s codebook training/encode.

    Metric: cosine end-to-end (Faiss METRIC_INNER_PRODUCT regime). The
    ADC shortlist statistic is the PQ-approximate cosine — per-subspace
    query·codeword inner products and codeword squared norms are both
    per-query/driver-side lookup tables (rounded so an oracle replays
    them), combined as ``Σip / (|q|·√Σnorm²)`` — and the shortlist is
    re-ranked by the EXACT rounded cosine, id tiebreaks throughout.

    Scale shape: one corpus pass encodes cell + codes map-side against
    broadcast centroids/codebooks; the probe join shuffles candidate
    IDS+codes by cell (bounded key domain); the only per-candidate work
    is JVM lookups. ``shortlist`` should grow with the candidate count
    (see plans/ann_queries.py: a fixed depth quietly loses recall as
    the corpus grows).

    Returns (query_id, neighbor_id, score, rnk), k rows per query by
    descending exact cosine.
    """
    spark = corpus.sparkSession
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    )
    if centroids_raw is None:
        centroids_raw = ivf_train_centroids(
            corpus, id_col, vec_col, nlist=nlist, refine_iters=ivf_refine_iters
        )
    elif centroids_raw.shape[0] != nlist:
        # a mismatched artifact would otherwise surface as an opaque
        # reshape error (or silently wrong tables if counts coincide)
        raise ValueError(
            f"ivfpq_topk: pretrained centroids have "
            f"{centroids_raw.shape[0]} rows, expected nlist={nlist}"
        )
    C = broadcast_centroids(spark, _normalize_rows(centroids_raw))

    if codebooks is None:
        codebooks = pq_train_codebooks(
            corpus, vec_col, id_col, m=m, ncodes=ncodes,
            refine_iters=pq_refine_iters,
        )
    elif codebooks.shape[:2] != (m, ncodes):
        raise ValueError(
            f"ivfpq_topk: pretrained codebooks shaped "
            f"{codebooks.shape[:2]}, expected (m, ncodes)=({m}, {ncodes})"
        )
    B = codebooks
    subdim = B.shape[2]  # == dim // m; skips the dim-probe head() job
    bc = broadcast_centroids(spark, B)

    # ONE corpus pass: route (cell) + compress (codes), both map-side.
    enc = c.withColumn(
        "cell", F.element_at(_cell_assign_udf(C, 1)(F.col("cv")), 1)
    ).withColumn("codes", _pq_assign_udf(bc, m, subdim)(F.col("cv")))

    q_rows = (
        queries.select(
            F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
        )
        .collect()
    )  # queries are small by construction (same contract as pq_adc_topk)
    # Per-query lookup tables: ip[s*ncodes+j] = rounded q_s · codeword,
    # nrm[s*ncodes+j] = rounded |codeword|² (query-independent but
    # carried per-row so the scoring expression is uniform lookups).
    nrm = np.round(np.einsum("sjd,sjd->sj", B, B), part_decimals).reshape(-1)
    nrm_list = [float(x) for x in nrm]
    lut_data = []
    for r in q_rows:
        qv = np.asarray(r["qv"], dtype=np.float64)
        ip = np.round(
            np.einsum("sd,sjd->sj", qv.reshape(m, subdim), B), part_decimals
        ).reshape(-1)
        qn = float(np.sqrt(qv @ qv))
        lut_data.append(
            (
                r["query_id"],
                [float(x) for x in ip],
                nrm_list,
                qn,
                [float(x) for x in qv],
            )
        )
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    id_type = queries.schema[id_col].dataType
    lut_df = spark.createDataFrame(
        lut_data,
        StructType(
            [
                StructField("query_id", id_type),
                StructField("ip", ArrayType(DoubleType())),
                StructField("nrm", ArrayType(DoubleType())),
                StructField("qn", DoubleType()),
                StructField("qv", ArrayType(DoubleType())),
            ]
        ),
    )
    probes = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv0")
    ).select(
        "query_id", F.explode(_cell_assign_udf(C, nprobe)(F.col("qv0"))).alias("cell")
    )

    ip_sum = F.lit(0.0)
    nr_sum = F.lit(0.0)
    for s in range(m):
        slot = F.element_at("codes", F.lit(s + 1)) + F.lit(s * ncodes + 1)
        ip_sum = ip_sum + F.element_at("ip", slot)
        nr_sum = nr_sum + F.element_at("nrm", slot)
    cand = (
        enc.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(lut_df), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "cv",
            "qv",
            F.round(
                ip_sum / (F.col("qn") * F.sqrt(nr_sum)), score_decimals
            ).alias("adc_score"),
        )
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    short = cand.withColumn("srn", F.row_number().over(w_short)).filter(
        F.col("srn") <= shortlist
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        short.select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), score_decimals).alias(
                "score"
            ),
        )
        .withColumn("rnk", F.row_number().over(w_k))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def _residual_udf(C_raw_bc):
    """Arrow-batched residual: ``v - centroid_raw[cell]`` per row.
    Exact subtraction against the UNnormalized centroid matrix (seed
    rows are corpus values, refined rows are rounded Lloyd means), so
    an oracle's list arithmetic reproduces it bit-for-bit."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def resid(vs: pd.Series, cells: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        C = _resolve_mat(C_raw_bc)
        X = np.vstack(vs.to_numpy()).astype(np.float64)
        R = X - C[cells.to_numpy().astype(np.int64)]
        return pd.Series(list(R))

    return resid


def ivfpq_residual_train_books(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids_raw: np.ndarray,
    m: int,
    ncodes: int,
    refine_iters: int = 1,
) -> np.ndarray:
    """Train PQ codebooks on the within-cell residuals
    ``v − centroid_raw[cell]`` under pretrained IVF centroids — the
    residual half of the Faiss-style index artifact, exposed so a
    serve/eval pair can train the index ONCE per corpus snapshot
    (see ``ivf_train_centroids``) instead of re-running the
    assignment + residual + Lloyd passes per consumer. Identical
    replay to the inline path in ``ivfpq_residual_topk``: rounded
    cosine cell assignment, exact raw-centroid subtraction, then
    ``pq_train_codebooks`` on the residual frame."""
    spark = corpus.sparkSession
    C = broadcast_centroids(spark, _normalize_rows(centroids_raw))
    C_raw_bc = broadcast_centroids(spark, centroids_raw)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    )
    assigned = (
        c.withColumn(
            "cell", F.element_at(_cell_assign_udf(C, 1)(F.col("cv")), 1)
        )
        .withColumn("rv", _residual_udf(C_raw_bc)(F.col("cv"), F.col("cell")))
        .localCheckpoint(eager=False)
    )
    return pq_train_codebooks(
        assigned.select(F.col("neighbor_id"), F.col("rv")),
        "rv",
        "neighbor_id",
        m=m,
        ncodes=ncodes,
        refine_iters=refine_iters,
    )


def ivfpq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    ivf_refine_iters: int = 1,
    m: int = 4,
    ncodes: int = 16,
    pq_refine_iters: int = 1,
    shortlist: int = 50,
    score_decimals: int = 4,
    part_decimals: int = 6,
    centroids_raw: np.ndarray | None = None,
    res_codebooks: np.ndarray | None = None,
) -> DataFrame:
    """Residual IVF-PQ — the full Faiss-style production shape: PQ
    codebooks train on RESIDUALS ``v - centroid[cell]`` rather than raw
    vectors, so the same code budget quantizes the (much tighter)
    within-cell distribution instead of the whole space; at equal bits
    the ADC statistic is sharper and the shortlist can shrink.

    ADC under the cosine/IP metric decomposes exactly:
    ``q·v̂ = q·c_cell + Σ_s q_s·cw``, and
    ``|v̂|² = |c|² + 2·Σ_s c_s·cw + Σ_s |cw|²`` — so scoring needs,
    besides the per-query subspace IP table, three CORPUS-CONSTANT
    lookup tables: centroid norms (nlist), residual-codeword norms
    (m·ncodes), and the centroid×codeword cross terms
    (nlist·m·ncodes — Faiss's "precomputed tables"; ~0.5 GB at
    nlist=131k/m=16/ncodes=256, a deliberate memory-for-compute trade
    documented there too). Every table entry is rounded so the SQL
    oracle replays the scoring bit-for-bit; the shortlist is re-ranked
    by the EXACT cosine as in ``ivfpq_topk``.

    Scale shape matches ``ivfpq_topk`` (one encode pass, cell-keyed
    probe join, JVM lookup scoring) plus one broadcast of the
    precomputed tables riding the per-query LUT frame."""
    spark = corpus.sparkSession
    if centroids_raw is None:
        centroids_raw = ivf_train_centroids(
            corpus, id_col, vec_col, nlist=nlist, refine_iters=ivf_refine_iters
        )
    elif centroids_raw.shape[0] != nlist:
        # the precomputed-tables reshape below uses the nlist PARAMETER;
        # a mismatched artifact must fail here, loudly, not inside numpy
        raise ValueError(
            f"ivfpq_residual_topk: pretrained centroids have "
            f"{centroids_raw.shape[0]} rows, expected nlist={nlist}"
        )
    C_raw = centroids_raw
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    )
    C = broadcast_centroids(spark, _normalize_rows(C_raw))
    C_raw_bc = broadcast_centroids(spark, C_raw)

    assigned = c.withColumn(
        "cell", F.element_at(_cell_assign_udf(C, 1)(F.col("cv")), 1)
    ).withColumn("rv", _residual_udf(C_raw_bc)(F.col("cv"), F.col("cell")))
    # The residual frame feeds PQ training (a multi-pass consumer) and
    # the encode — pin it so assignment + residual don't recompute per
    # consumer (the SemDeDup/localCheckpoint discipline).
    assigned = assigned.localCheckpoint(eager=False)

    if res_codebooks is None:
        res_codebooks = pq_train_codebooks(
            assigned.select(F.col("neighbor_id"), F.col("rv")),
            "rv",
            "neighbor_id",
            m=m,
            ncodes=ncodes,
            refine_iters=pq_refine_iters,
        )
    elif res_codebooks.shape[:2] != (m, ncodes):
        raise ValueError(
            f"ivfpq_residual_topk: pretrained codebooks shaped "
            f"{res_codebooks.shape[:2]}, expected (m, ncodes)=({m}, {ncodes})"
        )
    B = res_codebooks
    subdim = B.shape[2]  # == dim // m; skips the dim-probe head() job
    bc = broadcast_centroids(spark, B)
    enc = assigned.withColumn(
        "codes", _pq_assign_udf(bc, m, subdim)(F.col("rv"))
    ).select("neighbor_id", "cv", "cell", "codes")

    # Corpus-constant tables (rounded — the oracle recomputes each):
    # qc is per-query; cnorm2 (nlist), rnorm2 (m·ncodes) and the
    # flattened cross table (nlist·m·ncodes) ride every LUT row.
    cnorm2 = np.round(np.einsum("cd,cd->c", C_raw, C_raw), part_decimals)
    rnorm2 = np.round(np.einsum("sjd,sjd->sj", B, B), part_decimals).reshape(-1)
    Csub = C_raw.reshape(nlist, m, subdim)
    cross = np.round(
        np.einsum("csd,sjd->csj", Csub, B), part_decimals
    ).reshape(-1)  # [(cell*m + s)*ncodes + j]
    cnorm2_l = [float(x) for x in cnorm2]
    rnorm2_l = [float(x) for x in rnorm2]
    cross_l = [float(x) for x in cross]

    q_rows = (
        queries.select(
            F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
        )
        .collect()
    )
    lut_data = []
    for r in q_rows:
        qv = np.asarray(r["qv"], dtype=np.float64)
        ip = np.round(
            np.einsum("sd,sjd->sj", qv.reshape(m, subdim), B), part_decimals
        ).reshape(-1)
        qc = np.round(C_raw @ qv, part_decimals)
        qn = float(np.sqrt(qv @ qv))
        lut_data.append(
            (
                r["query_id"],
                [float(x) for x in ip],
                [float(x) for x in qc],
                qn,
                cnorm2_l,
                rnorm2_l,
                cross_l,
                [float(x) for x in qv],
            )
        )
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    id_type = queries.schema[id_col].dataType
    arr = ArrayType(DoubleType())
    lut_df = spark.createDataFrame(
        lut_data,
        StructType(
            [
                StructField("query_id", id_type),
                StructField("ip", arr),
                StructField("qc", arr),
                StructField("qn", DoubleType()),
                StructField("cnorm2", arr),
                StructField("rnorm2", arr),
                StructField("cross", arr),
                StructField("qv", arr),
            ]
        ),
    )
    probes = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv0")
    ).select(
        "query_id", F.explode(_cell_assign_udf(C, nprobe)(F.col("qv0"))).alias("cell")
    )

    ip_sum = F.lit(0.0)
    rn_sum = F.lit(0.0)
    cx_sum = F.lit(0.0)
    for s in range(m):
        code = F.element_at("codes", F.lit(s + 1))  # 0-based code
        slot = code + F.lit(s * ncodes + 1)
        ip_sum = ip_sum + F.element_at("ip", slot)
        rn_sum = rn_sum + F.element_at("rnorm2", slot)
        cx_sum = cx_sum + F.element_at(
            "cross",
            (F.col("cell") * F.lit(m) + F.lit(s)) * F.lit(ncodes) + code + F.lit(1),
        )
    num = F.element_at("qc", F.col("cell") + 1) + ip_sum
    den = F.col("qn") * F.sqrt(
        F.element_at("cnorm2", F.col("cell") + 1)
        + F.lit(2.0) * cx_sum
        + rn_sum
    )
    cand = (
        enc.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(lut_df), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "cv",
            "qv",
            F.round(num / den, score_decimals).alias("adc_score"),
        )
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    short = cand.withColumn("srn", F.row_number().over(w_short)).filter(
        F.col("srn") <= shortlist
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        short.select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), score_decimals).alias(
                "score"
            ),
        )
        .withColumn("rnk", F.row_number().over(w_k))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def brute_force_l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    dist_decimals: int = 4,
) -> DataFrame:
    """Exact squared-L2 top-k — the correctness baseline for the PQ/ADC
    path, mirroring ``brute_force_topk``'s shape (broadcast queries,
    corpus never shuffles, global top-k via a per-query ranking window).
    Ascending rounded distance, neighbor id breaks ties."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("qv"), F.col("cv"), lambda x, y: (x - y) * (x - y)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                dist_decimals,
            ).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "dist", "rnk")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 10,
    score_decimals: int = 4,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query,
    the top-k most-similar corpus vectors with a DIFFERENT label — the
    near-misses a metric-learning objective needs (easy random negatives
    teach nothing; the hardest ones define the margin).

    Same scale shape as ``brute_force_topk`` — broadcast query side,
    corpus never shuffles, per-query ranking window — with the label
    inequality applied BEFORE scoring so same-label pairs never pay the
    dot product. Swap the candidate generator for ``lsh_bucketed_topk``
    /``ivf_topk``'s bucketed join when the query side is corpus-sized
    (mining negatives for every anchor); the filter composes the same
    way.

    Returns (query_id, neighbor_id, neighbor_label, score, rnk).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("qv"),
        F.col(label_col).alias("q_label"),
    ).withColumn("qn", l2_norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("cv"),
        F.col(label_col).alias("neighbor_label"),
    ).withColumn("cn", l2_norm(F.col("cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .filter(F.col("neighbor_label") != F.col("q_label"))
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                score_decimals,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "neighbor_label", "score", "rnk")
    )


def all_pairs_near(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    sim_decimals: int = 4,
    max_rows: int = 200_000,
) -> DataFrame:
    """Exhaustive near-pair scan for EVAL probes: every ordered pair
    (x, y), x != y, with rounded cosine ≥ threshold. The right side is
    collected and broadcast as one dense matrix (bounded by the eval-
    probe contract — this is the ground-truth generator behind recall
    evals, never a production dedup path), so each Arrow batch pays ONE
    (batch × N) matmul and emits only the near TAIL — versus a
    nested-loop join that materializes all N² paired vectors through
    the Python channel (measured 30 s → 2 s at N=2000, dim=64).

    Cosine is computed as num/den exactly like ``cosine_batch`` (same
    rounding, same threshold semantics); only the batching changes.
    Returns (xid, yid).

    The eval-probe contract is ENFORCED: the collect streams via
    ``take(max_rows + 1)`` and raises past ``max_rows`` (default 200k —
    ~120 MB at 768-dim float64) instead of silently pulling a
    production corpus onto the driver; O(N²) ground truth has no
    business existing beyond that size anyway.
    """
    import numpy as _np

    rows = corpus.select(F.col(id_col), F.col(vec_col)).take(max_rows + 1)
    if len(rows) > max_rows:
        raise ValueError(
            f"all_pairs_near: corpus exceeds max_rows={max_rows}. This is "
            "an O(N²) EVAL operator whose right side broadcasts from the "
            "driver — sample the probe set down, or raise max_rows "
            "consciously if the driver can hold it."
        )
    ids = _np.array([r[0] for r in rows], dtype=_np.int64)
    M = _np.vstack([_np.asarray(r[1], dtype=_np.float64) for r in rows])
    bc = _register_broadcast(
        corpus.sparkSession.sparkContext.broadcast((ids, M))
    )
    tau = float(threshold)

    def gen(batches):
        ids_b, Mb = bc.value
        Mnorm = _np.linalg.norm(Mb, axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _np.vstack(pdf[vec_col].to_numpy()).astype(_np.float64)
            num = X @ Mb.T
            den = _np.linalg.norm(X, axis=1)[:, None] * Mnorm[None, :]
            sims = _np.round(num / den, sim_decimals)
            xi, yi = _np.where(sims >= tau)
            xids = pdf[id_col].to_numpy()[xi]
            yids = ids_b[yi]
            mask = xids != yids
            yield pd.DataFrame(
                {"xid": xids[mask].astype("int64"),
                 "yid": yids[mask].astype("int64")}
            )

    return corpus.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias(vec_col)
    ).mapInPandas(gen, "xid long, yid long")


# ---------------------------------------------------------------------------
# Binary quantization: sign-bit codes + Hamming shortlist + exact re-rank
# ---------------------------------------------------------------------------

def bq_center(
    vectors: DataFrame, vec_col: str, dim: int, decimals: int = 6
) -> list[float]:
    """Per-dimension mean of the corpus, rounded to ``decimals`` — the
    binarization threshold. One aggregate, one driver row of ``dim``
    doubles (bounded model state, like the PCA moments); rounding BEFORE
    any compare keeps the bit decision identical across engines whose
    summation orders differ in the last ulp."""
    row = vectors.agg(
        *[
            F.round(F.avg(F.col(vec_col)[i]), decimals).alias(f"c{i}")
            for i in range(dim)
        ]
    ).head()
    return [float(row[f"c{i}"]) for i in range(dim)]


def bq_codes(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    center: list[float],
    decimals: int = 6,
) -> DataFrame:
    """Sign-bit binary codes against a fixed center, packed 32 bits per
    64-bit word (columns ``bq_w0..``): bit i set iff
    ``round(v[i], decimals) > center[i]``.

    32 bits per word — not 64 — so the packed value never touches the
    sign bit: ``1 << 63`` overflows signed arithmetic differently
    across engines, while everything here stays exactly representable
    and oracle-replayable. The packing is ONE scan-stage higher-order
    aggregate per word (pure JVM, no Python, no shuffle): at 100 TB the
    64-dim float corpus shrinks 32× into the search structure, the same
    memory story as PQ with an even cheaper distance (XOR + popcount)."""
    ctr = F.array(*[F.lit(float(c)) for c in center])
    staged = df.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias("_v")
    ).withColumn("_ctr", ctr)
    words = (dim + 31) // 32
    cols = []
    for w in range(words):
        lo = 32 * w
        n = min(32, dim - lo)
        cols.append(
            F.expr(
                f"aggregate(sequence(1, {n}), 0L, (acc, i) -> acc +"
                f" IF(round(element_at(_v, i + {lo}), {decimals})"
                f" > element_at(_ctr, i + {lo}),"
                f" shiftleft(1L, i - 1), 0L))"
            ).alias(f"bq_w{w}")
        )
    return staged.select(F.col(id_col), *cols)


def bq_hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    dim: int = 64,
    shortlist: int = 100,
    decimals: int = 6,
    dist_decimals: int = 4,
) -> DataFrame:
    """Approximate L2 top-k via binary quantization: Hamming-distance
    shortlist over sign-bit codes, exact squared-L2 re-rank.

    The production BQ shape (popularized by vector stores as the
    cheapest quantization tier): the corpus is searched as packed bits
    — per candidate the distance is ``words`` XOR+popcount ops, ~50×
    cheaper than a float dot product and 32× smaller in memory — and
    only the ``shortlist`` best Hamming rows per query are re-scored
    with the exact metric. No false negatives inside the shortlist;
    recall is measured, not assumed (``knn_bq_recall_eval``).

    The center comes from the CORPUS distribution (queries binarize
    against the same center). Hamming ties break by neighbor id; the
    re-rank reuses the exact rounded-L2 of ``brute_force_l2_topk``."""
    center = bq_center(corpus, vec_col, dim, decimals)
    ccodes = bq_codes(corpus, id_col, vec_col, dim, center, decimals).select(
        F.col(id_col).alias("neighbor_id"), "*"
    ).drop(id_col)
    qcodes = bq_codes(queries, id_col, vec_col, dim, center, decimals)
    words = (dim + 31) // 32
    qcodes = qcodes.select(
        F.col(id_col).alias("query_id"),
        *[F.col(f"bq_w{w}").alias(f"qw{w}") for w in range(words)],
    )
    hamm = None
    for w in range(words):
        term = F.expr(f"bit_count(bq_w{w} ^ qw{w})")
        hamm = term if hamm is None else (hamm + term)
    cand = (
        ccodes.crossJoin(F.broadcast(qcodes))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", hamm.alias("hamm"))
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.col("hamm").asc(), F.col("neighbor_id").asc()
    )
    short = (
        cand.withColumn("hrnk", F.row_number().over(ws))
        .filter(F.col("hrnk") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
    )
    rer = (
        short.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("qv"), F.col("cv"), lambda x, y: (x - y) * (x - y)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                dist_decimals,
            ).alias("dist"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "dist", "rnk")
    )
