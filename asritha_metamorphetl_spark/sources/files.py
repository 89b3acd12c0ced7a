"""File sources: parquet / CSV / JSON, dated-path layouts, table catalog.

Re-expresses the reference's file ingestion (S4: CSV reader at
ETL_Airflow/dags/tasks/ingestion_task.py:234-243, S7: parquet reader in the
Raptor wheel Raptor/Raptor.py:89-100) without its anti-patterns: explicit
schemas instead of ``inferSchema=True`` full-file scans, and real partition
columns (``DAY_DT=YYYY-MM-DD``) instead of Python-side dated-path selection
so Catalyst prunes partitions.
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Tables the driver generates under /root/testdata/sf*/ (TESTDATA.md).
TESTDATA_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan. Column pruning + predicate pushdown are free via
    Catalyst as long as callers express filters/selects declaratively.

    Sets ``spark.sql.legacy.parquet.nanosAsLong`` (a runtime SQL conf) on
    the session doing the read: files written with TIMESTAMP(NANOS)
    columns (e.g. testdata ``events.parquet``) are otherwise an
    AnalysisException at scan time on Spark 4.x, because Spark has no
    nanosecond timestamp type. With the conf on, such columns surface as
    LongType nanos and ``Catalog.load`` converts them to micros
    timestamps. Harmless for files without nanos columns — the conf only
    changes how an otherwise-unreadable physical type is surfaced.
    Setting it here (not just in ``session.create_session``) matters
    because callers may hand us a session built elsewhere without the
    engine's defaults."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with an explicit schema contract.

    The reference uses ``inferSchema=True`` (ingestion_task.py:242) which
    costs a full extra pass over the file; at 100 TB that is a second scan.
    Pass ``schema`` to avoid it; inference remains available for exploration.
    """
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


class QuarantineRead:
    """Result of :func:`read_csv_quarantine`. Unpacks as ``good, bad =``
    for ergonomic use; ``unpersist()`` releases the CACHED PARENT parse
    both sides derive from — calling unpersist on ``good``/``bad``
    themselves would be a no-op (they are children of the cached frame),
    which is why the handle lives here."""

    def __init__(self, good: DataFrame, bad: DataFrame, parsed: DataFrame):
        self.good = good
        self.bad = bad
        self.parsed = parsed

    def __iter__(self):
        return iter((self.good, self.bad))

    def unpersist(self) -> None:
        self.parsed.unpersist()


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> QuarantineRead:
    """CSV scan that ROUTES malformed rows instead of dropping or dying.

    The reference's loader is all-or-nothing: FAILFAST kills a 100 TB
    backfill at the first bad row, DROPMALFORMED silently loses data.
    The production pattern is a dead-letter channel: read PERMISSIVE
    with a corrupt-record column, split once, land the bad raw lines in
    a quarantine sink for replay/alerting while the clean frame flows
    on. Returns a :class:`QuarantineRead` (unpacks as ``(good, bad)``)
    — ``good`` has exactly the contract columns; ``bad`` is
    ``(_corrupt_record)`` raw lines. One scan, one predicate; both
    sides share one cached parse — call ``result.unpersist()`` once
    both sides are consumed, or the parse stays pinned in executor
    cache until ``spark.catalog.clearCache()``."""
    from pyspark.sql.types import StringType, StructField

    corrupt = "_corrupt_record"
    # build a fresh StructType: StructType.add mutates the receiver,
    # which would silently widen the caller's contract object
    full = StructType([*schema.fields, StructField(corrupt, StringType())])
    parsed = (
        spark.read.options(
            header=str(header).lower(),
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=corrupt,
            **options,
        )
        .schema(full)
        .csv(path)
        # cache the parse so the good/bad split doesn't re-scan
        .cache()
    )
    good = parsed.filter(F.col(corrupt).isNull()).drop(corrupt)
    bad = parsed.filter(F.col(corrupt).isNotNull()).select(corrupt)
    return QuarantineRead(good, bad, parsed)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    multiline: bool = False,
    **options: str,
) -> DataFrame:
    """JSON-lines scan with an explicit schema contract (the file form of
    the reference's JSON-records ingestion, S3/S9 — API payloads landed
    as files instead of driver-side ``createDataFrame``).

    Pass ``schema``: without one Spark samples the file to infer types, a
    second scan a 100 TB feed cannot afford (same rule as read_csv).
    ``multiline=True`` reads one JSON document per FILE — that mode is
    not splittable, so keep the default line-delimited layout for
    anything large."""
    reader = spark.read.options(multiLine=str(multiline).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key.

    THE co-location lever for repeated fact-fact joins at 100 TB: when
    both sides of an equi-join are bucketed on the key with the same
    bucket count, SortMergeJoin reads matching buckets directly — no
    Exchange on either side, and with sortBy no Sort either. One shuffle
    paid at WRITE time amortizes over every downstream join/aggregation
    on that key (the reference re-reads raw.sales in three marts —
    exactly this access pattern). Requires saveAsTable (bucket metadata
    lives in the catalog; plain parquet paths can't carry it)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    num_files: int | None = None,
) -> None:
    """Persist parquet laid out for scan pruning at 100 TB.

    ``partition_cols`` become directory partitions — equality/range
    predicates on them prune whole directories before any I/O
    (PartitionFilters in the scan). ``cluster_cols`` drive a
    range-repartition + within-partition sort, so each row group's
    parquet min/max statistics cover a narrow value band and predicate
    pushdown skips most groups inside the files that survive partition
    pruning. Two layers of skipping, both free at read time; the sort
    is paid once at write.

    The range keys lead with the partition columns so each write task
    lands in O(1) partition directories instead of fanning small files
    across all of them (the small-files antipattern). ``num_files``
    pins the range-partition count — an EXPLICIT count is exempt from
    AQE partition coalescing, which otherwise collapses a small write
    into one file and erases the per-file clustering."""
    keys = [*(partition_cols or []), *cluster_cols]
    key_cols = [F.col(c) for c in keys]
    if num_files is not None:
        out = df.repartitionByRange(num_files, *key_cols)
    else:
        out = df.repartitionByRange(*key_cols)
    out = out.sortWithinPartitions(*keys)
    writer = out.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict[str, int]:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    Streaming/incremental writers (micro-batches, per-day CDC merges,
    many-task appends) accumulate small files; at 100 TB the file COUNT
    — task-scheduling overhead, NameNode/listing pressure, footer reads
    — becomes the bottleneck long before the bytes do. Periodic
    compaction is the standard maintenance rewrite (Delta OPTIMIZE,
    Iceberg rewrite_data_files), re-expressed on plain parquet.

    File listing and the final swap go through the Hadoop FileSystem
    API, so the same code works on file://, HDFS, or any object-store
    scheme the session has a connector for (see ``session.create_session``
    jar/conf passthrough). The swap is rename-based: the original is
    renamed ASIDE, the rewrite renamed into place, then the aside copy
    deleted — the path-absent window shrinks to the gap BETWEEN those
    two metadata renames (a reader resolving the path exactly then sees
    path-not-found and should retry; the window is two namenode ops,
    not a data copy), a crash mid-swap leaves either the old or the new
    directory restorable (the aside dir is kept on failure), and
    readers otherwise see old-or-new, never half. Each individual rename is atomic on HDFS/POSIX; object stores
    emulate rename with copy+delete, so there the swap is best-effort —
    prefer a manifest table (``sources.manifest.SnapshotTable``) for
    true atomic publishes on S3-like stores. ``sort_cols`` optionally
    re-clusters while compacting (the OPTIMIZE ... ZORDER pattern
    combined with ``morton_key``).

    Returns ``{files_before, files_after, bytes}``."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)

    it = fs.listFiles(jpath, True)
    total, files_before = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("part-"):
            total += st.getLen()
            files_before += 1

    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)

    tmp = path.rstrip("/") + ".__compacting__"
    aside = path.rstrip("/") + ".__old__"
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    aside_path = jvm.org.apache.hadoop.fs.Path(aside)
    fs.delete(tmp_path, True)
    fs.delete(aside_path, True)
    out.write.mode("overwrite").parquet(tmp)
    # Swap: original → aside, rewrite → original, drop aside. Never a
    # moment with no directory at `path`; on a failed second rename the
    # original is restored from the aside copy.
    if not fs.rename(jpath, aside_path):
        fs.delete(tmp_path, True)
        raise IOError(f"compaction aside-rename failed: {path} -> {aside}")
    if not fs.rename(tmp_path, jpath):
        fs.rename(aside_path, jpath)  # restore
        fs.delete(tmp_path, True)
        raise IOError(f"compaction rename failed: {tmp} -> {path}")
    fs.delete(aside_path, True)
    return {
        "files_before": files_before,
        "files_after": int(n_files),
        "bytes": int(total),
    }


def dated_path(base: str, entity: str, day: _dt.date, ext: str = "csv") -> str:
    """``{base}/{YYYYMMDD}/{entity}_{YYYYMMDD}.{ext}`` — the reference's
    daily-drop layout (Rest-API/main.py:47-48, ingestion_task.py:235-238)."""
    ymd = day.strftime("%Y%m%d")
    return f"{base.rstrip('/')}/{ymd}/{entity}_{ymd}.{ext}"


class Catalog:
    """Named-table access over a directory of parquet files.

    ``Catalog("/root/testdata/sf0.01")`` exposes each table lazily and can
    register them all as temp views for ``spark.sql`` use. On a cluster the
    same class fronts a warehouse path; nothing here is local-only.
    """

    def __init__(self, root: str, tables: tuple[str, ...] = TESTDATA_TABLES):
        self.root = root.rstrip("/")
        self.tables = tables

    def path(self, table: str) -> str:
        return os.path.join(self.root, f"{table}.parquet")

    @staticmethod
    def _normalize_events_ts(df: DataFrame) -> DataFrame:
        """events.ts is TIMESTAMP(NANOS) parquet. Depending on the session's
        confs the scan surfaces it as either long nanos
        (spark.sql.legacy.parquet.nanosAsLong) or TIMESTAMP_NTZ
        (spark.sql.timestampType=TIMESTAMP_NTZ takes priority over the
        nanos-as-long fallback). Normalize both to a session-tz TIMESTAMP so
        instant-typed functions (unix_micros, window(), watermarks) resolve
        identically under externally-built sessions — the driver's own
        session is NTZ-typed and an un-normalized ts fails analysis on
        ``unix_micros(lead(ts))`` with DATATYPE_MISMATCH."""
        from pyspark.sql.types import LongType, TimestampNTZType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # long nanos → micros timestamp (floor division — matches
            # engines that truncate nanos on read).
            return df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
        if isinstance(ts_type, TimestampNTZType):
            # NTZ → instant with the naive value read AS UTC, computed
            # via integer micros since the NTZ epoch. A plain
            # cast("timestamp_ltz") would interpret the wall clock in
            # the SESSION timezone — epoch math (unix_micros,
            # watermarks) would then shift by the machine's UTC offset
            # and DST gaps could distort spring-forward times. The
            # timestampdiff path is timezone-free and exact.
            micros = F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
            return df.withColumn("ts", F.timestamp_micros(micros))
        return df

    def load(self, spark: SparkSession, table: str) -> DataFrame:
        if table not in self.tables:
            raise KeyError(f"unknown table {table!r}; catalog has {self.tables}")
        df = read_parquet(spark, self.path(table))
        if table == "events":
            df = self._normalize_events_ts(df)
        return df

    def stream(self, spark: SparkSession, table: str):
        """readStream over a catalog table with the same normalization as
        batch ``load`` (notably the events nanos→micros conversion —
        applying it manually was the footgun found during verification)."""
        batch = self.load(spark, table)
        raw_schema = spark.read.parquet(self.path(table)).schema
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", f"{table}.parquet")
            .parquet(self.root)
        )
        if table == "events":
            stream = self._normalize_events_ts(stream)
        # align column order/types with the batch view
        return stream.select(*batch.columns)

    def register_views(
        self, spark: SparkSession, tables: tuple[str, ...] | list[str] | None = None
    ) -> None:
        """Register catalog tables as temp views (mirrors the reference's
        createOrReplaceTempView + spark.sql flow, Raptor/Raptor.py:95-100).

        ``tables`` narrows registration to the tables a query actually
        needs — registering everything eagerly means one unreadable table
        fails queries that never touch it. Default (None) registers every
        existing table; since temp views are lazy DataFrames the only
        eager work per table is a schema read."""
        selected = self.tables if tables is None else tuple(tables)
        for table in selected:
            if table not in self.tables:
                raise KeyError(f"unknown table {table!r}; catalog has {self.tables}")
            if os.path.exists(self.path(table)):
                self.load(spark, table).createOrReplaceTempView(table)
