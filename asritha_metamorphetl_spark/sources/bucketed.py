"""Hash-bucketed CDC state tables: O(delta) streaming upserts on the
manifest layer.

``streaming.windows.cdc_upsert_stream`` folds each micro-batch into a
:class:`~asritha_metamorphetl_spark.sources.manifest.SnapshotTable` by
reading the WHOLE state, merging, and rewriting the WHOLE state — at
100 TB of keyed state that is quadratic total I/O over a day of
micro-batches (every batch pays O(state)). This module is the
scale-safe replacement: Delta/Hudi's file-pruned MERGE reduced to this
repo's own primitives.

The state table is hash-partitioned into ``n_buckets`` key ranges, each
bucket a separate parquet directory named by the manifest. Per
micro-batch:

1. The delta's rows are bucketed with ``pmod(xxhash64(keys), n)`` — a
   pure projection; the set of TOUCHED buckets is collected (bounded by
   ``n_buckets``, never by data).
2. Only the touched buckets' prior directories are read, merged with
   the delta through the order-independent, tombstone-retaining
   ``operators.cdc.cdc_merge_batch``, and rewritten as new
   ``_b=<id>`` partition directories under one commit dir.
3. The new manifest carries every UNTOUCHED bucket's directory entry
   forward VERBATIM — those files are never opened, never copied. The
   publish is the same atomic temp-file + rename as any other commit.

Cost per batch is therefore O(delta + state-of-touched-buckets); a
changelog whose keys concentrate in few buckets rewrites a sliver of
the table, and total I/O over time is linear in change volume, not
quadratic in state size. Reads (``read``/time travel) and ``vacuum``
keep full snapshot-isolation semantics because every version is still
just a manifest naming immutable directories.

Choosing ``n_buckets``: state_bytes / n_buckets should fit a
comfortable rewrite unit (e.g. 1–4 GB). More buckets = finer rewrite
granularity but more files; the bucket count is fixed at table creation
(changing it means rewriting the table — same contract as Hive/Spark
bucketing; ``rebucket`` performs exactly that rewrite when state
outgrows the sizing).

Reference contrast: the closest pattern in the reference is the daily
full-snapshot rewrite (ETL_Airflow/dags/tasks/ingestion_task.py:66-69);
this module exists to beat it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.sources.manifest import SnapshotTable

import uuid


class BucketedCdcTable(SnapshotTable):
    """A CDC state table whose snapshot is split across ``n_buckets``
    hash buckets so upserts rewrite only delta-touched buckets.

    Inherits the manifest plumbing, ``read`` (union of all bucket
    directories — bucket layout is invisible to readers), time travel,
    and optimistic-concurrency publish from :class:`SnapshotTable`.
    Manifests additionally record ``n_buckets`` and a
    ``buckets: {bucket_id: data_dir}`` map; ``data_dirs`` stays the
    flat list so the inherited reader works unchanged.

    State rows keep their ``op``/``seq`` columns (tombstone-retaining,
    see ``cdc_merge_batch``); read the live rows with
    ``operators.cdc.cdc_live(table.read())``.
    """

    #: Partition-directory column name used for the bucketed write.
    BUCKET_COL = "_b"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        keys: Sequence[str],
        n_buckets: int,
        seq_col: str = "seq",
    ):
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        super().__init__(spark, root)
        self.keys = list(keys)
        self.n_buckets = int(n_buckets)
        self.seq_col = seq_col
        self._layout_ok = False

    def _validate_layout(self) -> None:
        """Direct construction accepts any keys/n_buckets/seq_col; if
        they disagree with an EXISTING table's manifest, ``bucket_of``
        computes a different layout and the next ``merge_delta`` would
        silently corrupt it (rows landing in buckets the manifest maps
        elsewhere). Checked once, lazily, before the first mutating or
        layout-dependent operation — ``open_table`` constructs from the
        manifest and is always consistent; this guards the constructor
        path. ``rebucket`` is the sanctioned way to change the count."""
        if self._layout_ok:
            return
        prior = self.versions()
        if prior:
            self._check_recorded_layout(self._read_manifest(prior[-1]))
        self._layout_ok = True

    def _check_recorded_layout(self, m: dict) -> None:
        """Raise if ``m``'s recorded layout disagrees with this handle's.
        Every MUTATING operation re-runs this against the manifest it is
        about to build on (not just the cached construction-time check):
        a handle that validated against n=4 and then lost a ``rebucket``
        race to another handle would otherwise write 4-bucket-hashed
        directories into an 8-bucket manifest — silent key-routing
        corruption. Re-checking costs nothing (the mutators read that
        manifest anyway) and turns the stale-handle race into a
        deterministic loser-raises."""
        if "buckets" in m:
            recorded = (
                int(m["n_buckets"]),
                list(m["keys"]),
                m.get("seq_col", "seq"),
            )
            mine = (self.n_buckets, self.keys, self.seq_col)
            if recorded != mine:
                raise ValueError(
                    f"bucketed table layout mismatch at {self.root}: "
                    f"manifest records (n_buckets, keys, seq_col)="
                    f"{recorded} but this handle was constructed with "
                    f"{mine}. Use open_table() to adopt the recorded "
                    "layout, or rebucket() to change the bucket count."
                )

    # -- bucketing ---------------------------------------------------------

    def bucket_of(self, *key_cols) -> F.Column:
        """The bucket id of a row: ``pmod(xxhash64(keys), n_buckets)``.
        Deterministic across sessions/partitionings (xxhash64 is a pure
        function of the values with a fixed seed), so the same key
        always lands in the same bucket for the table's lifetime."""
        cols = list(key_cols) or [F.col(k) for k in self.keys]
        return F.pmod(F.xxhash64(*cols), F.lit(self.n_buckets))

    def commit(self, df: DataFrame, mode: str = "append") -> int:
        """Disabled: arbitrary commits would break the bucket→directory
        invariant. Use :meth:`merge_delta`."""
        raise ValueError(
            "BucketedCdcTable only accepts merge_delta() commits; "
            "plain append/overwrite would break the bucket layout"
        )

    def _buckets_map(self, version: int) -> dict[str, str]:
        return dict(self._read_manifest(version).get("buckets", {}))

    # -- the O(delta) upsert ----------------------------------------------

    def merge_delta(self, changelog: DataFrame) -> int:
        """Fold one changelog batch into the state, rewriting ONLY the
        buckets whose keys appear in the batch; untouched buckets'
        directories carry into the new manifest verbatim (zero read,
        zero write). Returns the published version.

        Idempotent and order-independent across batches (the merge is
        ``cdc_merge_batch``), so at-least-once ``foreachBatch``
        delivery and out-of-order file arrival both converge.

        Shuffle shape: one hash aggregate on the keys (map-side
        combinable ``max_by``) plus one repartition on the bucket id so
        each write task lands in O(1) partition directories — both
        sized by (delta + touched-bucket state), never by the full
        table."""
        self._validate_layout()
        b = self.BUCKET_COL
        delta = changelog.withColumn(b, self.bucket_of())
        # Pin the delta before ANY consumer: the touched-set collect,
        # the merge, and the write must all see the same rows. Without
        # this, a nondeterministic changelog plan (sampling, rand
        # salting) could write _b= directories outside the collected
        # touched set, whose manifest entries would then REPLACE prior
        # bucket state without having merged it. localCheckpoint
        # materializes once; foreachBatch micro-batch frames support it
        # (the streaming sink path is under test). The written⊆touched
        # assertion in the write step backstops this pin.
        delta = delta.localCheckpoint(eager=True)
        # Bounded collect: at most n_buckets rows, independent of data size.
        touched = sorted(
            r[b] for r in delta.select(b).distinct().collect()
        )
        prior = self.versions()
        version = (prior[-1] + 1) if prior else 1
        buckets: dict[str, str] = {}
        if prior:
            m = self._read_manifest(prior[-1])
            # re-verify against the manifest we BUILD ON, not the one
            # seen at construction — see _check_recorded_layout
            self._check_recorded_layout(m)
            buckets = dict(m.get("buckets", {}))

        if not touched:  # empty batch: republish the same layout
            self._publish(version, buckets, changelog.schema.jsonValue())
            return version

        prior_dirs = [
            buckets[str(t)] for t in touched if str(t) in buckets
        ]
        if prior_dirs:
            state = self.spark.read.option("mergeSchema", "true").parquet(
                *prior_dirs
            )
            # stored files don't carry the bucket column (it lives in the
            # directory name); restore it for the partitioned rewrite
            state = state.withColumn(b, self.bucket_of())
            merged = self._merge(state, delta)
        else:
            merged = self._merge(None, delta)

        # a touched bucket always has rows here (tombstones are retained,
        # deltas never vanish), so every touched bucket gets a new dir
        written = self._write_buckets(merged, version, len(touched))
        extra = set(written) - {str(t) for t in touched}
        if extra:
            raise RuntimeError(
                f"merge_delta wrote buckets {sorted(extra)} outside the "
                f"collected touched set {touched} — the changelog plan "
                "produced different rows across evaluations (it is "
                "nondeterministic despite the checkpoint pin). Aborting "
                "before publishing a manifest that would replace those "
                "buckets' prior state unmerged."
            )
        new_buckets = dict(buckets)
        new_buckets.update(written)
        self._publish(version, new_buckets, changelog.schema.jsonValue())
        return version

    def _write_buckets(
        self, df: DataFrame, version: int, n_tasks: int
    ) -> dict[str, str]:
        """Write ``df`` (carrying the bucket column) as ``_b=`` partition
        directories under one commit dir; returns {bucket_id: dir} for
        the directories actually written."""
        b = self.BUCKET_COL
        commit_dir = (
            f"{self.root}/data/commit-{version:05d}-{uuid.uuid4().hex[:8]}"
        )
        (
            df.repartition(max(n_tasks, 1), F.col(b))
            .write.mode("error")
            .partitionBy(b)
            .parquet(commit_dir)
        )
        written = {}
        for st in self._fs.listStatus(self._Path(commit_dir)):
            name = st.getPath().getName()
            if name.startswith(f"{b}="):
                written[name[len(b) + 1 :]] = f"{commit_dir}/{name}"
        return written

    def vacuum_tombstones(self, seq_watermark) -> int | None:
        """Garbage-collect tombstones whose sequence is below
        ``seq_watermark``, rewriting ONLY the buckets that contain one
        (buckets without expired tombstones carry forward verbatim,
        same as :meth:`merge_delta`). Publishes and returns a new
        version, or None when nothing expired.

        Safety contract: only call with a watermark below which
        upstream can no longer emit sequences for these keys — a 'D'
        removed too early lets a late stale update resurrect the key
        (the tombstone's whole job). This is the sequence-domain twin
        of a streaming watermark. The finder pass scans only the
        (keys, op, seq) projection — column pruning keeps it cheap even
        when payloads are wide; a bucket left EMPTY by the purge drops
        out of the manifest entirely."""
        self._validate_layout()
        b = self.BUCKET_COL
        op = F.col("op")
        seq = F.col(self.seq_col)
        expired = (op == "D") & (seq < F.lit(seq_watermark))
        prior = self.versions()
        if not prior:
            return None
        state = self.read().withColumn(b, self.bucket_of())
        affected = sorted(
            r[b]
            for r in state.filter(expired)
            .select(b)
            .distinct()
            .collect()
        )  # bounded by n_buckets
        if not affected:
            return None
        version = prior[-1] + 1
        m = self._read_manifest(prior[-1])
        self._check_recorded_layout(m)  # racing rebucket ⇒ raise, not corrupt
        buckets = dict(m.get("buckets", {}))
        sub = self.spark.read.option("mergeSchema", "true").parquet(
            *[buckets[str(t)] for t in affected]
        ).withColumn(b, self.bucket_of())
        written = self._write_buckets(
            sub.filter(~expired), version, len(affected)
        )
        new_buckets = {
            bid: d for bid, d in buckets.items() if int(bid) not in set(affected)
        }
        new_buckets.update(written)
        self._publish(version, new_buckets, m["schema"])
        return version

    def _merge(self, state: DataFrame | None, delta: DataFrame) -> DataFrame:
        from asritha_metamorphetl_spark.operators.cdc import cdc_merge_batch

        return cdc_merge_batch(state, delta, self.keys, self.seq_col)

    def _publish(
        self, version: int, buckets: dict[str, str], schema_json: dict
    ) -> None:
        self._write_manifest(
            version,
            {
                "version": version,
                "mode": "upsert",
                "n_buckets": self.n_buckets,
                "keys": self.keys,
                "seq_col": self.seq_col,
                "buckets": buckets,
                # read() needs the schema when every bucket is empty
                "schema": schema_json,
                # flat list keeps the inherited read()/time-travel working
                "data_dirs": [buckets[k] for k in sorted(buckets, key=int)],
            },
        )

    def rebucket(self, n_new: int) -> int | None:
        """Rewrite the WHOLE table into ``n_new`` hash buckets and
        publish the result as the next version — the escape hatch for
        the "bucket count is fixed at creation" contract when a table
        outgrows its rewrite-unit sizing (state_bytes / n_buckets should
        stay ~1-4 GB). One full read + one partitioned write, exactly
        the cost contract of Hive/Spark re-bucketing; history before
        the rebucket stays time-travelable (old manifests keep naming
        the old bucket directories), and the ``changes`` feed across
        the boundary reports every bucket as rewritten — which is true,
        and the replica's merge absorbs it. This handle adopts the new
        count on success. Returns the new version (None for an empty
        table, which just adopts the count — nothing to rewrite).

        Concurrency: a ``merge_delta`` racing this rebucket resolves
        loser-raises on stores with a non-clobbering rename (HDFS,
        enforced-by-read-back local FS — pinned in
        tests/test_round7_ops.py): whichever publishes the next version
        second fails at the manifest commit, and a writer holding the
        PRE-rebucket layout fails its per-merge layout re-check on the
        next attempt. On object stores whose rename overwrites, the
        commit token is BEST-EFFORT (see ``_write_manifest``) — the
        narrow window between the loser's rename and its read-back can
        lose one commit, so schedule rebuckets when no merger is
        running, or provide a store with conditional PUT."""
        if n_new < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_new}")
        self._validate_layout()
        prior = self.versions()
        if not prior:
            self.n_buckets = int(n_new)
            return None
        m = self._read_manifest(prior[-1])
        self._check_recorded_layout(m)  # lost a prior race ⇒ raise here
        b = self.BUCKET_COL
        state = self.read().withColumn(
            b,
            F.pmod(
                F.xxhash64(*[F.col(k) for k in self.keys]), F.lit(int(n_new))
            ),
        )
        version = prior[-1] + 1
        written = self._write_buckets(state, version, int(n_new))
        old_n = self.n_buckets
        self.n_buckets = int(n_new)  # _publish records the new layout
        try:
            self._publish(version, written, m["schema"])
        except BaseException:
            self.n_buckets = old_n  # lost the publish race: keep the
            raise  # handle consistent with what the store records
        return version

    # -- incremental consumption ------------------------------------------

    def changes(self, since: int, until: int | None = None) -> DataFrame:
        """The rows of every bucket REWRITTEN in ``(since, until]`` —
        the bucket-granular change feed. Each returned row is a full
        merged record (op/seq retained, tombstones included), so a
        downstream replica converges by folding the feed with the same
        ``cdc_merge_batch`` it would apply to the raw changelog: every
        returned record carries a sequence ≥ the replica's version of
        that key, and untouched buckets are — by construction —
        byte-identical on both sides, so nothing is lost by not
        re-reading them. Coarser than a row-level feed (a rewritten
        bucket re-delivers its unchanged keys too; the merge makes that
        harmless) but O(changed buckets) instead of O(state)."""
        versions = self.versions()
        until = versions[-1] if until is None else until
        if since not in versions or until not in versions:
            raise FileNotFoundError(
                f"versions {since}..{until} not all in {versions}"
            )
        base = self._buckets_map(since)
        new = [
            d
            for bid, d in self._buckets_map(until).items()
            if base.get(bid) != d
        ]
        if not new:
            return self.read(until).limit(0)
        return self.spark.read.option("mergeSchema", "true").parquet(*new)

    # -- maintenance -------------------------------------------------------

    def vacuum(self) -> list[str]:
        """Delete bucket directories no manifest references (superseded
        bucket versions after manifests are pruned, crashed writers),
        then empty commit dirs. Bucket-granular: a commit whose buckets
        are PARTIALLY superseded keeps its still-referenced ``_b=``
        subdirectories."""
        referenced: set[str] = set()
        for v in self.versions():
            referenced.update(self._read_manifest(v)["data_dirs"])
        data_root = self._Path(f"{self.root}/data")
        deleted: list[str] = []
        if not self._fs.exists(data_root):
            return deleted
        for commit_st in self._fs.listStatus(data_root):
            commit_path = commit_st.getPath()
            commit_full = f"{self.root}/data/{commit_path.getName()}"
            kept = 0
            for st in self._fs.listStatus(commit_path):
                if not st.isDirectory():
                    continue  # _SUCCESS markers ride along with the dir
                leaf = f"{commit_full}/{st.getPath().getName()}"
                if leaf in referenced:
                    kept += 1
                else:
                    self._fs.delete(st.getPath(), True)
                    deleted.append(leaf)
            if kept == 0:
                self._fs.delete(commit_path, True)
        return deleted


def open_table(spark: SparkSession, root: str) -> SnapshotTable:
    """Open an existing table at ``root`` as the right class by
    inspecting its latest manifest: bucketed manifests record their
    ``buckets``/``keys``/``n_buckets``, plain ones don't. Maintenance
    tooling MUST go through this — running the plain
    ``SnapshotTable.vacuum`` (which reclaims whole unreferenced commit
    directories) against a bucketed root would treat every commit dir
    as unreferenced, because bucketed manifests reference ``_b=``
    SUBdirectories; the bucketed vacuum is leaf-granular."""
    t = SnapshotTable(spark, root)
    versions = t.versions()
    if versions:
        m = t._read_manifest(versions[-1])
        if "buckets" in m:
            return BucketedCdcTable(
                spark,
                root,
                keys=m["keys"],
                n_buckets=m["n_buckets"],
                seq_col=m.get("seq_col", "seq"),
            )
    return t
