"""Merge-on-read tables: positional delete files over immutable base data.

The two industry-standard ways to delete from immutable columnar storage:

- **Copy-on-write** — rewrite every file containing a deleted row at
  delete time (this repo's ``operators/merge.py`` MERGE INTO shape).
  Deletes are expensive, reads are free.
- **Merge-on-read** (this module — the Iceberg v2 "positional delete"
  design, also Delta's deletion vectors and Hive ACID delete deltas) —
  a delete writes only a tiny ``(file, pos)`` list; the READ subtracts
  them with an anti-join. Deletes are O(deleted keys), reads pay one
  broadcast anti-join until a compaction folds the deletes in.

At 100 TB the delete side of a day's GDPR/erasure batch is typically
thousands-to-millions of positions against billions of base rows — the
anti-join broadcasts the delete set and the base scan never shuffles.
But compaction's per-file threshold means the steady-state PENDING
delete set can approach ``min_delete_ratio`` of ALL base rows spread
thin below the trigger — billions of (file, pos) pairs at 100 TB — so
the broadcast hint is **size-conditioned**, not hard-coded: ``read()``
sums the on-disk bytes of the delete files (filesystem metadata, no
scan) and only hints ``broadcast`` under
``broadcast_threshold_bytes``; above it the join is left to the
optimizer/AQE, which shuffles both sides — slower, but it survives.
Compaction is targeted: only files whose delete ratio crosses the
threshold are rewritten (copy-on-write applied *selectively*, exactly
the Iceberg maintenance recipe), and their delete entries are dropped.
Compaction is crash-safe by write-new + roll-forward journal:
replacement file directories and the residual delete set are fully
written to temp paths while every source byte is still on disk, the
residual delete set is committed into the live ``deletes/`` dir (so
the visible delete set is a superset at every subsequent instant),
a journal records the swap about to happen, and only then are
directories renamed. Every table operation first runs ``_recover()``:
a crash before the journal rolls the temp writes back; a crash after
it rolls the swap forward deterministically (the journal records
which files are replaced vs dropped, so recovery is unambiguous at
every rename boundary). No step ever deletes the only copy of a live
row, and no instant hides a pending delete. (A production deployment
would commit through a manifest/snapshot pointer to additionally get
reader ISOLATION — a reader never sees a half-swapped table; here a
concurrent reader mid-swap can see a mixed-but-correct-per-file view.)

Positions are assigned deterministically at write time (row_number by
key within each hash-assigned file), so an external SQL oracle can
replay file assignment and delete resolution bit-for-bit — physical
layout stays checkable semantics, the same contract as
``sources/bucketed.py``.

Reference scope: the reference loads into mutable Postgres and has no
immutable-storage delete story; this extends the table-format surface
(manifests, zone maps, bucketed CDC) the build brief's scale goals need.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class MergeOnReadTable:
    """Positional-delete table rooted at a directory:

    - ``data/``     one subdirectory per hash-assigned file id
      (``_file=<id>``, written once, never mutated by deletes)
    - ``deletes/``  ``d-<n>.parquet`` delete files of ``(_file, _pos)``

    ``key_col`` must be unique per row (the usual primary-key contract;
    violations make position assignment ambiguous and are the caller's
    bug — ``write_base`` asserts it).
    """

    def __init__(self, spark: SparkSession, root: str, key_col: str,
                 n_files: int = 8,
                 broadcast_threshold_bytes: int = 64 << 20):
        self.spark = spark
        self.root = root.rstrip("/")
        self.key = key_col
        self.n_files = n_files
        #: read() hints broadcast for the delete anti-join only while
        #: the delete files total at most this many ON-DISK bytes
        #: (parquet of two int64 columns ≈ 2-6 bytes/pair compressed,
        #: so the 64 MB default covers ~tens of millions of pending
        #: deletes); past it the join shape is the optimizer's call.
        self.broadcast_threshold_bytes = broadcast_threshold_bytes

    @property
    def _data(self) -> str:
        return f"{self.root}/data"

    @property
    def _deletes(self) -> str:
        return f"{self.root}/deletes"

    # -- write ----------------------------------------------------------

    def write_base(self, df: DataFrame) -> None:
        """Assign each row a (file, position) and write the base data.

        File = ``pmod(key, n_files)`` — the NONNEGATIVE modulo (Spark's
        ``%`` keeps the dividend's sign, which would mint directories
        like ``_file=-3`` for negative keys); an oracle replays it as
        ``((key % n) + n) % n``. Position = row_number by key within
        the file — per-file windows, bounded by file size, exactly the
        position a columnar writer would record. ``partitionBy(_file)``
        gives one directory per file id so deletes and compaction
        address files natively."""
        chk = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(self.key).alias("nn"),
            F.countDistinct(self.key).alias("nd"),
        ).head()
        if chk["nn"] != chk["n"]:
            raise ValueError(f"null {self.key} cannot be positioned")
        if chk["nd"] != chk["n"]:
            raise ValueError(
                f"{self.key} must be unique: duplicate keys make position "
                "assignment order-dependent (and the table un-replayable)"
            )
        w = Window.partitionBy("_file").orderBy(self.key)
        positioned = df.withColumn(
            "_file", F.pmod(F.col(self.key), F.lit(self.n_files)).cast("int")
        ).withColumn("_pos", F.row_number().over(w).cast("long"))
        positioned.write.mode("overwrite").partitionBy("_file").parquet(
            self._data
        )

    def _next_delete_commit(self) -> int:
        """Next delete-commit number by listing ``deletes/``.

        Same caveat as ``sources/bucketed.py``'s manifest: directory
        listing as the commit log assumes a strongly-consistent,
        atomically-listable filesystem (local disk, HDFS). On an object
        store, eventually-consistent or non-atomic LIST can miss a
        just-written delete file or hand two writers the same commit
        number — route commits through a single-writer manifest (the
        ``SnapshotTable`` pointer-swap) there instead."""
        if not os.path.isdir(self._deletes):
            return 1
        names = [n for n in os.listdir(self._deletes) if n.startswith("d-")]
        return 1 + max(
            (int(n.split("-")[1].split(".")[0]) for n in names), default=0
        )

    def delete_keys(self, keys: DataFrame) -> int:
        """Resolve ``keys`` (single column named like ``key_col``) to
        (file, pos) against the base and append ONE delete file.

        The resolution scan is column-pruned to (key, _file, _pos) and
        semi-joined against the (broadcast) key set — the base is read,
        never rewritten; the write is O(matched keys). Re-deleting an
        already-deleted key appends a duplicate (file, pos) row, which
        the read-side anti-join makes harmless — deletes are idempotent
        by construction, the property an at-least-once upstream needs.
        Returns the delete-commit number."""
        self._recover()
        base = self.spark.read.parquet(self._data).select(
            self.key, "_file", "_pos"
        )
        resolved = base.join(F.broadcast(keys), [self.key], "left_semi")
        commit = self._next_delete_commit()
        os.makedirs(self._deletes, exist_ok=True)
        resolved.select("_file", "_pos").write.mode("overwrite").parquet(
            f"{self._deletes}/d-{commit}.parquet"
        )
        return commit

    # -- read -----------------------------------------------------------

    def _delete_files(self) -> list[str]:
        if not os.path.isdir(self._deletes):
            return []
        return [
            f"{self._deletes}/{n}"
            for n in sorted(os.listdir(self._deletes))
            if n.startswith("d-")
        ]

    def _delete_rows(self) -> DataFrame | None:
        files = self._delete_files()
        if not files:
            return None
        return self.spark.read.parquet(*files)

    def _delete_bytes(self) -> int:
        """On-disk size of all delete files — filesystem metadata only,
        no data scan; this is the broadcast-safety signal."""
        total = 0
        for d in self._delete_files():
            if os.path.isfile(d):
                total += os.path.getsize(d)
                continue
            for dirpath, _, names in os.walk(d):
                total += sum(
                    os.path.getsize(os.path.join(dirpath, n)) for n in names
                )
        return total

    def _anti_join_deletes(self, base: DataFrame, dels: DataFrame) -> DataFrame:
        """base LEFT ANTI deletes on (_file, _pos), hinting broadcast
        ONLY while the delete files are small on disk. Past the
        threshold the shape is the optimizer's call (AQE shuffles or
        broadcasts on real runtime sizes) — a forced hint there would
        collect billions of pairs to the driver and OOM it."""
        dels = dels.distinct()
        if self._delete_bytes() <= self.broadcast_threshold_bytes:
            dels = F.broadcast(dels)
        return base.join(dels, ["_file", "_pos"], "left_anti")

    def read(self) -> DataFrame:
        """Live rows: base MINUS accumulated positional deletes.

        One LEFT ANTI join on (_file, _pos); while the pending delete
        set is small (the common case — compaction re-folds it) the
        join is hinted broadcast and the base never shuffles, the
        Iceberg v2 read path. A delete set past
        ``broadcast_threshold_bytes`` drops the hint and survives as a
        shuffled anti-join instead of OOMing the driver. Carries
        ``_file`` and ``_pos`` so callers can audit provenance; project
        them away for user-facing reads."""
        self._recover()
        base = self.spark.read.parquet(self._data)
        dels = self._delete_rows()
        if dels is None:
            return base
        return self._anti_join_deletes(base, dels)

    def delete_stats(self) -> DataFrame:
        """Per-file (n_rows, n_deleted, delete_ratio) — the compaction
        trigger a table service polls. Two bounded aggregates; the
        ratio divides exact bigints once."""
        self._recover()
        base = self.spark.read.parquet(self._data).groupBy("_file").agg(
            F.count(F.lit(1)).alias("n_rows")
        )
        dels = self._delete_rows()
        if dels is None:
            deleted = base.select(
                "_file", F.lit(0).cast("long").alias("n_deleted")
            )
        else:
            deleted = (
                dels.distinct()
                .groupBy("_file")
                .agg(F.count(F.lit(1)).alias("n_deleted"))
            )
        return (
            base.join(deleted, ["_file"], "left")
            .select(
                "_file",
                "n_rows",
                F.coalesce("n_deleted", F.lit(0).cast("long")).alias(
                    "n_deleted"
                ),
            )
            .withColumn(
                "delete_ratio",
                F.round(
                    F.col("n_deleted").cast("double")
                    / F.col("n_rows").cast("double"),
                    4,
                ),
            )
        )

    # -- maintenance ------------------------------------------------------

    def compact(self, min_delete_ratio: float = 0.1) -> list[int]:
        """Fold deletes into the files whose delete ratio ≥ threshold:
        rewrite ONLY those file directories without their deleted rows,
        then rewrite the delete set without the now-applied entries.
        Untouched files keep their directories byte-identical and their
        pending delete rows — selective copy-on-write, the Iceberg
        maintenance recipe. Returns the rewritten file ids.

        Crash-safe by SUPERSET + ROLL-FORWARD JOURNAL: (1) every
        replacement byte (rewritten hot files and the residual delete
        set) is written to temp paths first; (2) the residual deletes
        are committed INTO the live ``deletes/`` dir as a new
        ``d-<next>`` file before anything is displaced — the read path
        unions+distincts all ``d-*`` files, so overlap with the old
        commits is harmless and the visible delete set is a SUPERSET
        of the required one from here to the end (no resurrection
        window — the bug a wholesale rename-out of ``deletes/``
        opens); (3) a journal recording the exact swap plan
        (replaced/dropped file ids + superseded delete commits) is
        fsync'd into place; (4) hot data dirs are swapped; (5) the
        superseded old ``d-*`` commits are pruned one at a time. A
        crash before (3) is rolled BACK by ``_recover()`` (temp dirs
        dropped; a stray residual commit only duplicates rows the
        distinct absorbs); a crash after (3) is rolled FORWARD
        deterministically — the journal says whether a missing temp
        dir means "already swapped in" or "file fully deleted", so
        recovery is unambiguous at every rename boundary, including
        the instant a hot file's old dir is displaced but its new dir
        is not yet in place."""
        stats = self.delete_stats().filter(
            (F.col("delete_ratio") >= min_delete_ratio)
            & (F.col("n_deleted") > 0)
        )
        hot = [int(r["_file"]) for r in stats.select("_file").collect()]
        if not hot:
            return []
        superseded = self._delete_files()
        dels = self._delete_rows().distinct()
        base = self.spark.read.parquet(self._data)
        tmp = f"{self.root}/.compact-tmp"
        trash = f"{self.root}/.compact-trash"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(trash, ignore_errors=True)
        # 1. WRITE NEW: hot files minus their deletes → temp, one
        # directory per file id (sources still fully intact on disk,
        # so no localCheckpoint is needed for crash correctness).
        base.filter(F.col("_file").isin(hot)).join(
            dels, ["_file", "_pos"], "left_anti"
        ).write.mode("overwrite").partitionBy("_file").parquet(
            f"{tmp}/data"
        )
        remaining = dels.filter(~F.col("_file").isin(hot))
        has_remaining = remaining.limit(1).count() > 0
        if has_remaining:
            remaining.write.mode("overwrite").parquet(
                f"{tmp}/deletes-residual"
            )
        # 2. COMMIT the residual delete set into the LIVE deletes/ dir
        # as a fresh d-<next> commit (atomic rename). From here on the
        # visible delete set is a superset of the required one at
        # every crash point — never a window with deletes missing.
        if has_remaining:
            commit = self._next_delete_commit()
            os.rename(
                f"{tmp}/deletes-residual",
                f"{self._deletes}/d-{commit}.parquet",
            )
        # 3. JOURNAL the swap plan, atomically (write + rename). A
        # journal on disk = roll the swap FORWARD; no journal = roll
        # the temp writes back. ``replaced`` vs ``dropped`` removes
        # the one ambiguity recovery would otherwise face: a hot fid
        # with no temp dir either already swapped in (replaced) or
        # never had one because every row died (dropped).
        replaced = [
            fid for fid in hot
            if os.path.isdir(f"{tmp}/data/_file={fid}")
        ]
        dropped = [fid for fid in hot if fid not in replaced]
        plan = {
            "replaced": replaced,
            "dropped": dropped,
            "superseded": [os.path.basename(p) for p in superseded],
        }
        with open(f"{tmp}/journal", "w") as fh:
            fh.write(json.dumps(plan))
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(f"{tmp}/journal", self._journal)
        # 4-6. the swap itself is exactly the recovery roll-forward —
        # run it inline so a crash at ANY rename resumes at the same
        # code path.
        self._roll_forward(plan)
        return sorted(hot)

    @property
    def _journal(self) -> str:
        return f"{self.root}/.compact-journal.json"

    def _roll_forward(self, plan: dict) -> None:
        """Complete a journaled swap from any intermediate state: swap
        replaced files in, drop fully-deleted files, prune superseded
        delete commits, clear trash/tmp/journal. Every step is
        idempotent — recovery after a crash inside recovery is fine."""
        tmp = f"{self.root}/.compact-tmp"
        trash = f"{self.root}/.compact-trash"
        os.makedirs(trash, exist_ok=True)
        for fid in plan["replaced"]:
            old = f"{self._data}/_file={fid}"
            new = f"{tmp}/data/_file={fid}"
            if os.path.isdir(new):
                if os.path.isdir(old):
                    os.rename(old, f"{trash}/_file={fid}")
                os.rename(new, old)
            # no temp dir → this fid already swapped in; nothing to do
        for fid in plan["dropped"]:
            old = f"{self._data}/_file={fid}"
            if os.path.isdir(old):
                os.rename(old, f"{trash}/_file={fid}")
        # prune superseded delete commits one at a time: every entry
        # still visible is either covered by the residual commit
        # (non-hot file) or a post-swap no-op (hot file), so a crash
        # mid-loop only costs redundant anti-join rows.
        for name in plan["superseded"]:
            path = f"{self._deletes}/{name}"
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
            elif os.path.exists(path):
                os.unlink(path)
        shutil.rmtree(trash, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        if os.path.exists(self._journal):
            os.unlink(self._journal)

    def _recover(self) -> None:
        """Crash recovery, run before every table operation: a
        journal on disk means a compaction swap was in flight — roll
        it forward; temp/trash without a journal means the crash hit
        the write phase — roll back (sources were never displaced).
        Bounded filesystem metadata checks on the no-crash path."""
        has_journal = os.path.exists(self._journal)
        tmp = f"{self.root}/.compact-tmp"
        trash = f"{self.root}/.compact-trash"
        if has_journal:
            with open(self._journal) as fh:
                plan = json.load(fh)
            self._roll_forward(plan)
        elif os.path.isdir(tmp) or os.path.isdir(trash):
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(trash, ignore_errors=True)
