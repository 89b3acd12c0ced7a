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
Compaction is targeted: only files whose delete ratio crosses the
threshold are rewritten (copy-on-write applied *selectively*, exactly
the Iceberg maintenance recipe), and their delete entries are dropped.

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
                 n_files: int = 8):
        self.spark = spark
        self.root = root.rstrip("/")
        self.key = key_col
        self.n_files = n_files

    @property
    def _data(self) -> str:
        return f"{self.root}/data"

    @property
    def _deletes(self) -> str:
        return f"{self.root}/deletes"

    # -- write ----------------------------------------------------------

    def write_base(self, df: DataFrame) -> None:
        """Assign each row a (file, position) and write the base data.

        File = ``key % n_files`` (portable modulo so an oracle replays
        it); position = row_number by key within the file — per-file
        windows, bounded by file size, exactly the position a columnar
        writer would record. ``partitionBy(_file)`` gives one directory
        per file id so deletes and compaction address files natively."""
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
            "_file", (F.col(self.key) % self.n_files).cast("int")
        ).withColumn("_pos", F.row_number().over(w).cast("long"))
        positioned.write.mode("overwrite").partitionBy("_file").parquet(
            self._data
        )

    def _next_delete_commit(self) -> int:
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

    def _delete_rows(self) -> DataFrame | None:
        if not os.path.isdir(self._deletes):
            return None
        files = [
            f"{self._deletes}/{n}"
            for n in sorted(os.listdir(self._deletes))
            if n.startswith("d-")
        ]
        if not files:
            return None
        return self.spark.read.parquet(*files)

    def read(self) -> DataFrame:
        """Live rows: base MINUS accumulated positional deletes.

        One broadcast LEFT ANTI join on (_file, _pos) — the delete set
        is the small side by design (it is re-folded away by compaction
        before it can grow base-like), so the base never shuffles; at
        scale this is the Iceberg v2 read path. Carries ``_file`` and
        ``_pos`` so callers can audit provenance; project them away for
        user-facing reads."""
        base = self.spark.read.parquet(self._data)
        dels = self._delete_rows()
        if dels is None:
            return base
        return base.join(
            F.broadcast(dels.distinct()), ["_file", "_pos"], "left_anti"
        )

    def delete_stats(self) -> DataFrame:
        """Per-file (n_rows, n_deleted, delete_ratio) — the compaction
        trigger a table service polls. Two bounded aggregates; the
        ratio divides exact bigints once."""
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
        maintenance recipe. Returns the rewritten file ids."""
        stats = self.delete_stats().filter(
            (F.col("delete_ratio") >= min_delete_ratio)
            & (F.col("n_deleted") > 0)
        )
        hot = [int(r["_file"]) for r in stats.select("_file").collect()]
        if not hot:
            return []
        dels = self._delete_rows().distinct().localCheckpoint(eager=False)
        base = self.spark.read.parquet(self._data)
        live_hot = (
            base.filter(F.col("_file").isin(hot))
            .join(F.broadcast(dels), ["_file", "_pos"], "left_anti")
            .localCheckpoint()  # eager: sources are rewritten below
        )
        for fid in hot:
            out = f"{self._data}/_file={fid}"
            shutil.rmtree(out, ignore_errors=True)
            live_hot.filter(F.col("_file") == fid).drop("_file").write.mode(
                "overwrite"
            ).parquet(out)
        remaining = dels.filter(~F.col("_file").isin(hot)).localCheckpoint()
        shutil.rmtree(self._deletes, ignore_errors=True)
        if remaining.limit(1).count() > 0:
            os.makedirs(self._deletes, exist_ok=True)
            remaining.write.mode("overwrite").parquet(
                f"{self._deletes}/d-1.parquet"
            )
        return sorted(hot)
