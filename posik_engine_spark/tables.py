"""Table SINK seam (SURVEY.md §2 S4; round-2 VERDICT item 5).

``sources.read_docs`` already abstracts the read side (Iceberg table or
parquet path). This module abstracts the WRITE side the index lifecycle
needs, so `operators/lifecycle.py` stops hard-coding `.parquet()` +
`shutil` moves:

- ``write``               full-table overwrite (term_stats, build
                          stages)
- ``stage_partitions``    write replacement partitions NEXT TO the live
                          table (phase 1 of the staged commit — the
                          live table is never touched, a crash here
                          leaves the index serving the old state)
- ``promote_partitions``  idempotently swap staged partitions into the
                          live table (phase 2, replayable from the
                          recorded intent after a crash)
- ``replace_table``       idempotent whole-table swap (delta-maintained
                          term_stats)
- ``read`` / ``clear_staging``

``ParquetBackend`` implements the protocol with directory renames —
each promote is per-partition-atomic, and the intent file recorded by
the caller makes the whole commit replayable. On Iceberg the SAME
protocol collapses: stage_partitions writes a temp table/view and
promote_partitions is one atomic ``overwritePartitions`` (or MERGE
INTO), with replace_table as ``CREATE OR REPLACE TABLE AS``. The seam
is proven by tests/test_tables_seam.py, which drives the full staged
commit (including crash replay) through an injected mock backend.

Reference analog: the JPA repositories' transactional page/lemma/index
upserts (/root/reference/.../repositories/*.java) — one storage
interface the service layer writes through.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class TableBackend:
    """Protocol for index/state table storage. Implementations must
    make ``promote_partitions`` and ``replace_table`` idempotent: the
    crash-recovery path replays them from a recorded intent."""

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        raise NotImplementedError

    def write(
        self,
        df: DataFrame,
        path: str,
        partition_col: str | None = None,
        n_partitions: int | None = None,
        sort_cols: list[str] | None = None,
    ) -> None:
        raise NotImplementedError

    def stage_partitions(
        self,
        df: DataFrame,
        staging_path: str,
        partition_col: str,
        partition_ids: list[int],
        sort_cols: list[str] | None = None,
    ) -> list[int]:
        """Write the replacement rows for ``partition_ids`` to staging;
        returns the ids actually present (a partition can be empty in
        the new state). MUST NOT touch the live table."""
        raise NotImplementedError

    def promote_partitions(
        self,
        final_path: str,
        staging_path: str,
        partition_col: str,
        partition_ids: list[int],
        staged_ids: list[int],
    ) -> None:
        """Replace ``partition_ids`` of the live table with the staged
        ones; ids in ``partition_ids`` but not ``staged_ids`` are
        dropped (empty in the new state). Idempotent — a partial prior
        attempt must be completable by calling again."""
        raise NotImplementedError

    def replace_table(self, final_path: str, staging_path: str) -> None:
        """Atomically-enough swap the whole table with the staged one;
        a no-op when staging is already gone (prior attempt finished).
        Idempotent."""
        raise NotImplementedError

    def clear_staging(self, staging_path: str) -> None:
        raise NotImplementedError


class ParquetBackend(TableBackend):
    """Directory-rename implementation over plain parquet (the only
    table format in this sandbox). Partition dirs use the Spark layout
    ``<partition_col>=<id>``."""

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.parquet(path)

    def write(self, df, path, partition_col=None, n_partitions=None, sort_cols=None):
        w = df
        if n_partitions is not None:
            w = (
                w.repartition(n_partitions, partition_col)
                if partition_col
                else w.repartition(n_partitions)
            )
        if sort_cols:
            w = w.sortWithinPartitions(*sort_cols)
        writer = w.write.mode("overwrite")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(path)

    def stage_partitions(self, df, staging_path, partition_col, partition_ids, sort_cols=None):
        shutil.rmtree(staging_path, ignore_errors=True)
        w = df.repartition(max(1, len(partition_ids)), partition_col)
        if sort_cols:
            w = w.sortWithinPartitions(partition_col, *sort_cols)
        w.write.mode("overwrite").partitionBy(partition_col).parquet(staging_path)
        return self._staged_ids(staging_path, partition_col)

    @staticmethod
    def _staged_ids(staging_path: str, partition_col: str) -> list[int]:
        if not os.path.isdir(staging_path):
            return []
        prefix = partition_col + "="
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(staging_path)
            if d.startswith(prefix)
        )

    def promote_partitions(
        self, final_path, staging_path, partition_col, partition_ids, staged_ids
    ):
        staged = set(staged_ids)
        for s in partition_ids:
            dst = os.path.join(final_path, f"{partition_col}={s}")
            src = os.path.join(staging_path, f"{partition_col}={s}")
            if s in staged:
                if os.path.isdir(src):
                    shutil.rmtree(dst, ignore_errors=True)
                    shutil.move(src, dst)
                # else: already moved by a previous attempt
            else:
                # partition empty in the new state (all rows deleted)
                shutil.rmtree(dst, ignore_errors=True)

    def replace_table(self, final_path, staging_path):
        # rename-aside swap: the previous rmtree(final) -> move(staging)
        # left a no-table window as long as the recursive delete, during
        # which a concurrent reader in another process (from_index_dir,
        # a big-vocab term_info scan) got file-not-found instead of
        # old-or-new — round-3 advisor finding. Two renames shrink the
        # window to microseconds; the old copy is deleted only after the
        # new table is in place.
        old = final_path + ".old"
        if os.path.isdir(staging_path):
            shutil.rmtree(old, ignore_errors=True)
            if os.path.isdir(final_path):
                os.rename(final_path, old)
            shutil.move(staging_path, final_path)
        # else: already swapped by a previous attempt — fall through to
        # clear a leftover .old from a crash between the two renames
        shutil.rmtree(old, ignore_errors=True)

    def clear_staging(self, staging_path):
        shutil.rmtree(staging_path, ignore_errors=True)
