"""Write-layer operators (SURVEY.md §2.2 K1-K5, §1.4).

The reference's physical-layout conventions re-expressed for Parquet:

* K1 — partitioned + clustered append: ``partitionBy(date_col)`` with
  ``sortWithinPartitions`` standing in for BigQuery clustering_fields
  (consumo_detalle.py:257-310, indicadores_cia.py:80-91).
* K2 — truncate-replace: ``mode("overwrite")`` (funnel_live.py:106-123).
* K3 — idempotent window refresh (DELETE window + append,
  consumo_detalle.py:317-340): dynamic partition overwrite — ONE atomic
  write touching only the partitions present in the incoming frame.
* K4 — MERGE upsert via staging (funnel_live.py:153-174): plain-parquet
  reconciliation (anti-join old ⟕ staging ∪ staging) written to a temp
  dir then atomically swapped — the Delta-less fallback the survey
  prescribes (§7.4.5).
* K5 — CTAS: ``spark.sql(...).write`` (liveod_editorial.py:282-359).

At cluster scale all of these are metadata-safe: dynamic overwrite only
rewrites touched partitions; the merge rewrite is bounded by the
partitions the staging frame hits when ``partition_cols`` is set.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    cluster_cols: list[str] | None = None,
    mode: str = "append",
) -> None:
    """K1/K2: partitioned write with in-partition clustering sort.
    ``sortWithinPartitions`` orders rows inside each task's output files
    so scans filtering on cluster columns skip row groups (parquet
    min/max stats) — the Parquet analog of BigQuery clustering."""
    out = df
    if cluster_cols:
        out = out.sortWithinPartitions(*cluster_cols)
    out.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def refresh_window(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    cluster_cols: list[str] | None = None,
    refresh_predicate: Column | None = None,
    tx: bool = False,
) -> None:
    """K3: idempotent delete-window-then-append as ONE dynamic partition
    overwrite — partitions present in ``df`` are replaced, all others
    untouched. Requires spark.sql.sources.partitionOverwriteMode=dynamic
    (set by session.get_spark); asserted here so a mis-configured
    session fails loudly instead of truncating the table.

    ``refresh_predicate`` adds the reference's SECONDARY delete predicate
    (``DELETE ... WHERE fecha IN window AND periodo='mensual'``,
    consumo_usuarios.py:265-272; ``AND CONTAINS_SUBSTR(origen,'month')``,
    liveod_editorial.py:226-233): within each touched partition, only the
    rows SATISFYING the predicate are replaced — sibling rows (other
    ``periodo`` values sharing the date partition) survive via
    read-filter-union. Incoming ``df`` rows must all satisfy the
    predicate (they're the new slice); rows that don't would silently
    duplicate against the kept slice, so that contract is asserted.
    Cost is bounded by the TOUCHED partitions, not the table: the kept
    slice is read through a partition-pruned semi join and checkpointed
    before the overwrite (breaking the read-from-overwritten-path cycle).
    Without the predicate the old whole-partition fast path runs — no
    read of existing data at all.

    ``tx=True`` routes the refresh through the manifest transaction log
    (operators/txlog.py) instead of dynamic partition overwrite: the
    delete-window-and-insert lands as ONE atomic manifest flip, readers
    keep their snapshot (and can time-travel to pre-refresh versions),
    and a concurrent refresh raises CommitConflict instead of silently
    interleaving file rewrites — the object-store-safe K3."""
    spark = df.sparkSession
    if tx:
        from etl_python_airflow_bigquery_spark.operators.txlog import TxTable

        out = df.sortWithinPartitions(*cluster_cols) if cluster_cols else df
        TxTable(path, stats_cols=list(partition_cols)).replace_partitions(
            spark, out, list(partition_cols), refresh_predicate
        )
        return
    # data-integrity guards raise for real (never assert: `python -O`
    # would turn a mis-configured session into a silent table truncation)
    if (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static").lower()
        != "dynamic"
    ):
        raise RuntimeError("refresh_window needs partitionOverwriteMode=dynamic")
    out = df
    if refresh_predicate is not None:
        # NULL-predicate semantics follow SQL DELETE: NULL never deletes,
        # so existing NULL rows are KEPT; an incoming NULL row therefore
        # counts as violating (a later refresh could never replace it)
        pred_true = F.coalesce(refresh_predicate, F.lit(False))
        n_bad = df.where(~pred_true).count()
        if n_bad:
            raise ValueError(
                f"refresh_window: {n_bad} incoming rows violate "
                "refresh_predicate (NULLs count as violating) — they "
                "would duplicate against the preserved slice"
            )
        if os.path.exists(path):
            existing = spark.read.parquet(path)
            touched = df.select(*partition_cols).distinct()
            kept = (
                existing.join(F.broadcast(touched), partition_cols, "left_semi")
                .where(~pred_true)
                .select(*df.columns)
                # materialize BEFORE the overwrite rewrites the files we read
                .localCheckpoint(eager=True)
            )
            out = df.unionByName(kept)
    if cluster_cols:
        out = out.sortWithinPartitions(*cluster_cols)
    out.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)
    # overwrite replaced files under existing partitions — drop any cached
    # file listing so readers in this session see the new data
    spark.catalog.refreshByPath(path)


def merge_upsert(
    spark: SparkSession,
    staging: DataFrame,
    path: str,
    key_cols: list[str],
    partition_cols: list[str] | None = None,
    tx: bool = False,
) -> None:
    """K4: MERGE-on-id semantics on plain parquet — WHEN MATCHED UPDATE /
    WHEN NOT MATCHED INSERT (reference funnel_live.py:157-172) becomes
    (target ▷ staging on keys) ∪ staging, written to a temp dir and
    atomically renamed over the old table. The anti-join keeps every
    target row whose key is absent from staging; staging rows win on
    collision — exactly MERGE's net effect for full-row updates.

    Concurrent writers are excluded by an O_EXCL lockfile for the
    table's swap window: two simultaneous merges would each read the
    same target and the loser's rename would silently drop the winner's
    rows (lost update). The lock makes the plain-parquet fallback fail
    loudly instead of corrupting; ``tx=True`` upgrades to REAL snapshot
    isolation via the manifest transaction log (operators/txlog.py) —
    the lost-update window becomes impossible by construction (the
    loser's version claim conflicts), old versions stay readable, and no
    rename-swap is needed (object-store-safe)."""
    if tx:
        from etl_python_airflow_bigquery_spark.operators.txlog import TxTable

        TxTable(path).merge(spark, staging, key_cols)
        return
    lock = f"{path}__merge.lock"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise RuntimeError(
            f"merge_upsert: concurrent merge in progress on {path!r} "
            f"(lockfile {lock!r} exists; remove it only if the other "
            "writer is known dead)"
        ) from None
    os.close(fd)
    try:
        tmp = f"{path}__merge_{uuid.uuid4().hex[:8]}"
        if os.path.exists(path):
            target = spark.read.parquet(path)
            kept = target.join(
                staging.select(*key_cols).distinct(), key_cols, "left_anti"
            )
            merged = kept.unionByName(staging)
        else:
            merged = staging
        writer = merged.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(tmp)
        old = f"{path}__old_{uuid.uuid4().hex[:8]}"
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)
    finally:
        os.unlink(lock)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    partition_cols: list[str] | None = None,
    cluster_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: streaming micro-batch appends and frequent
    window refreshes (K3) accumulate files far below the scan-efficient
    size; at 100 TB the cost is real — driver-side listing, a footer read
    per file, and a task per tiny split. Rewrite the table at
    ``target_file_bytes`` granularity and atomically swap (same
    tmp+rename pattern as merge_upsert, so readers never see a partial
    table):

    * flat layout — ``repartition(ceil(bytes/target))``: one round-robin
      shuffle sized from the CURRENT on-disk bytes;
    * partitioned layout — ``repartition(partition_cols)``: every
      partition's rows land in one task, so each partition directory
      compacts to a single file (a partition larger than the target
      stays one file — split it by adding a salt to partition_cols at
      the call site if that ever matters).

    ``cluster_cols`` re-applies the in-partition clustering sort (K1) so
    compaction also restores row-group-skipping locality that interleaved
    appends destroyed. Returns the data-file count after compaction.
    File sizes come from a local walk — on a real cluster this one call
    becomes a FileSystem.listFiles over the same tree."""
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    df = spark.read.parquet(path)
    if partition_cols:
        out = df.repartition(*partition_cols)
    else:
        n = max(1, -(-total // max(1, target_file_bytes)))
        out = df.repartition(n)
    if cluster_cols:
        out = out.sortWithinPartitions(*cluster_cols)
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    spark.catalog.refreshByPath(path)
    return sum(
        1
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def zorder_key(cols: list[Column], bits: int = 10) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column — pure JVM bit expressions (shift/and/or), no UDF. Sorting or
    range-partitioning by this key clusters rows so EVERY interleaved
    dimension has narrow per-file min/max stats, which is what lets a
    parquet scan skip files on predicates over any of the dimensions —
    single-column sort gives that for one dimension and destroys it for
    the rest. Columns must be non-negative ints that fit in ``bits``
    (clamped here so outliers degrade locality instead of corrupting
    the curve)."""
    n = len(cols)
    limit = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            cc = F.least(F.greatest(c.cast("long"), F.lit(0)), F.lit(limit))
            bit = F.shiftright(cc, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def zorder_layout(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 10
) -> DataFrame:
    """Lay ``df`` out along the Z-curve of ``cols``: range-partition into
    ``n_files`` z-contiguous tiles (each output file covers a hypercube
    tile of the key space) and sort within each for row-group locality.
    Write the result with plain ``.parquet(path)``; at 100 TB the payoff
    is file- AND row-group-level stat pruning on every z-dimension
    (tests/test_writes.py::test_zorder_layout_bounds_all_dims measures
    the per-file min/max width against a single-column sort)."""
    key = zorder_key([F.col(c) for c in cols], bits)
    return df.repartitionByRange(n_files, key).sortWithinPartitions(key)


def ctas(spark: SparkSession, sql: str, path: str, mode: str = "overwrite") -> None:
    """K5: query-to-table — run SQL over registered views, land the
    result (reference liveod_editorial.py:282-359's destination-table
    UNION ALL query)."""
    spark.sql(sql).write.mode(mode).parquet(path)
