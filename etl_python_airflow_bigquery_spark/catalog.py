"""Bucketed persisted marts (SCALING.md / VERDICT missing #6): the
single biggest repeated-shuffle saver at 100× — co-locate every
per-user operation by writing the fact ONCE as a ``bucketBy(user_id)``
table, after which per-user aggregations and self-joins (the
superposition family) read pre-partitioned buckets and plan with ZERO
Exchange on the user_id key.

The reference pays this shuffle on every BigQuery query (each
superposition notebook re-clusters by user, cell 2); Spark's bucketing
persists the clustering in the table layout. At 1000 executors the
bucket files ARE the shuffle output, computed once at ingest:
`tests/test_plans.py::test_bucketed_self_join_has_no_exchange` pins the
no-Exchange plan.
"""

from __future__ import annotations

import os
import re
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 16


def mart_name(prefix: str, sf_dir: str) -> str:
    """Deterministic per-dataset table name (``prefix_sf0_01``): the mart
    layout is a function of its source directory, so two sf dirs never
    share (or clobber) one bucketed table."""
    token = re.sub(r"[^0-9A-Za-z]+", "_", os.path.basename(sf_dir.rstrip("/")))
    return f"{prefix}_{token}".lower()


def ensure_bucketed_mart(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    bucket_col: str = "user_id",
    n_buckets: int = DEFAULT_BUCKETS,
    sort_col: str | None = None,
) -> str:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table, idempotently. Sorting within buckets additionally removes the
    per-task sort from sort-merge joins (K1's sortWithinPartitions taken
    to the catalog layer).

    Buckets size the parallelism floor: n_buckets tasks read the table
    co-located, so production sizes it to cluster width × small factor;
    16 matches the local[32] harness."""
    if spark.catalog.tableExists(table):
        return table
    # The warehouse dir outlives the in-memory catalog: a table written by
    # a previous session leaves files the new session's catalog doesn't
    # know about, which would fail errorifexists. Orphaned layout = stale
    # data — remove it and rebuild from the current source.
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    orphan = os.path.join(wh, table.lower())
    if os.path.exists(orphan):
        shutil.rmtree(orphan)
    writer = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.mode("errorifexists").format("parquet").saveAsTable(table)
    return table
