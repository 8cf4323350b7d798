"""Incremental materialized-view maintenance over the txlog change feed.

The 100 TB pattern: a mart that aggregates an append-flavored fact table
should cost O(delta) per refresh, not O(table). ``refresh_mart_counts``
reads only the rows committed since the last refresh
(:meth:`TxTable.changes`), folds them into the existing aggregate, and
commits the result WITH the consumed upstream version in the same
manifest — checkpoint and data flip atomically, so a crashed refresh
re-runs idempotently (re-reading the same delta, overwriting the same
result) and can never double-count.

Reference analog: the daily BigQuery jobs re-aggregate full partitions
every run (consumo_usuarios.py's window-delete-reload); this is the
delta-sized alternative the engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.operators.txlog import (
    NonIncrementalHistory,
    TxTable,
)


def refresh_mart_counts(
    spark: SparkSession,
    src: TxTable,
    dst: TxTable,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    weight_col: str | None = None,
    delta_log: TxTable | None = None,
) -> tuple[str, int]:
    """Maintain ``SELECT group_cols, count(*) AS n [, sum(c) AS sum_c…]
    FROM src`` incrementally. Returns ``(mode, upstream_version)`` with
    mode one of:

    * ``"noop"``     — mart already reflects ``src.version()``;
    * ``"delta"``    — only the files appended since the checkpoint were
      scanned; the delta aggregate folded into the mart (counts/sums are
      mergeable by construction);
    * ``"rebuild"``  — the feed crossed a data-rewriting version
      (:class:`NonIncrementalHistory`), so the mart recomputed from the
      snapshot — loud in the return value, never a silently wrong merge.

    The mart itself rewrites whole (it is aggregate-grain small); the
    scale win is the SOURCE side — scan cost is the delta. A mart too
    big to rewrite would route through ``replace_partitions`` on the
    touched groups instead; same checkpoint contract.

    CHAINING (mart-over-mart IVM): pass ``delta_log`` to ALSO persist
    each refresh's delta aggregate — appended in delta mode, OVERWRITTEN
    on rebuild, so a downstream mart consuming the log via this same
    function sees the rebuild as a data rewrite and
    :class:`NonIncrementalHistory` CASCADES the rebuild down the chain
    automatically. The downstream sets ``weight_col="n"`` so its count
    semantics sum the upstream delta counts instead of counting delta
    rows. Each stage stays delta-sized with its own atomic checkpoint."""
    sum_cols = sum_cols or []
    up = src.version()
    last = -1
    if dst.version() >= 0:
        last = dst._manifest(dst.version()).get("upstream_version", -1)
    if up == last:
        return ("noop", last)

    def aggregate(df: DataFrame) -> DataFrame:
        n = (
            F.sum(weight_col) if weight_col is not None else F.count(F.lit(1))
        )
        return df.groupBy(*group_cols).agg(
            n.cast("bigint").alias("n"),
            *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        )

    try:
        delta = src.changes(spark, last, up).drop("_commit_version")
        mode = "delta"
    except NonIncrementalHistory:
        delta = None
        mode = "rebuild"
    if mode == "delta":
        agg = aggregate(delta)
        if last >= 0:
            merged = (
                dst.read(spark)
                .unionByName(agg)
                .groupBy(*group_cols)
                .agg(
                    F.sum("n").cast("bigint").alias("n"),
                    *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
                )
            )
        else:
            merged = agg
    else:
        merged = aggregate(src.read(spark, up))
    if delta_log is not None:
        if mode == "delta":
            payload = agg if last >= 0 else merged
            if delta_log.version() >= 0:
                delta_log.append(payload)
            else:
                delta_log.overwrite(payload)
        else:
            # a rebuild invalidates the log's history: overwrite is a
            # data REWRITE, which makes the downstream's changes() raise
            # NonIncrementalHistory — the rebuild cascades loudly
            delta_log.overwrite(merged)
    dst.overwrite(merged, extra={"upstream_version": up})
    return (mode, up)
