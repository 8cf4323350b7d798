"""Incremental materialized-view maintenance (operators/incremental.py):
delta-sized refresh over the txlog change feed, atomic checkpointing,
loud rebuild on non-incremental history."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.operators.incremental import (
    refresh_mart_counts,
)
from etl_python_airflow_bigquery_spark.operators.txlog import TxTable


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 3).cast("int").alias("g"),
        F.col("id").alias("v"),
    )


def _full(spark, src):
    return {
        (r["g"], r["n"], r["sum_v"])
        for r in src.read(spark)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").alias("sum_v"),
        )
        .collect()
    }


def _mart(spark, dst):
    return {(r["g"], r["n"], r["sum_v"]) for r in dst.read(spark).collect()}


def test_incremental_equals_full_recompute(spark, tmp_path):
    src = TxTable(str(tmp_path / "src"))
    dst = TxTable(str(tmp_path / "mart"))
    src.overwrite(_batch(spark, 0, 10))
    mode, up = refresh_mart_counts(spark, src, dst, ["g"], ["v"])
    assert (mode, up) == ("delta", 0)
    assert _mart(spark, dst) == _full(spark, src)
    # two more appends, ONE refresh folds both versions
    src.append(_batch(spark, 10, 25))
    src.append(_batch(spark, 25, 30))
    mode, up = refresh_mart_counts(spark, src, dst, ["g"], ["v"])
    assert (mode, up) == ("delta", 2)
    assert _mart(spark, dst) == _full(spark, src)
    # caught up: noop, nothing committed
    v_before = dst.version()
    assert refresh_mart_counts(spark, src, dst, ["g"], ["v"]) == ("noop", 2)
    assert dst.version() == v_before


def test_checkpoint_commits_atomically_with_data(spark, tmp_path):
    src = TxTable(str(tmp_path / "src"))
    dst = TxTable(str(tmp_path / "mart"))
    src.overwrite(_batch(spark, 0, 5))
    refresh_mart_counts(spark, src, dst, ["g"])
    m = dst._manifest(dst.version())
    assert m["upstream_version"] == 0
    # time travel still works on the mart, and the OLD manifest carries
    # the OLD checkpoint — state and data can never disagree
    src.append(_batch(spark, 5, 9))
    refresh_mart_counts(spark, src, dst, ["g"])
    assert dst._manifest(0)["upstream_version"] == 0
    assert dst._manifest(1)["upstream_version"] == 1


def test_rewrite_triggers_loud_rebuild(spark, tmp_path):
    src = TxTable(str(tmp_path / "src"))
    dst = TxTable(str(tmp_path / "mart"))
    src.overwrite(_batch(spark, 0, 10))
    refresh_mart_counts(spark, src, dst, ["g"], ["v"])
    # a MERGE rewrites data: the feed past the checkpoint is poisoned,
    # the refresh must fall back to a full recompute and SAY so
    src.merge(
        spark,
        spark.range(0, 4).select(
            (F.col("id") % 3).cast("int").alias("g"),
            (F.col("id") + 100).alias("v"),
        ),
        key_cols=["g", "v"],
    )
    mode, up = refresh_mart_counts(spark, src, dst, ["g"], ["v"])
    assert mode == "rebuild"
    assert _mart(spark, dst) == _full(spark, src)
    # and the feed is healthy again from the new checkpoint on
    src.append(_batch(spark, 50, 55))
    mode, _ = refresh_mart_counts(spark, src, dst, ["g"], ["v"])
    assert mode == "delta"
    assert _mart(spark, dst) == _full(spark, src)
