"""Streaming-layer tests: the foreachBatch + dynamic-partition-overwrite
pipeline lands the same totals as the batch aggregation, and re-running
with a fresh checkpoint is idempotent (K3 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.streaming.jobs import (
    events_dir_for,
    run_hourly_refresh,
)
from etl_python_airflow_bigquery_spark.tables import load_table


def test_hourly_refresh_matches_batch(spark, sf_dir, tmp_path):
    out = str(tmp_path / "hourly")
    run_hourly_refresh(
        spark, events_dir_for(sf_dir), out, checkpoint=str(tmp_path / "ck1")
    )
    landed = spark.read.parquet(out)

    events = load_table(spark, sf_dir, "events")
    batch = events.groupBy(
        F.expr("ts div 3600000000000").alias("hora"), "event_type"
    ).agg(F.count(F.lit(1)).alias("eventos"))

    assert landed.count() == batch.count()
    assert landed.agg(F.sum("eventos")).first()[0] == events.count()

    # idempotent re-run (fresh checkpoint → same partitions rewritten)
    run_hourly_refresh(
        spark, events_dir_for(sf_dir), out, checkpoint=str(tmp_path / "ck2")
    )
    assert spark.read.parquet(out).count() == batch.count()
