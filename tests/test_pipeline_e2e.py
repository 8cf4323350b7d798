"""End-to-end pipeline test: the reference's master pattern (SURVEY.md
intro — window → idempotent refresh → transform → partitioned load →
orchestrated DAG) executed through the engine's own layers: queries →
write operators → orchestration shell → monitoring sink."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.operators.writes import refresh_window
from etl_python_airflow_bigquery_spark.orchestration import Task, run_pipeline
from etl_python_airflow_bigquery_spark.queries import REGISTRY
from etl_python_airflow_bigquery_spark.sinks import render_html_report


def test_mart_build_pipeline(spark, sf_dir, tmp_path):
    marts = {
        "indicadores": str(tmp_path / "indicadores"),
        "funnel": str(tmp_path / "funnel"),
    }
    reports: list[str] = []

    def build_indicadores():
        df = REGISTRY["indicadores_total"].fn(spark, sf_dir)
        # MONTH-partition convention of the reference (indicadores_cia.py:82-86):
        # derive the partition column, land with dynamic overwrite
        out = df.withColumn("mes", F.lit("2024-01"))
        refresh_window(out, marts["indicadores"], ["mes"], cluster_cols=["user_id"])

    def build_funnel():
        df = REGISTRY["funnel_vip"].fn(spark, sf_dir)
        refresh_window(
            df.withColumn("mes", F.lit("2024-01")), marts["funnel"], ["mes"]
        )

    def monitor():
        landed = spark.read.parquet(marts["indicadores"])
        reports.append(render_html_report(landed.limit(5), "seguimiento"))

    manifest = run_pipeline(
        [
            Task("indicadores", build_indicadores),
            Task("funnel", build_funnel),
            Task("monitor", monitor, depends_on=("indicadores", "funnel")),
        ]
    )
    assert manifest.ok, manifest.errors
    assert manifest.statuses == {"indicadores": "ok", "funnel": "ok", "monitor": "ok"}

    back_count = spark.read.parquet(marts["indicadores"]).count()
    assert back_count == REGISTRY["indicadores_total"].fn(spark, sf_dir).count()
    assert "mes=2024-01" in " ".join(
        __import__("os").listdir(marts["indicadores"])
    )
    assert reports and "<table" in reports[0]

    # idempotent re-run: same partitions replaced, same row count
    manifest2 = run_pipeline([Task("indicadores", build_indicadores)])
    assert manifest2.ok
    assert spark.read.parquet(marts["indicadores"]).count() == back_count
    assert json.dumps(manifest.timings_s)  # serializable run manifest
