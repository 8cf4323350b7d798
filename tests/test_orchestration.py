"""Maintenance runbook pipeline (orchestration.maintenance_pipeline):
the G1-G6 task graph that composes mart signature refresh, index
compaction/vacuum, and probe recalibration."""

from __future__ import annotations


def test_maintenance_pipeline_runs_the_operational_runbook(
    spark, sf_dir, tmp_path
):
    """maintenance_pipeline: marts refresh behind their signature gate,
    both indexes compact/vacuum behind their gates, and the ANN index
    comes out CALIBRATED (nprobe_calibrado recorded) — one manifest,
    every task ok. Without index paths the index chains skip cleanly."""
    from etl_python_airflow_bigquery_spark.operators.ann_index import (
        build_ivf_index,
        read_index_meta,
    )
    from etl_python_airflow_bigquery_spark.operators.lex_index import (
        build_lex_index,
    )
    from etl_python_airflow_bigquery_spark.orchestration import (
        maintenance_pipeline,
    )
    from etl_python_airflow_bigquery_spark.tables import load_table

    idx = str(tmp_path / "idx")
    lex = str(tmp_path / "lex")
    build_ivf_index(spark, load_table(spark, sf_dir, "embeddings"), idx)
    build_lex_index(spark, load_table(spark, sf_dir, "documents"), lex)

    m = maintenance_pipeline(spark, sf_dir, index_path=idx, lex_path=lex)
    assert m.ok, (m.statuses, m.errors)
    assert m.statuses["ann_calibrado"] == "ok"
    meta = read_index_meta(idx)
    assert meta["nprobe_calibrado"] >= 1
    assert 0 <= meta["recall_mili_calibrado"] <= 1000

    # no index paths: the index chains are gate-skipped, marts still run
    m2 = maintenance_pipeline(spark, sf_dir)
    assert m2.ok
    assert m2.statuses["ann_compacto"] == "skipped"
    assert m2.statuses["ann_calibrado"] == "skipped"
    assert m2.statuses["lex_vacuum"] == "skipped"
    assert m2.statuses["marts_frescos"] == "ok"
