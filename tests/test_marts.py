"""Mart lifecycle tests: source-content staleness (the warehouse
outlives datasets — a regenerated source must never serve a stale
layout)."""

from __future__ import annotations

import os


def test_mart_rebuilds_when_source_content_changes(spark, sf_dir, tmp_path):
    """The warehouse outlives datasets: a mart built from one source
    must NOT serve when the same path holds different content — the
    signature gate drops and rebuilds it; an unchanged source reuses
    the existing table (no drop, same recorded signature)."""
    import shutil

    from etl_python_airflow_bigquery_spark.catalog import (
        mart_name,
        stored_mart_signature,
    )
    from etl_python_airflow_bigquery_spark.queries.marts import (
        atomos_usuario_mart,
    )
    from etl_python_airflow_bigquery_spark.tables import load_table

    ds = str(tmp_path / "sfX")
    os.makedirs(ds)
    events = load_table(spark, sf_dir, "events")
    events.limit(200).coalesce(1).write.parquet(ds + "/events.parquet")

    name = mart_name("atomos_usuario_dia", ds)
    n1 = atomos_usuario_mart(spark, ds).count()
    sig1 = stored_mart_signature(spark, name)
    assert sig1 is not None

    # unchanged source: the getter must reuse (signature stays put)
    assert atomos_usuario_mart(spark, ds).count() == n1
    assert stored_mart_signature(spark, name) == sig1

    # REWRITE the dataset in place (fewer rows, new files)
    shutil.rmtree(ds + "/events.parquet")
    events.limit(60).coalesce(1).write.parquet(ds + "/events.parquet")
    n2 = atomos_usuario_mart(spark, ds).count()
    sig2 = stored_mart_signature(spark, name)
    assert sig2 != sig1  # rebuilt from the new content
    assert n2 < n1  # and the answer reflects it

    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
