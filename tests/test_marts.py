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


def test_second_source_mart_gates_on_its_own_table(spark, sf_dir, tmp_path):
    """ROADMAP r13 #4: the generalized staleness gate. The documents-
    derived quality mart must rebuild when DOCUMENTS content changes and
    must NOT be invalidated by an events regeneration — each mart
    fingerprints its own source table."""
    import shutil

    from etl_python_airflow_bigquery_spark.catalog import (
        mart_name,
        stored_mart_signature,
    )
    from etl_python_airflow_bigquery_spark.queries import REGISTRY
    from etl_python_airflow_bigquery_spark.queries.marts import (
        documentos_calidad_mart,
    )
    from etl_python_airflow_bigquery_spark.tables import load_table

    ds = str(tmp_path / "sfD")
    os.makedirs(ds)
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")
    docs.limit(80).coalesce(1).write.parquet(ds + "/documents.parquet")
    events.limit(50).coalesce(1).write.parquet(ds + "/events.parquet")

    name = mart_name("documentos_calidad", ds)
    try:
        n1 = documentos_calidad_mart(spark, ds).count()
        sig1 = stored_mart_signature(spark, name)
        assert n1 == 80 and sig1 is not None

        # regenerate EVENTS: the documents mart must stay put
        shutil.rmtree(ds + "/events.parquet")
        events.limit(20).coalesce(1).write.parquet(ds + "/events.parquet")
        assert documentos_calidad_mart(spark, ds).count() == n1
        assert stored_mart_signature(spark, name) == sig1

        # regenerate DOCUMENTS: the gate must drop + rebuild
        shutil.rmtree(ds + "/documents.parquet")
        docs.limit(30).coalesce(1).write.parquet(ds + "/documents.parquet")
        assert documentos_calidad_mart(spark, ds).count() == 30
        assert stored_mart_signature(spark, name) != sig1

        # and the registered rollup answers from the new content
        from pyspark.sql import functions as F

        got = REGISTRY["calidad_por_fuente"].fn(spark, ds)
        assert got.agg(F.sum("n_docs").cast("bigint")).first()[0] == 30
    finally:
        spark.sql(f"DROP TABLE IF EXISTS `{name}`")


def test_window_refresh_does_not_stamp_uncovered_source_changes(
    spark, sf_dir, tmp_path
):
    """ADVICE r12 (medium): a WINDOWED refresh must not record the full
    current source signature when the source changed outside its window
    — the stale stored signature must stand so the next getter access
    force-rebuilds. With covers_source_changes=True (a change-feed-
    derived window) the stamp is recorded and the incremental path
    stays incremental."""
    import shutil

    from pyspark.sql import functions as F

    from etl_python_airflow_bigquery_spark.catalog import (
        mart_name,
        source_signature,
        stored_mart_signature,
    )
    from etl_python_airflow_bigquery_spark.functions import event_day_num
    from etl_python_airflow_bigquery_spark.queries.marts import (
        eventos_usuario_mart,
        refresh_eventos_usuario_mart,
    )
    from etl_python_airflow_bigquery_spark.tables import load_table

    ds = str(tmp_path / "sfW")
    os.makedirs(ds)
    events = load_table(spark, sf_dir, "events")
    dnum = event_day_num(events).cast("bigint")
    events.limit(400).coalesce(1).write.parquet(ds + "/events.parquet")

    name = mart_name("eventos_usuario", ds)
    try:
        mart = eventos_usuario_mart(spark, ds)
        days = sorted(
            r[0] for r in mart.select("day_num").distinct().collect()
        )
        assert len(days) >= 3
        sig1 = stored_mart_signature(spark, name)
        assert sig1 is not None

        # change the source OUTSIDE the refresh window: drop the first
        # day's rows entirely
        src = load_table(spark, ds, "events")
        resto = src.where(
            event_day_num(src).cast("bigint") != days[0]
        ).collect()
        shutil.rmtree(ds + "/events.parquet")
        spark.createDataFrame(resto, src.schema).coalesce(1).write.parquet(
            ds + "/events.parquet"
        )

        # refresh ONLY the last day — does not cover the day-0 change
        refresh_eventos_usuario_mart(spark, ds, [days[-1]])
        assert stored_mart_signature(spark, name) != source_signature(
            ds, "events"
        )  # NOT stamped fresh

        # next getter access force-rebuilds from the new content: the
        # dropped day is gone from the mart
        mart2 = eventos_usuario_mart(spark, ds)
        assert mart2.where(F.col("day_num") == days[0]).count() == 0

        # a coverage-asserted refresh DOES stamp (incremental path)
        resto2 = [
            r for r in resto
        ]  # unchanged content, rewrite files to shift the signature
        shutil.rmtree(ds + "/events.parquet")
        spark.createDataFrame(resto2, src.schema).coalesce(1).write.parquet(
            ds + "/events.parquet"
        )
        refresh_eventos_usuario_mart(
            spark, ds, [days[-1]], covers_source_changes=True
        )
        assert stored_mart_signature(spark, name) == source_signature(
            ds, "events"
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS `{name}`")
