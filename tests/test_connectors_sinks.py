"""Sources / sinks / orchestration tests (S1-S11, K7-K9, G1-G6) — the
network boundaries are injected fakes; retry/chunk/flatten/render logic
runs for real."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.orchestration import Task, job_matrix, run_pipeline
from etl_python_airflow_bigquery_spark.sinks import (
    render_html_report,
    segment_dictionary,
    send_email_report,
)
from etl_python_airflow_bigquery_spark.sources.connectors import (
    csv_export_source,
    ga_source,
    gen_windows,
    rest_metrics_source,
    with_retry,
)

US_PER_HOUR = 3_600_000_000


def test_gen_windows_chunks_and_guard():
    ws = gen_windows(0, 30 * US_PER_HOUR)
    assert len(ws) == 3 and ws[-1] == (24 * US_PER_HOUR, 30 * US_PER_HOUR)
    assert gen_windows(10, 10) == []


def test_with_retry_recovers():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient")
        return [{"ok": 1}]

    assert with_retry(flaky, retries=5) == [{"ok": 1}]
    assert calls["n"] == 3
    with pytest.raises(RuntimeError, match="failed after 2"):
        with_retry(lambda: (_ for _ in ()).throw(IOError()), retries=2)


def test_rest_metrics_source_per_window(spark):
    def fake_api(spec):
        assert "dimensions" in spec
        return [{"hora_us": spec["date_start_us"], "starts": 7}]

    df = rest_metrics_source(
        spark,
        fake_api,
        {"dimensions": ["hour"]},
        schema="hora_us LONG, starts LONG",
        windows=gen_windows(0, 36 * US_PER_HOUR),
    )
    assert df.count() == 3
    assert df.agg(F.sum("starts")).first()[0] == 21


def test_csv_source_explicit_schema(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("user_id,minutos\n1,10.5\n2,3.25\n")
    df = csv_export_source(spark, str(p), "user_id LONG, minutos DOUBLE")
    assert df.schema.simpleString() == "struct<user_id:bigint,minutos:double>"
    assert df.count() == 2


def test_ga_source_flattens_report(spark):
    report = {
        "dimensionHeaders": [{"name": "pais"}],
        "metricHeaders": [{"name": "sesiones"}],
        "rows": [
            {"dimensionValues": [{"value": "cl"}], "metricValues": [{"value": "5"}]},
            {"dimensionValues": [{"value": "ar"}], "metricValues": [{"value": "3"}]},
        ],
    }
    df = ga_source(spark, [report], "pais STRING, sesiones DOUBLE")
    assert {r["pais"]: r["sesiones"] for r in df.collect()} == {"cl": 5.0, "ar": 3.0}


def test_ga3_source_flattens_and_reassembles_datetime(spark):
    """GA3 (Universal Analytics) proto shape: columnHeader.metricHeader.
    metricHeaderEntries + data.rows[].dimensions/metrics[].values, plus
    the per-agg datetime reassembly branches."""
    from etl_python_airflow_bigquery_spark.sources.connectors import (
        ga3_assemble_datetime,
        ga3_source,
    )

    report = {
        "columnHeader": {
            "dimensions": ["ga:yearMonth", "ga:hour"],
            "metricHeader": {"metricHeaderEntries": [{"name": "sesiones"}]},
        },
        "data": {
            "rows": [
                {"dimensions": ["202401", "05"], "metrics": [{"values": ["7"]}]},
                {"dimensions": ["202402", "23"], "metrics": [{"values": ["3"]}]},
            ]
        },
    }
    df = ga3_source(
        spark, [report], "`ga:yearMonth` STRING, `ga:hour` STRING, sesiones DOUBLE"
    )
    out = ga3_assemble_datetime(df, "mes hora")
    got = {str(r["datetime"]): r["sesiones"] for r in out.collect()}
    assert got == {"2024-01-01 05:00:00": 7.0, "2024-02-01 23:00:00": 3.0}
    assert "ga:yearMonth" not in out.columns and "ga:hour" not in out.columns

    monthly = spark.createDataFrame([("202403",)], "`ga:yearMonth` STRING")
    r = ga3_assemble_datetime(monthly, "mensual").collect()[0]
    assert str(r["datetime"]) == "2024-03-01 00:00:00"
    daily = spark.createDataFrame([("20240315",)], "`ga:date` STRING")
    r = ga3_assemble_datetime(daily, "diario").collect()[0]
    assert str(r["datetime"]) == "2024-03-15 00:00:00"
    hourly = spark.createDataFrame([("2024031518",)], "`ga:dateHour` STRING")
    r = ga3_assemble_datetime(hourly, "hora").collect()[0]
    assert str(r["datetime"]) == "2024-03-15 18:00:00"


def test_ga3_batch_response_one_table_per_request(spark):
    """A GA3 batchGet response zips one report per demographic request;
    empty reports are omitted and '(unknown)' rows dropped — the
    reference's dfs-dict contract (trafico_digital.py:236-262)."""
    from etl_python_airflow_bigquery_spark.sources.connectors import ga3_batch_tables

    def rep(dim, rows):
        return {
            "columnHeader": {
                "dimensions": [dim],
                "metricHeader": {"metricHeaderEntries": [{"name": "sesiones"}]},
            },
            "data": {
                "rows": [
                    {"dimensions": [d], "metrics": [{"values": [v]}]}
                    for d, v in rows
                ]
            },
        }

    response = {
        "reports": [
            rep("ga:userGender", [("female", "5"), ("unknown", "2"), ("male", "3")]),
            rep("ga:userAgeBracket", []),  # empty report → omitted
        ]
    }
    tables = ga3_batch_tables(
        spark,
        response,
        {
            "gender": "`ga:userGender` STRING, sesiones DOUBLE",
            "age": "`ga:userAgeBracket` STRING, sesiones DOUBLE",
        },
        drop_unknown_col="ga:userGender",
    )
    assert set(tables) == {"gender"}
    got = {r["ga:userGender"]: r["sesiones"] for r in tables["gender"].collect()}
    assert got == {"female": 5.0, "male": 3.0}


def test_html_report_and_email_gate(spark):
    df = spark.createDataFrame([(1, "a<b")], "id INT, nota STRING")
    html_doc = render_html_report(df, "nulos & errores")
    assert "a&lt;b" in html_doc and "nulos &amp; errores" in html_doc

    sent = []
    ok = send_email_report(df, "t", ["x@y"], lambda s, to, h: sent.append(s))
    assert ok and sent == ["t"]
    assert not send_email_report(df, "t", ["x@y"], lambda *a: sent.append("no"), skip=True)
    assert sent == ["t"]  # gated send never called


def test_segment_dictionary(spark):
    df = spark.createDataFrame(
        [("vip", "ana@x"), ("vip", "bo@x"), ("free", "cy@x")], "tag STRING, email STRING"
    )
    d = json.loads(segment_dictionary(df, "tag", "email"))
    assert d == {"vip": ["ana@x", "bo@x"], "free": ["cy@x"]}


def test_run_pipeline_flags_and_blocking():
    order = []
    tasks = [
        Task("a", lambda: order.append("a")),
        Task("b", lambda: (_ for _ in ()).throw(ValueError("boom")), depends_on=("a",), retries=2),
        Task("c", lambda: order.append("c"), depends_on=("b",)),
        Task("d", lambda: order.append("d"), depends_on=("a",)),
        Task("skipme", lambda: order.append("s"), gate=lambda: False),
    ]
    m = run_pipeline(tasks)
    assert m.statuses == {
        "a": "ok", "b": "failed", "c": "blocked", "d": "ok", "skipme": "skipped"
    }
    assert not m.ok and "boom" in m.errors["b"]
    assert order == ["a", "d"]


def test_run_pipeline_retries_zero_still_executes():
    """retries=0 must not report 'ok' for work that never ran — every
    non-gated task gets at least one attempt."""
    ran = []
    m = run_pipeline([Task("once", lambda: ran.append(1), retries=0)])
    assert ran == [1] and m.statuses == {"once": "ok"}

    m2 = run_pipeline(
        [Task("boom", lambda: (_ for _ in ()).throw(IOError("x")), retries=0)]
    )
    assert m2.statuses == {"boom": "failed"} and "x" in m2.errors["boom"]


def test_job_matrix():
    combos = job_matrix(agg=["hour", "day"], vip=[0, 1, 5])
    assert len(combos) == 6
    assert {"agg": "hour", "vip": 5} in combos


def test_export_jsonl_roundtrip_and_sharding(spark, sf_dir, tmp_path):
    """JSONL training export: gzip shards, round-trip fidelity, and
    shard routing by the deterministic shuffle column."""
    import os

    from etl_python_airflow_bigquery_spark.queries.text import hex_hash
    from etl_python_airflow_bigquery_spark.sinks import export_jsonl
    from etl_python_airflow_bigquery_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    ).withColumn(
        "shard", (hex_hash(F.col("doc_id").cast("string")) % 4).cast("int")
    )
    path = str(tmp_path / "jsonl")
    export_jsonl(docs, path, shard_col="shard")
    back = spark.read.json(path)
    assert back.count() == docs.count()
    # fidelity: same (doc_id, lang) multiset
    a = {(r["doc_id"], r["lang"]) for r in docs.collect()}
    b = {(r["doc_id"], r["lang"]) for r in back.collect()}
    assert a == b
    # gzip parts present
    parts = [f for f in os.listdir(path) if f.endswith(".json.gz")]
    assert parts


def test_feriados_source_parses_gob_cl_shape_and_completes(spark):
    """S7: the gob.cl holidays JSON (fecha/nombre/irrenunciable-as-'1'/'0'
    strings) parses into the dicc_feriados frame and right-join-completes
    over the requested calendar with feriado fillna(False)
    (ApiFeriados_etl_Bigquery.ipynb cells 4-9)."""
    from etl_python_airflow_bigquery_spark.sources.connectors import (
        feriados_source,
    )

    payload = [
        {"nombre": "Año Nuevo", "fecha": "2024-01-01", "irrenunciable": "1",
         "tipo": "Civil", "comentarios": None},
        {"nombre": "Feriado Regional", "fecha": "2024-01-05",
         "irrenunciable": "0", "tipo": "Civil"},
    ]
    calls = {"n": 0}

    def flaky_fetch():
        calls["n"] += 1
        if calls["n"] < 2:  # first attempt fails → retry path runs
            raise ConnectionError("flaky")
        return payload

    df = feriados_source(spark, flaky_fetch, "2024-01-01", "2024-01-10")
    rows = {r["fecha"]: r for r in df.collect()}
    assert len(rows) == 10  # completed calendar, one row per day
    assert rows["2024-01-01"]["feriado"] and rows["2024-01-01"]["irrenunciable"]
    assert rows["2024-01-01"]["descripcion"] == "Año Nuevo"
    assert rows["2024-01-05"]["feriado"] and not rows["2024-01-05"]["irrenunciable"]
    # non-holidays: feriado filled False, detail columns stay NULL
    assert rows["2024-01-02"]["feriado"] is False
    assert rows["2024-01-02"]["descripcion"] is None
    # day_num keys the engine's calendar joins (epoch day of the date)
    assert rows["2024-01-01"]["day_num"] == 19723
    # the completion output can stand in for day_grid's feriado flags in
    # right_join_calendar-class queries (same grain, same key)
    assert df.where(F.col("feriado")).count() == 2
