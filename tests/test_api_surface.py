"""Coverage for the long-tail API surface (K6/K7 sinks, S1/S8/S11
sources, identity scalars, the 2-column geo wrapper, batch loaders) —
every public function the estate exposes must execute, not just exist."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.functions import (
    device_fingerprint,
    micros,
    surrogate_id,
)
from etl_python_airflow_bigquery_spark.operators.enrich import lookup_geo
from etl_python_airflow_bigquery_spark.sinks import export_csv, export_excel
from etl_python_airflow_bigquery_spark.sources.connectors import (
    config_source,
    jdbc_source,
    json_lines_source,
)
from etl_python_airflow_bigquery_spark.tables import TABLES, load_tables


def test_export_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, tag string")
    path = str(tmp_path / "csv_out")
    export_csv(df, path, single_file=True)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == 2 and set(back.columns) == {"id", "tag"}
    # single_file=True coalesced to one part
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(parts) == 1


def test_export_excel_is_availability_gated(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "id int")
    path = str(tmp_path / "r.xlsx")
    ok = export_excel({"hoja": df}, path)
    try:
        import openpyxl  # noqa: F401

        assert ok and os.path.exists(path)
    except ImportError:
        assert ok is False and not os.path.exists(path)


def test_json_lines_source(spark, tmp_path):
    p = tmp_path / "m.jsonl"
    p.write_text('{"id": 1, "v": 2.5}\n{"id": 2, "v": 0.5}\n')
    df = json_lines_source(spark, str(p), "id BIGINT, v DOUBLE")
    assert df.count() == 2
    assert dict(df.dtypes) == {"id": "bigint", "v": "double"}


def test_config_source_parses_both_forms():
    assert config_source('{"tasa": 5}') == {"tasa": 5}
    assert config_source({"tasa": 5}) == {"tasa": 5}


def test_jdbc_source_wiring_reaches_jvm(spark):
    # no JDBC driver ships in this harness: the read must FAIL AT THE
    # DRIVER-MANAGER (options wired through to the JVM), not in Python
    with pytest.raises(Exception, match="[Dd]river|JDBC"):
        jdbc_source(
            spark,
            "jdbc:postgresql://localhost:1/none",
            "t",
            partition_column="id",
            lower_bound=0,
            upper_bound=10,
        )


def test_jdbc_sink_wiring_reaches_jvm(spark):
    from etl_python_airflow_bigquery_spark.sinks import jdbc_sink

    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(Exception, match="[Dd]river|JDBC"):
        jdbc_sink(df, "jdbc:postgresql://localhost:1/none", "t")


def test_us_to_date_is_utc_calendar(spark):
    from etl_python_airflow_bigquery_spark.functions import us_to_date

    # 2024-03-05 23:30 UTC stays March 5 regardless of session tz
    us = (19_787 * 86_400 + 23 * 3600 + 1800) * 1_000_000
    df = spark.range(1).select(us_to_date(F.lit(us).cast("long")).alias("d"))
    assert str(df.collect()[0]["d"]) == "2024-03-05"


def test_device_fingerprint_matches_duckdb(spark, duck):
    df = spark.createDataFrame(
        [("10.0.0.1", "Mozilla"), ("10.0.0.2", "curl")], "ip string, ua string"
    )
    got = [r["h"] for r in df.select(device_fingerprint("ip", "ua").alias("h")).collect()]
    want = [
        duck.execute(f"SELECT md5('{ip}' || '|' || '{ua}')").fetchone()[0]
        for ip, ua in [("10.0.0.1", "Mozilla"), ("10.0.0.2", "curl")]
    ]
    assert got == want


def test_surrogate_id_is_deterministic_and_shaped(spark):
    df = spark.createDataFrame(
        [("Facebook", "Radio1", "2024-03-05 14:00:00", "Hora", "Web")],
        "fuente string, marca string, ts string, agg string, target string",
    ).withColumn("fecha_us", micros("CAST(ts AS TIMESTAMP_NTZ)"))
    sid = df.select(
        surrogate_id(
            F.col("fuente"), F.col("marca"), F.col("fecha_us"),
            F.col("agg"), F.col("target"),
        ).alias("sid")
    ).collect()[0]["sid"]
    assert sid == "f_rad_24030514_hora_web"


def test_lookup_geo_country_split():
    out = lookup_geo(pd.DataFrame({"request_ip": ["10.3.0.1"]}))
    assert list(out.columns) == ["request_ip", "pais", "ciudad"]
    assert len(out) == 1 and out["pais"].iloc[0]  # stand-in db resolves


def test_load_tables_loads_all(spark, sf_dir):
    tables = load_tables(spark, sf_dir)
    assert set(tables) == set(TABLES)
    assert tables["region"].count() == 5


def test_every_survey_op_keeps_a_driver_row():
    """Rotation guard: the driver surface is curated to exactly 50, and
    no SURVEY §2 op code may lose its last driver-tier representative —
    the invariant every rotation must check."""
    from etl_python_airflow_bigquery_spark.queries import REGISTRY

    driver = {n: q for n, q in REGISTRY.items() if q.driver}
    assert len(driver) == 50
    all_ops = {op for q in REGISTRY.values() for op in q.ops}
    driver_ops = {op for q in driver.values() for op in q.ops}
    assert all_ops - driver_ops == set(), (
        f"ops without a driver row: {sorted(all_ops - driver_ops)}"
    )


def test_every_registry_op_tag_is_mapped():
    """Coverage-map invariant: every op tag any query carries must have a
    row in tools/coverage_map.py's OP_LABELS (single-letter family tags
    S*/K* roll up to their family row) — otherwise the generated
    COVERAGE.md silently drops coverage the registry actually has."""
    from etl_python_airflow_bigquery_spark.queries import REGISTRY
    from tools.coverage_map import OP_LABELS

    tagged = {op for q in REGISTRY.values() for op in q.ops}
    unmapped = sorted(tagged - set(OP_LABELS))
    assert unmapped == [], f"op tags missing from OP_LABELS: {unmapped}"


def test_readme_registry_counts_match_code():
    """The README's registry counts are hand-maintained next to each new
    operator — pin them to the code so the docs cannot drift."""
    import os
    import re

    from etl_python_airflow_bigquery_spark.queries import REGISTRY

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readme = open(os.path.join(root, "README.md")).read()
    m = re.search(
        r"the correctness surface: (\d+) named queries, (\d+) with a", readme
    )
    assert m, "README registry blurb not found"
    assert int(m.group(1)) == len(REGISTRY)
    assert int(m.group(2)) == sum(
        1 for q in REGISTRY.values() if q.oracle is not None
    )


def test_core12_bench_membership_is_pinned():
    """core_wall's meaning depends on CORE_12 never changing: the tuple
    is pinned here BY VALUE (editing bench.py without editing this test
    fails), every member must exist in the registry, and every member
    must still be timed by the bench (bench-gated or force-included)."""
    import bench
    from etl_python_airflow_bigquery_spark.queries import REGISTRY

    assert bench.CORE_12 == (
        "indicadores_total",
        "pricing_summary",
        "funnel_vip",
        "programas_live",
        "bloques_pivot",
        "superposicion_hora",
        "similarity_lsh",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "sessionization",
        "rollup_periodos",
        "corpus_desduplicado",
    )
    for name in bench.CORE_12:
        assert name in REGISTRY, name


def test_every_survey2_op_has_a_coverage_row():
    """VERDICT r8 #7: the "every SURVEY §2 op appears in COVERAGE.md"
    invariant, mechanically. Tags are parsed from SURVEY.md §2's tables
    (the source of truth), each must be an OP_LABELS key, and the
    regenerated COVERAGE.md on disk must carry its row."""
    import re

    from tools.coverage_map import OP_LABELS

    with open("SURVEY.md") as fh:
        text = fh.read()
    sec2 = text.split("## 2. ")[1].split("\n## ")[0]
    tags = set(re.findall(r"^\| ([A-Z]+[0-9]+) \|", sec2, re.M))
    assert tags, "SURVEY.md §2 parse found no op tags"
    missing = sorted(tags - set(OP_LABELS))
    assert missing == [], f"SURVEY §2 tags without OP_LABELS rows: {missing}"
    with open("COVERAGE.md") as fh:
        cov = fh.read()
    absent = sorted(t for t in tags if f"| {t} |" not in cov)
    assert absent == [], f"SURVEY §2 tags missing from COVERAGE.md: {absent}"
