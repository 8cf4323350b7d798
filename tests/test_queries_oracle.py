"""Every registered query with an oracle must hash-match DuckDB at sf0.001
(the driver does the same at sf0.01 — same comparison semantics:
row count + schema + order-insensitive values)."""

from __future__ import annotations

import pytest

from etl_python_airflow_bigquery_spark.queries import REGISTRY
from tools.compare import compare_frames

ORACLED = sorted(name for name, q in REGISTRY.items() if q.oracle)
ROWS_ONLY = sorted(name for name, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = REGISTRY[name]
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(q.oracle).fetchdf()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(name, spark, sf_dir):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
