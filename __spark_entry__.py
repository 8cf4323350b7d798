"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in the engine's registry
(``etl_python_airflow_bigquery_spark/queries/``); this module is a thin
adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_python_airflow_bigquery_spark.queries import REGISTRY  # noqa: E402

FLAGSHIP = "indicadores_total"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 — the
    driver-tier surface, curated to exactly 50 entries so the round
    driver (which records ~50) covers every one of them; overlapping
    variants stay in the registry behind ``driver=False`` with pytest
    oracle coverage (tests/test_queries_oracle.py runs the FULL
    registry)."""
    return {name: q.fn for name, q in REGISTRY.items() if q.driver}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted ⇒ rows-only)."""
    return {
        name: q.oracle
        for name, q in REGISTRY.items()
        if q.driver and q.oracle is not None
    }
