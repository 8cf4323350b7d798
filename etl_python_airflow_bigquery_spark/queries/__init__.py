"""Query registry — the correctness surface behind ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 registers here as a named
query (a ``(spark, sf_dir) -> DataFrame`` callable) plus, where
SQL-expressible, an equivalent ANSI-SQL oracle string that DuckDB runs on
the same parquet tables. Column names/types are aligned on both sides so
the driver's order-insensitive value hash matches.

Parity rules used throughout (see functions.py):
* interval math in epoch-µs integers (unix_micros ↔ epoch_us);
* dates derived by epoch-day integer arithmetic (session-tz-proof);
* double SUMs routed through decimal (order-insensitive, bit-exact);
* TRUNC(x,1) as floor(x*10)/10 on both sides;
* every computed column explicitly aliased and typed.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    ops: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 codes
    bench: bool = False  # include in bench.py headline set
    # driver=True ⇒ exposed through __spark_entry__.queries() (the round
    # driver records at most ~50 entries, so the surface is curated to
    # exactly 50); driver=False queries stay registered — pytest still
    # oracle-checks them at sf0.001 and bench.py can still time them —
    # they just don't occupy a driver slot when an overlapping query
    # already covers their SURVEY §2 ops.
    driver: bool = True
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    ops: tuple[str, ...] = (),
    bench: bool = False,
    driver: bool = True,
):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, ops=ops, bench=bench, driver=driver,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


# Populate the registry (import order = SURVEY §7.1 build order).
from etl_python_airflow_bigquery_spark.queries import core  # noqa: E402,F401
from etl_python_airflow_bigquery_spark.queries import joins  # noqa: E402,F401
from etl_python_airflow_bigquery_spark.queries import reshape  # noqa: E402,F401
from etl_python_airflow_bigquery_spark.queries import analytic  # noqa: E402,F401
from etl_python_airflow_bigquery_spark.queries import text  # noqa: E402,F401
from etl_python_airflow_bigquery_spark.queries import similarity  # noqa: E402,F401
from etl_python_airflow_bigquery_spark.queries import serving  # noqa: E402,F401
from etl_python_airflow_bigquery_spark.queries import dedup  # noqa: E402,F401
from etl_python_airflow_bigquery_spark.queries import lifecycle  # noqa: E402,F401
from etl_python_airflow_bigquery_spark.queries import streaming_q  # noqa: E402,F401
from etl_python_airflow_bigquery_spark.queries import enrich_q  # noqa: E402,F401
from etl_python_airflow_bigquery_spark.queries import multimodal_q  # noqa: E402,F401
from etl_python_airflow_bigquery_spark.queries import extras  # noqa: E402,F401
from etl_python_airflow_bigquery_spark.queries import marts  # noqa: E402,F401
from etl_python_airflow_bigquery_spark.queries import programas_q  # noqa: E402,F401
from etl_python_airflow_bigquery_spark.queries import curation  # noqa: E402,F401
