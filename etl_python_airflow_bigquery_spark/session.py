"""SparkSession factory.

Defaults are tuned for the local[N] harness but every knob matters at
cluster scale too: AQE re-plans skewed shuffles at runtime, the shuffle
partition count tracks cores locally (on a real cluster you'd size it to
~2-3x total cores / let AQE coalesce), Arrow speeds every pandas_udf
boundary, and UTC session time keeps timestamp semantics identical to the
DuckDB oracle and to the reference's store-UTC/compute-local convention
(reference indicadores_cia.py:123-124 does the tz shift explicitly in SQL).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_python_airflow_bigquery_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Scale notes: everything here is config, not code — the same plans run
    unchanged on a 1000-executor cluster; only master/memory/partitions
    change. Dynamic partition overwrite is on so the idempotent
    delete-window-then-append refresh (reference consumo_detalle.py:317-340)
    is a single atomic ``mode("overwrite")`` write that touches only the
    partitions present in the incoming frame.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4)))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
