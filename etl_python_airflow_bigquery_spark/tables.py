"""Testdata table loaders.

The driver materializes a TPC-H-ish star schema plus ``events`` (stream
fact), ``documents`` and ``embeddings`` (LLM-pipeline extensions) under
``/root/testdata/sf*/`` (TESTDATA.md). These stand in for the reference's
production tables per the mapping in FIXTURES.md (e.g. ``events`` plays
``consumo.consumo_detalle``, the playback-session fact declared at
reference consumo_detalle.py:270-306; ``customer`` plays the user
registries of indicadores_cia.py:53-70).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Parquet/ORC scan → full Catalyst pushdown
    (filters, column pruning, row-group/stripe skipping) for every query
    built on top.

    ``events.ts``'s PHYSICAL encoding has changed between testdata drops
    (TIMESTAMP(NANOS) vs timestamp[us]); ``nanosAsLong`` is set so a
    nanos drop loads as a raw BIGINT instead of erroring, while a µs drop
    loads as TIMESTAMP_NTZ unaffected. Consumers never assume either:
    they read the column through the schema-adaptive accessors
    (functions.event_us_sql and friends).

    FORMAT is detected from the file present (same robustness posture as
    the type accessors — a drop could switch container formats too):
    parquet and ORC keep exact types end to end; CSV/JSON fall back to
    header+schema inference (S2/S9-style exports, best-effort typing).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    base = os.path.join(sf_dir, name)
    if os.path.exists(f"{base}.parquet"):
        return spark.read.parquet(f"{base}.parquet")
    if os.path.exists(f"{base}.orc"):
        return spark.read.orc(f"{base}.orc")
    if os.path.exists(f"{base}.csv"):
        return spark.read.csv(f"{base}.csv", header=True, inferSchema=True)
    if os.path.exists(f"{base}.json"):
        return spark.read.json(f"{base}.json")
    raise FileNotFoundError(
        f"table {name!r} not found under {sf_dir!r} "
        "(tried .parquet/.orc/.csv/.json)"
    )


def rebalance(df: DataFrame) -> DataFrame:
    """Spread a SMALL scan across the executor cores before CPU-bound
    derivation (md5 shingling, per-dimension vector math): a few-MB
    parquet file arrives as 1-3 input splits, which would serialize all
    downstream per-row compute on a 32-core executor. Gated on the actual
    scan partition count, so at production scale — where the input
    already has ≥ defaultParallelism splits — this adds NO shuffle; the
    round-robin exchange only fires for inputs small enough that its
    cost is microscopic against the compute it parallelizes."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so operators can be expressed
    in either DataFrame or SQL form (same Catalyst plan)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
