"""Skew-mitigation helpers (operators/skew.py): both rewrites must be
EXACT — identical rows to the plain formulation — on data with one hot
key carrying most rows, and the salted join must actually join on the
compound (key, salt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.operators.skew import (
    salted_broadcast_left,
    salted_count_distinct,
)


def _skewed(spark):
    # key 'hot' holds 900 of 960 rows; users overlap across keys
    rows = [("hot", u % 300) for u in range(900)] + [
        (f"k{u % 4}", u) for u in range(60)
    ]
    return spark.createDataFrame(rows, "k string, user_id int")


def test_salted_count_distinct_is_exact(spark):
    df = _skewed(spark)
    plain = {
        (r["k"], r["n"])
        for r in df.groupBy("k")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n"))
        .collect()
    }
    salted = {
        (r["k"], r["usuarios"])
        for r in salted_count_distinct(df, ["k"], "user_id", "usuarios").collect()
    }
    assert salted == plain


def test_aqe_splits_the_skewed_join_partition(spark):
    """The session's AQE skew-join config must actually fire: with one
    key holding ~90% of the rows, the FINAL adaptive plan marks the
    sort-merge join skew=true and reads the hot shuffle partition as
    multiple splits (thresholds lowered so local-scale data exhibits
    what a hot key does at 100 TB)."""
    conf = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(220_000).select(
            F.when(F.col("id") < 200_000, F.lit(0))
            .otherwise(F.col("id") % 37)
            .cast("long")
            .alias("k"),
            F.rand(7).alias("x"),
        )
        right = spark.range(37).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        j = left.join(right, "k").select(F.sum("x").alias("s"))
        j.collect()  # the adaptive plan finalizes only after execution
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_broadcast_left_matches_plain_join(spark):
    df = _skewed(spark)
    dim = spark.createDataFrame(
        [("hot", "caliente"), ("k0", "cero"), ("k1", "uno")], "k string, nombre string"
    )
    plain = sorted(
        (r["k"], r["user_id"], r["nombre"]) for r in df.join(dim, "k").collect()
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = salted_broadcast_left(df, dim, "k", n_salts=8)
        got = sorted(
            (r["k"], r["user_id"], r["nombre"]) for r in joined.collect()
        )
        assert got == plain
        # the shuffle key is the compound (k, salt): the hot key's rows
        # now hash across n_salts reducers
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "__salt" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bloom_semijoin_exact_and_reduces_shuffle_input(spark, sf_dir):
    """ROADMAP candidate D: the Bloom prefilter must (a) return exactly
    the plain semi join, and (b) actually shrink the rows entering the
    exact join for a selective key set."""
    from etl_python_airflow_bigquery_spark.operators.skew import bloom_semijoin
    from etl_python_airflow_bigquery_spark.tables import load_table

    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    urgentes = orders.where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    got = bloom_semijoin(li, "l_orderkey", urgentes, "o_orderkey")
    exact = li.join(
        urgentes.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
        "l_orderkey",
        "left_semi",
    )
    assert got.count() == exact.count()
    a = {r["l_orderkey"] for r in got.select("l_orderkey").distinct().collect()}
    b = {r["l_orderkey"] for r in exact.select("l_orderkey").distinct().collect()}
    assert a == b
    # selectivity: the PREFILTER ALONE (refine=False) passes a superset
    # of the true matches but far fewer rows than the table — this is
    # the shuffle-input reduction the technique buys
    survivors = bloom_semijoin(
        li, "l_orderkey", urgentes, "o_orderkey", refine=False
    ).count()
    n_total, n_exact = li.count(), exact.count()
    assert n_exact <= survivors < n_total * 0.4
