"""Core session-layer queries (SURVEY.md §7.1 steps 1-2).

``indicadores_total`` is the engine's flagship — the full RDF pattern of
reference indicadores_cia.py:106-167 re-expressed Spark-first: registered
users x playback sessions x business-day calendar via interval-overlap +
clipping, then grouped sums / distinct-day counts / guarded ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.dims import habil_expr
from etl_python_airflow_bigquery_spark.functions import (
    safe_div,
    trunc1,
    ts_lit_for,
)
from etl_python_airflow_bigquery_spark.operators.intervals import (
    DAY_TIER_MIN_DAYS,
    explode_to_hour_grid,
    sessions_from_events,
)
from etl_python_airflow_bigquery_spark.queries import register
from etl_python_airflow_bigquery_spark.tables import load_table

_INDICADORES_ORACLE = """
WITH sess AS (
    SELECT user_id,
           epoch_us(ts) AS s_us,
           epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT) AS e_us
    FROM events
),
atoms AS (
    SELECT s.user_id, s.s_us, s.e_us, g.i AS hour_idx
    FROM sess s, LATERAL unnest(generate_series(s.s_us // 3600000000,
                                                (s.e_us - 1) // 3600000000)) AS g(i)
    WHERE s.e_us > s.s_us
),
clipped AS (
    SELECT user_id,
           hour_idx // 24 AS day_num,
           greatest(least(e_us, (hour_idx + 1) * 3600000000)
                    - greatest(s_us, hour_idx * 3600000000), 0) AS clip_us
    FROM atoms
),
habil AS (
    SELECT c.user_id, c.day_num, c.clip_us
    FROM clipped c
    WHERE dayofweek(DATE '1970-01-01' + CAST(c.day_num AS INT)) BETWEEN 1 AND 5
      AND day(DATE '1970-01-01' + CAST(c.day_num AS INT)) NOT IN (7, 19)
),
registrado AS (
    SELECT c_custkey AS user_id, c_name AS nombre,
           CAST(CASE WHEN (DATE '2023-01-01' + CAST(c_custkey % 500 AS INT)) <= DATE '2024-01-01'
                     THEN 30
                     ELSE datediff('day', DATE '2023-01-01' + CAST(c_custkey % 500 AS INT),
                                   DATE '2024-01-31')
                END AS BIGINT) AS dias_registrado
    FROM customer
),
agg AS (
    SELECT user_id,
           CAST(sum(clip_us) AS DOUBLE) / 60000000.0 AS sum_minutos,
           CAST(count(DISTINCT day_num) AS BIGINT) AS q_dias
    FROM habil
    GROUP BY user_id
)
SELECT r.user_id, r.nombre, r.dias_registrado,
       a.sum_minutos, a.q_dias,
       floor((CASE WHEN a.q_dias = 0 THEN 0.0
                   ELSE a.sum_minutos / a.q_dias END) * 10) / 10 AS prom,
       floor((CASE WHEN r.dias_registrado = 0 THEN 0.0
                   ELSE CAST(a.q_dias AS DOUBLE) / r.dias_registrado END) * 10) / 10 AS freq
FROM registrado r
JOIN agg a ON a.user_id = r.user_id
"""


@register(
    "indicadores_total",
    oracle=_INDICADORES_ORACLE,
    ops=("J1", "J3", "A1", "A2", "A3", "A4", "P2", "P3", "P6", "P7"),
    bench=True, driver=True)
def indicadores_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user listening indicators over business days (flagship).

    Reference lifecycle (indicadores_cia.py:106-172): registered-user CTE
    with a CASE'd days-registered column → sessions tz-normalized →
    interval-overlap join to the hora calendar with LEAST/GREATEST clipping
    → sum(minutes), count(distinct day), prom/freq with zero-guards.

    Spark-first plan: sessions explode map-side into covered hour buckets
    (no grid join, no shuffle until the final groupBy), the business-day
    calendar joins as a broadcast dim, and the single shuffle is the
    per-user aggregation. Scale: fan-out is bounded by session length
    (minutes → a handful of hours); the agg is partial/final combinable.
    """
    sessions = sessions_from_events(load_table(spark, sf_dir, "events"))
    # day-tiered atoms: this query is day-granular (per-day sums and
    # day-distinct counts), so a pathological multi-day session costs
    # O(days) atoms, not O(days·24) — day atoms carry the full-day clip
    atoms = explode_to_hour_grid(
        sessions, day_tier_min_days=DAY_TIER_MIN_DAYS
    ).withColumn("day_num", F.col("day_num").cast("int"))
    # habil as a pure column expression — no bounded calendar join, so
    # sessions outside any grid range are filtered by the SAME predicate
    # the oracle applies (no silent date-bound divergence), and the
    # broadcast join disappears from the plan.
    habil = atoms.where(habil_expr(F.col("day_num")))
    agg = habil.groupBy("user_id").agg(
        (F.sum("clip_us").cast("double") / F.lit(60_000_000.0)).alias("sum_minutos"),
        F.countDistinct("day_num").cast("bigint").alias("q_dias"),
    )

    customer = load_table(spark, sf_dir, "customer")
    date_created = F.date_add(F.to_date(F.lit("2023-01-01")), (F.col("c_custkey") % 500).cast("int"))
    registrado = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("nombre"),
        F.when(date_created <= F.to_date(F.lit("2024-01-01")), F.lit(30))
        .otherwise(F.datediff(F.to_date(F.lit("2024-01-31")), date_created))
        .cast("bigint")
        .alias("dias_registrado"),
    )

    return registrado.join(agg, "user_id").select(
        "user_id",
        "nombre",
        "dias_registrado",
        "sum_minutos",
        "q_dias",
        trunc1(safe_div(F.col("sum_minutos"), F.col("q_dias"))).alias("prom"),
        trunc1(safe_div(F.col("q_dias").cast("double"), F.col("dias_registrado"))).alias("freq"),
    )


_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS count_order,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
WHERE epoch_us(l_shipdate) <= 904694400000000
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "pricing_summary",
    oracle=_PRICING_ORACLE,
    ops=("A1", "A2", "P1", "P3"),
    bench=True, driver=False)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary — the bench workhorse for grouped
    sums/counts with a pushed-down date filter (reference analog: every
    grouped-sum mart, e.g. consumo_bloques_hora.py:135-136).

    Plan check: the shipdate filter and 6-column projection reach the
    parquet scan; one shuffle for the 6-group agg with map-side combine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(28,6)")  # noqa: E731
    return (
        # Encoding-typed literal comparison (not micros() arithmetic) so
        # the filter pushes to the parquet scan whatever physical type
        # the drop shipped; wall-clock ⇒ tz-proof either way.
        li.where(F.col("l_shipdate") <= ts_lit_for(li, "l_shipdate", "1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).cast("bigint").alias("count_order"),
            F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"),
        )
    )


_FINDE_ORACLE = """
WITH sess AS (
    SELECT user_id,
           epoch_us(ts) AS s_us,
           epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT) AS e_us
    FROM events
),
atoms AS (
    SELECT s.user_id, s.s_us, s.e_us, g.i AS hour_idx
    FROM sess s, LATERAL unnest(generate_series(s.s_us // 3600000000,
                                                (s.e_us - 1) // 3600000000)) AS g(i)
    WHERE s.e_us > s.s_us
),
clipped AS (
    SELECT user_id,
           hour_idx // 24 AS day_num,
           greatest(least(e_us, (hour_idx + 1) * 3600000000)
                    - greatest(s_us, hour_idx * 3600000000), 0) AS clip_us
    FROM atoms
),
finde AS (
    SELECT user_id, day_num, clip_us
    FROM clipped c
    WHERE NOT (dayofweek(DATE '1970-01-01' + CAST(c.day_num AS INT)) BETWEEN 1 AND 5
               AND day(DATE '1970-01-01' + CAST(c.day_num AS INT)) NOT IN (7, 19))
)
SELECT user_id,
       CAST(sum(clip_us) AS DOUBLE) / 60000000.0 AS sum_minutos,
       CAST(count(DISTINCT day_num) AS BIGINT) AS q_dias,
       floor((CASE WHEN count(DISTINCT day_num) = 0 THEN 0.0
                   ELSE (CAST(sum(clip_us) AS DOUBLE) / 60000000.0)
                        / count(DISTINCT day_num) END) * 10) / 10 AS prom
FROM finde
GROUP BY user_id
"""


@register(
    "indicadores_finde",
    oracle=_FINDE_ORACLE,
    ops=("P7", "A1", "A2", "A3", "A4"),
    driver=False,  # flagship covers these ops; pytest-tier oracle
)
def indicadores_finde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekend/holiday INVERSE of the flagship — reference
    indicadores_cia.py:766-779 computes the same indicators over
    non-business days (weekends + feriados). Same exploded-atom plan;
    only the broadcast calendar filter flips (NOT habil)."""
    sessions = sessions_from_events(load_table(spark, sf_dir, "events"))
    atoms = explode_to_hour_grid(
        sessions, day_tier_min_days=DAY_TIER_MIN_DAYS
    ).withColumn("day_num", F.col("day_num").cast("int"))
    finde = atoms.where(~habil_expr(F.col("day_num")))
    agg = finde.groupBy("user_id").agg(
        (F.sum("clip_us").cast("double") / F.lit(60_000_000.0)).alias("sum_minutos"),
        F.countDistinct("day_num").cast("bigint").alias("q_dias"),
    )
    return agg.select(
        "user_id",
        "sum_minutos",
        "q_dias",
        trunc1(safe_div(F.col("sum_minutos"), F.col("q_dias"))).alias("prom"),
    )
