"""Reshape-layer queries (SURVEY.md §7.1 step 4): melt/pivot, proportional
allocation, conditional aggregation, weighted-average reconstruction, and
the scalar-function census with surrogate-id generation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.functions import (
    dsum,
    event_day_num,
    safe_div,
    trunc1,
)
from etl_python_airflow_bigquery_spark.operators.intervals import (
    DAY_TIER_MIN_DAYS,
    explode_to_hour_grid,
    sessions_from_events,
)
from etl_python_airflow_bigquery_spark.queries import register
from etl_python_airflow_bigquery_spark.tables import load_table

# --------------------------------------------------------------------------
# A9 — melt / unpivot
# --------------------------------------------------------------------------

_MELT_ORACLE = """
WITH wide AS (
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price,
           CAST(count(*) AS DOUBLE) AS lineas
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, variable, value
FROM wide UNPIVOT (value FOR variable IN (sum_qty, sum_price, lineas))
"""


@register("metric_melt", oracle=_MELT_ORACLE, ops=("A9", "A1"), driver=False)
def metric_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide metrics → long (variable, value) rows — the reference's
    ``pd.melt`` step on GA traffic pulls (trafico_digital.py:282-283),
    done JVM-side with ``stack()`` (no shuffle beyond the agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("lineas"),
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(3, 'sum_qty', sum_qty, 'sum_price', sum_price, 'lineas', lineas)"
        " as (variable, value)",
    )


# --------------------------------------------------------------------------
# A10 — pivot long → wide
# --------------------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

_PIVOT_ORACLE = """
SELECT epoch_us(ts) // 86400000000 AS day_num,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS q_click,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS q_view,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS q_purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS q_signup,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS q_error
FROM events GROUP BY 1
"""


@register("trafico_pivot", oracle=_PIVOT_ORACLE, ops=("A10",), driver=False)
def trafico_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long metric rows pivoted to one wide row per day — the reference's
    ``pd.pivot(index=[datetime,variable], columns=demographic)``
    (trafico_digital.py:285-286). Explicit value list keeps the schema
    static (no extra distinct-values job) — at 100 TB an unbounded pivot
    would first scan the fact table just to learn the columns."""
    events = load_table(spark, sf_dir, "events")
    piv = (
        events.groupBy(event_day_num(events).alias("day_num"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("day_num")] + [
        F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"q_{t}")
        for t in _EVENT_TYPES
    ]
    return piv.select(*cols)


# --------------------------------------------------------------------------
# A11 — day-part block pivot (the indicadores bloque matrix)
# --------------------------------------------------------------------------

_BLOQUES = [
    ("6a7", 6, 7),
    ("7a9", 7, 9),
    ("9a12", 9, 12),
    ("12a14", 12, 14),
    ("14a18", 14, 18),
    ("18a21", 18, 21),
]  # hours 21-23 and 0-5 fall to the wrapping '21a06' block

_BLOQUES_ORACLE = """
WITH sess AS (
    SELECT user_id,
           epoch_us(ts) AS s_us,
           epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT) AS e_us
    FROM events
),
atoms AS (
    SELECT s.user_id, g.i AS hour_idx,
           greatest(least(s.e_us, (g.i + 1) * 3600000000)
                    - greatest(s.s_us, g.i * 3600000000), 0) AS clip_us
    FROM sess s, LATERAL unnest(generate_series(s.s_us // 3600000000,
                                                (s.e_us - 1) // 3600000000)) AS g(i)
    WHERE s.e_us > s.s_us
),
tagged AS (
    SELECT user_id, clip_us,
           CASE WHEN hour_idx % 24 BETWEEN 6 AND 6 THEN '6a7'
                WHEN hour_idx % 24 BETWEEN 7 AND 8 THEN '7a9'
                WHEN hour_idx % 24 BETWEEN 9 AND 11 THEN '9a12'
                WHEN hour_idx % 24 BETWEEN 12 AND 13 THEN '12a14'
                WHEN hour_idx % 24 BETWEEN 14 AND 17 THEN '14a18'
                WHEN hour_idx % 24 BETWEEN 18 AND 20 THEN '18a21'
                ELSE '21a06' END AS bloque
    FROM atoms
)
SELECT user_id,
       CAST(sum(clip_us) FILTER (bloque = '6a7') AS DOUBLE) / 60000000.0 AS sum_6a7,
       CAST(sum(clip_us) FILTER (bloque = '7a9') AS DOUBLE) / 60000000.0 AS sum_7a9,
       CAST(sum(clip_us) FILTER (bloque = '9a12') AS DOUBLE) / 60000000.0 AS sum_9a12,
       CAST(sum(clip_us) FILTER (bloque = '12a14') AS DOUBLE) / 60000000.0 AS sum_12a14,
       CAST(sum(clip_us) FILTER (bloque = '14a18') AS DOUBLE) / 60000000.0 AS sum_14a18,
       CAST(sum(clip_us) FILTER (bloque = '18a21') AS DOUBLE) / 60000000.0 AS sum_18a21,
       CAST(sum(clip_us) FILTER (bloque = '21a06') AS DOUBLE) / 60000000.0 AS sum_21a06
FROM tagged GROUP BY user_id
"""


def _bloque_col(hour: Column) -> Column:
    expr: Column | None = None
    for name, lo, hi in _BLOQUES:
        cond = hour.between(lo, hi - 1)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    assert expr is not None
    return expr.otherwise(F.lit("21a06"))


@register("bloques_pivot", oracle=_BLOQUES_ORACLE, ops=("A11", "A4", "J6"), bench=True)
def bloques_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user listening minutes pivoted across the 7 day-part blocks —
    the reference's pivot-by-filter + 7 chained merges
    (indicadores_cia.py:565-577,670-714) collapsed into ONE
    groupBy().pivot() pass: one scan + one shuffle instead of 7 filtered
    aggregations each re-merged on user_id.

    Day-tiered atoms with NO explode and NO pivot: each block's sum is
    one conditional aggregate — an hour atom contributes its clip to its
    own block, a day atom contributes the block's fixed hour quota
    (a full day covers every block exactly once) — so the whole query is
    one scan + one 7-column hash aggregation. Blocks a user never
    touches stay NULL (a when-chain without otherwise), matching the
    oracle's FILTER-over-empty semantics."""
    sessions = sessions_from_events(load_table(spark, sf_dir, "events"))
    atoms = explode_to_hour_grid(sessions, day_tier_min_days=DAY_TIER_MIN_DAYS)
    block_hours = [(n, hi - lo) for n, lo, hi in _BLOQUES] + [("21a06", 9)]
    assert sum(h for _, h in block_hours) == 24
    tagged = atoms.select(
        "user_id",
        "hour_idx",
        "clip_us",
        _bloque_col((F.col("hour_idx") % 24).cast("int")).alias("bloque"),
    )
    sums = [
        F.sum(
            F.when(
                F.col("hour_idx").isNull(), F.lit(h * 3_600_000_000).cast("long")
            ).when(F.col("bloque") == n, F.col("clip_us"))
        ).alias(n)
        for n, h in block_hours
    ]
    agg = tagged.groupBy("user_id").agg(*sums)
    return agg.select(
        "user_id",
        *[
            (F.col(n).cast("double") / F.lit(60_000_000.0)).alias(f"sum_{n}")
            for n, _ in block_hours
        ],
    )


# --------------------------------------------------------------------------
# A12 — proportional allocation
# --------------------------------------------------------------------------

# The reference's no_calc class (trafico_digital.py:367-377): avgTimeOnPage/
# bounceRate-style RATE metrics must never be pro-rata allocated — a rate
# applies to every split as-is. The synthetic estate's rate-class stand-ins:
RATE_METRICS = ("error", "signup")

# Interpolated into every oracle that mirrors the rate-metric exemption,
# so the SQL twin can never drift from the Spark-side class.
RATE_METRICS_SQL = ", ".join(f"'{m}'" for m in RATE_METRICS)

_ALLOC_ORACLE = f"""
WITH demo AS (
    SELECT event_type,
           CASE user_id % 4 WHEN 0 THEN 'f18-34' WHEN 1 THEN 'f35+'
                            WHEN 2 THEN 'm18-34' ELSE 'm35+' END AS demografico,
           CAST(count(*) AS BIGINT) AS visitas
    FROM events GROUP BY 1, 2
),
totals AS (
    SELECT event_type,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_metric,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
)
SELECT d.event_type, d.demografico, d.visitas,
       CASE WHEN d.event_type IN ({RATE_METRICS_SQL})
            THEN t.total_metric / t.n
            ELSE round(t.total_metric * d.visitas
                       / (sum(d.visitas) OVER (PARTITION BY d.event_type)))
       END AS asignado
FROM demo d JOIN totals t USING (event_type)
"""


@register("allocation_demografica", oracle=_ALLOC_ORACLE, ops=("A12", "W1"),
          driver=True)
def allocation_demografica(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribute a per-metric total across demographic splits pro-rata
    with rounding — the reference's ``unir_demograficos``
    (trafico_digital.py:356-383) — via a window sum instead of a pandas
    loop. The window partitions by the group key, so it rides the same
    shuffle as the groupBy. RATE metrics (the reference's ``no_calc_cols``
    avgTimeOnPage/bounceRate class, trafico_digital.py:367-377) are
    exempt: their per-metric rate passes through to every split
    unchanged instead of being split pro-rata."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    demografico = (
        F.when(F.col("user_id") % 4 == 0, "f18-34")
        .when(F.col("user_id") % 4 == 1, "f35+")
        .when(F.col("user_id") % 4 == 2, "m18-34")
        .otherwise("m35+")
    )
    demo = events.groupBy(
        "event_type", demografico.alias("demografico")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("visitas"))
    totals = events.groupBy("event_type").agg(
        dsum("value").alias("total_metric"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    w = Window.partitionBy("event_type")
    return (
        demo.join(F.broadcast(totals), "event_type")
        .withColumn(
            "asignado",
            F.when(
                F.col("event_type").isin(*RATE_METRICS),
                F.col("total_metric") / F.col("n"),
            ).otherwise(
                F.round(
                    F.col("total_metric") * F.col("visitas") / F.sum("visitas").over(w)
                )
            ),
        )
        .select("event_type", "demografico", "visitas", "asignado")
    )


# --------------------------------------------------------------------------
# A8 — conditional aggregation (pre-filtered branches → one pass)
# --------------------------------------------------------------------------

_CONDICIONAL_ORACLE = """
SELECT epoch_us(ts) // 86400000000 AS day_num,
       CAST(sum(CAST(value AS DECIMAL(28,6))) FILTER (event_type = 'click') AS DOUBLE)
           AS valor_click,
       CAST(sum(CAST(value AS DECIMAL(28,6))) FILTER (event_type = 'view') AS DOUBLE)
           AS valor_view,
       CAST(count(DISTINCT user_id) FILTER (event_type = 'purchase') AS BIGINT)
           AS compradores
FROM events GROUP BY 1
"""


@register("funnel_condicional", oracle=_CONDICIONAL_ORACLE, ops=("A8", "O5"))
def funnel_condicional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch metrics (start-where-vip0, stream-where-vip1) computed in a
    single scan with ``sum(when(...))`` instead of the reference's two
    filtered CTEs re-joined (email_catalogo.py:72-96)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(event_day_num(events).alias("day_num")).agg(
        dsum(F.when(F.col("event_type") == "click", F.col("value"))).alias("valor_click"),
        dsum(F.when(F.col("event_type") == "view", F.col("value"))).alias("valor_view"),
        F.countDistinct(F.when(F.col("event_type") == "purchase", F.col("user_id")))
        .cast("bigint")
        .alias("compradores"),
    )


# --------------------------------------------------------------------------
# A5 — weighted-average reconstruction (partial → final agg)
# --------------------------------------------------------------------------

_WEIGHTED_ORACLE = """
WITH base AS (
    SELECT l_returnflag, l_linestatus,
           l_extendedprice AS minutos,
           round(l_extendedprice / l_quantity) AS sesiones
    FROM lineitem WHERE l_quantity > 0
),
agg AS (
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(minutos AS DECIMAL(28,6))) AS DOUBLE) AS minutos,
           CAST(sum(CAST(sesiones AS DECIMAL(28,6))) AS DOUBLE) AS sesiones
    FROM base GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus, minutos, sesiones,
       floor((CASE WHEN sesiones = 0 THEN 0.0 ELSE minutos / sesiones END) * 10) / 10
           AS avg_minutos
FROM agg
"""


@register("liveod_weighted", oracle=_WEIGHTED_ORACLE, ops=("A5", "A3"))
def liveod_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-average reconstruction: rebuild session counts from
    minutes/avg-minutes, sum both, re-derive the average — the
    sum-of-numerator/sum-of-denominator idiom of funnel_emisor.py:161-163
    and liveod_editorial.py:257-265 (exactly Spark's partial/final agg
    shape, so map-side combine applies)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    base = li.select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_extendedprice").alias("minutos"),
        F.round(F.col("l_extendedprice") / F.col("l_quantity")).alias("sesiones"),
    )
    agg = base.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("minutos").alias("minutos"),
        dsum("sesiones").alias("sesiones"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "minutos",
        "sesiones",
        trunc1(safe_div(F.col("minutos"), F.col("sesiones"))).alias("avg_minutos"),
    )


# --------------------------------------------------------------------------
# §2.8 — scalar-function census + surrogate id generation
# --------------------------------------------------------------------------

_CENSUS_ORACLE = """
SELECT c_custkey,
       lower(c_name) || '@rdf.cl' AS email,
       upper(substring(c_mktsegment, 1, 1)) || lower(substring(c_mktsegment, 2))
           AS segmento_cap,
       regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g') AS nombre_limpio,
       substring(c_mktsegment, 1, 3) AS seg3,
       md5(c_name || '|' || c_mktsegment) AS huella,
       floor(c_acctbal * 10) / 10 AS saldo_trunc,
       round(c_acctbal) AS saldo_round,
       abs(c_acctbal) AS saldo_abs,
       CAST(trunc(c_acctbal) AS BIGINT) AS saldo_int,
       CASE WHEN c_acctbal < 0 THEN 'deudor' ELSE 'acreedor' END AS estado
FROM customer
"""


@register("scalar_census", oracle=_CENSUS_ORACLE, ops=("P2",), driver=False)
def scalar_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per user exercising the reference's scalar-function census
    (SURVEY.md §2.8): concat, lower/initcap, regexp_replace, substring,
    md5 fingerprint (consumo_registrados.py:113), TRUNC(x,1)
    (indicadores_cia.py:245-246), round/abs/cast, CASE recode. All pure
    Column exprs — whole-stage codegen, no UDFs."""
    customer = load_table(spark, sf_dir, "customer")
    # saldo_int: Spark CAST(double AS BIGINT) truncates toward zero while
    # DuckDB's CAST rounds, so the oracle wraps it in trunc() explicitly.
    return customer.select(
        "c_custkey",
        F.concat(F.lower("c_name"), F.lit("@rdf.cl")).alias("email"),
        F.initcap(F.lower("c_mktsegment")).alias("segmento_cap"),
        F.regexp_replace("c_name", "[^A-Za-z0-9]", "").alias("nombre_limpio"),
        F.substring("c_mktsegment", 1, 3).alias("seg3"),
        F.md5(F.concat_ws("|", "c_name", "c_mktsegment")).alias("huella"),
        trunc1(F.col("c_acctbal")).alias("saldo_trunc"),
        F.round("c_acctbal").alias("saldo_round"),
        F.abs("c_acctbal").alias("saldo_abs"),
        F.col("c_acctbal").cast("bigint").alias("saldo_int"),
        F.when(F.col("c_acctbal") < 0, "deudor").otherwise("acreedor").alias("estado"),
    )
