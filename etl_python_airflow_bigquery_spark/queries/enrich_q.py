"""Oracle-checked enrichment queries exercising the dedup-enrich-join
idiom (U1/U2) with REAL pandas UDF execution — the oracle mirrors the
pandas rule tables in SQL, so a drift between the Python rules and their
declared semantics fails the gate.

The fixtures carry no UA/IP columns, so both are derived
deterministically from ``user_id`` (FIXTURES.md mapping note) — the
derivation is part of the query on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.operators.enrich import (
    GEO_FULL_SCHEMA,
    UA_SCHEMA,
    enrich_via_distinct,
    lookup_geo_full,
    parse_user_agents,
)
from etl_python_airflow_bigquery_spark.functions import dsum, event_day_num, event_hour
from etl_python_airflow_bigquery_spark.queries import register
from etl_python_airflow_bigquery_spark.tables import load_table

_UA_POOL = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64)",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) Mobile",
    "Mozilla/5.0 (iPad; CPU OS 17_0 like Mac OS X)",
    "Mozilla/5.0 (X11; Linux x86_64)",
    "Mozilla/5.0 (Linux; Android 14) Mobile",
    "curl/8.5.0",
]

_UA_CASE_SQL = "CASE user_id % 6 " + " ".join(
    f"WHEN {i} THEN '{ua}'" for i, ua in enumerate(_UA_POOL)
) + " END"

_DEVICE_ORACLE = f"""
WITH base AS (
    SELECT user_id, value, {_UA_CASE_SQL} AS user_agent FROM events
),
parsed AS (
    SELECT user_agent,
           CASE WHEN regexp_matches(user_agent, 'iPad|Tablet') THEN 'Tablet'
                WHEN regexp_matches(user_agent, 'iPhone|Android|Mobile') THEN 'Phone'
                WHEN regexp_matches(user_agent, 'Windows|Macintosh|X11') THEN 'Desktop'
                ELSE 'Other' END AS device_type,
           CASE WHEN regexp_matches(user_agent, 'Windows') THEN 'Windows'
                WHEN regexp_matches(user_agent, 'Macintosh|iPhone|iPad') THEN 'Apple'
                WHEN regexp_matches(user_agent, 'Android') THEN 'Android'
                WHEN regexp_matches(user_agent, 'X11|Linux') THEN 'Linux'
                ELSE 'Other' END AS os_family
    FROM (SELECT DISTINCT user_agent FROM base)
)
SELECT p.device_type, p.os_family,
       CAST(count(*) AS BIGINT) AS eventos,
       CAST(sum(CAST(b.value AS DECIMAL(28,6))) AS DOUBLE) AS minutos
FROM base b JOIN parsed p ON b.user_agent = p.user_agent
GROUP BY 1, 2
"""


@register("device_enrich", oracle=_DEVICE_ORACLE, ops=("U1", "J2"))
def device_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-agent enrichment via the dedup-enrich-join idiom: the pandas
    classifier (a real mapInPandas UDF) runs over DISTINCT agents only
    — O(|agents|) Python work regardless of fact-table size — and
    broadcast-joins back (reference append_device_data,
    consumo_detalle.py:145-186)."""
    events = load_table(spark, sf_dir, "events")
    ua_expr = F.element_at(
        F.array(*[F.lit(u) for u in _UA_POOL]), (F.col("user_id") % 6 + 1).cast("int")
    )
    base = events.select("user_id", "value", ua_expr.alias("user_agent"))
    enriched = enrich_via_distinct(base, "user_agent", parse_user_agents, UA_SCHEMA)
    return enriched.groupBy("device_type", "os_family").agg(
        F.count(F.lit(1)).cast("bigint").alias("eventos"),
        dsum("value").alias("minutos"),
    )


# Expected ladder output per octet bucket ((user_id % 256) // 64), exactly
# mirroring the stand-in records + es→en fallback quirks in
# operators/enrich.py: bucket 1 falls back to the en continent name,
# bucket 2 has no subdivisions (NULL region) and no ASN, city 'Lima'
# comes from the en fallback.
_GEO_LADDER = {
    "continent_code": ("'SA'", "'SA'", "'SA'", "'NA'"),
    "continent_name": ("'Sudamérica'", "'South America'", "'Sudamérica'", "'Norteamérica'"),
    "country_code": ("'CL'", "'AR'", "'PE'", "'MX'"),
    "country_name": ("'Chile'", "'Argentina'", "'Perú'", "'México'"),
    "region_code": ("'RM'", "'C'", "NULL", "'CMX'"),
    "region_name": ("'Región Metropolitana'", "'Buenos Aires'", "NULL", "'Ciudad de México'"),
    "city_code": ("3871336", "3435910", "3936456", "3530597"),
    "city_name": ("'Santiago'", "'Buenos Aires'", "'Lima'", "'Ciudad de México'"),
    "city_lat": ("-33.45", "-34.61", "-12.05", "19.43"),
    "city_lon": ("-70.66", "-58.38", "-77.04", "-99.13"),
    "time_zone": ("'America/Santiago'", "'America/Argentina/Buenos_Aires'",
                  "'America/Lima'", "'America/Mexico_City'"),
    "asn": ("27651", "7303", "NULL", "8151"),
    "connection_type": ("'Cable/DSL'", "'Cellular'", "'Corporate'", "'Cable/DSL'"),
    "user_type": ("'residential'", "'residential'", "'business'", "'residential'"),
}

_GEO_TYPES = {"city_code": "BIGINT", "asn": "BIGINT",
              "city_lat": "DOUBLE", "city_lon": "DOUBLE"}

_GEO_CASE_COLS = ",\n           ".join(
    "CAST(CASE (user_id % 256) // 64 "
    + " ".join(f"WHEN {b} THEN {vals[b]}" for b in range(4))
    + f" END AS {_GEO_TYPES.get(col, 'VARCHAR')}) AS {col}"
    for col, vals in _GEO_LADDER.items()
)

_GEO_ORACLE = f"""
WITH base AS (
    SELECT user_id,
           {_GEO_CASE_COLS}
    FROM events
)
SELECT {", ".join(_GEO_LADDER)},
       CAST(count(*) AS BIGINT) AS eventos,
       CAST(count(DISTINCT user_id) AS BIGINT) AS usuarios
FROM base
GROUP BY ALL
"""


@register("geo_enrich", oracle=_GEO_ORACLE, ops=("U2", "J2"), driver=False)
def geo_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoIP enrichment with the FULL 15-column MaxMind ladder: distinct
    IPs → per-partition db handle (real ``maxminddb.open_database`` when
    a path is injected, deterministic stand-in offline) → es/en name
    fallback per field → broadcast join back (reference
    append_location_data, consumo_detalle.py:189-254). The oracle pins
    every ladder branch: en-name fallback, missing-subdivision NULLs,
    missing-ASN NULL."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "user_id",
        F.concat(
            F.lit("10."), (F.col("user_id") % 256).cast("string"), F.lit(".0.1")
        ).alias("request_ip"),
    )
    enriched = enrich_via_distinct(
        base, "request_ip", lookup_geo_full, GEO_FULL_SCHEMA
    )
    return enriched.groupBy(*list(_GEO_LADDER)).agg(
        F.count(F.lit(1)).cast("bigint").alias("eventos"),
        F.countDistinct("user_id").cast("bigint").alias("usuarios"),
    )


# --------------------------------------------------------------------------
# S5/S6 + A12 — GA demographic pipeline end to end
# --------------------------------------------------------------------------

from etl_python_airflow_bigquery_spark.queries.reshape import (  # noqa: E402
    RATE_METRICS_SQL,
)

_GA_PIPE_ORACLE = f"""
WITH demo AS (
    SELECT event_type AS metrica,
           CASE user_id % 4 WHEN 0 THEN 'f18-34' WHEN 1 THEN 'f35+'
                            WHEN 2 THEN 'm18-34' ELSE 'm35+' END AS demografico,
           CAST(count(*) AS DOUBLE) AS sesiones
    FROM events GROUP BY 1, 2
),
totals AS (
    SELECT event_type AS metrica,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_metric,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
)
SELECT d.metrica, d.demografico, d.sesiones,
       CASE WHEN d.metrica IN ({RATE_METRICS_SQL})
            THEN t.total_metric / t.n
            ELSE round(t.total_metric * d.sesiones
                       / (sum(d.sesiones) OVER (PARTITION BY d.metrica)))
       END AS asignado
FROM demo d JOIN totals t USING (metrica)
"""


@register("trafico_ga_pipeline", oracle=_GA_PIPE_ORACLE, ops=("S6", "A12", "A10"))
def trafico_ga_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GA traffic pipeline END TO END (reference trafico_digital.py):
    a batchGet-shaped report (dimensionHeaders/metricHeaders/rows —
    fabricated from the fixture aggregate, playing the API response)
    flows through the ga_source flattener into the proportional
    allocator. The 'API call' is a driver-side collect of a ~20-row
    aggregate — exactly the scale a report API returns; all heavy work
    stays distributed."""
    from pyspark.sql import Window

    from etl_python_airflow_bigquery_spark.sources.connectors import ga_source

    events = load_table(spark, sf_dir, "events")
    demografico = (
        F.when(F.col("user_id") % 4 == 0, "f18-34")
        .when(F.col("user_id") % 4 == 1, "f35+")
        .when(F.col("user_id") % 4 == 2, "m18-34")
        .otherwise("m35+")
    )
    small = (
        events.groupBy(
            F.col("event_type").alias("metrica"), demografico.alias("demografico")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("sesiones"))
        .collect()
    )
    report = {
        "dimensionHeaders": [{"name": "metrica"}, {"name": "demografico"}],
        "metricHeaders": [{"name": "sesiones"}],
        "rows": [
            {
                "dimensionValues": [
                    {"value": r["metrica"]},
                    {"value": r["demografico"]},
                ],
                "metricValues": [{"value": str(r["sesiones"])}],
            }
            for r in sorted(small, key=lambda r: (r["metrica"], r["demografico"]))
        ],
    }
    parsed = ga_source(
        spark, [report], "metrica STRING, demografico STRING, sesiones DOUBLE"
    )
    totals = events.groupBy(F.col("event_type").alias("metrica")).agg(
        dsum("value").alias("total_metric"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    # Rate-metric exemption (reference no_calc_cols,
    # trafico_digital.py:367-377): rate-class metrics pass their rate to
    # every split unchanged; extensive metrics allocate pro-rata.
    from etl_python_airflow_bigquery_spark.queries.reshape import RATE_METRICS

    w = Window.partitionBy("metrica")
    return (
        parsed.join(F.broadcast(totals), "metrica")
        .withColumn(
            "asignado",
            F.when(
                F.col("metrica").isin(*RATE_METRICS),
                F.col("total_metric") / F.col("n"),
            ).otherwise(
                F.round(
                    F.col("total_metric") * F.col("sesiones")
                    / F.sum("sesiones").over(w)
                )
            ),
        )
        .select("metrica", "demografico", "sesiones", "asignado")
    )


# --------------------------------------------------------------------------
# S5 — GA3 (Universal Analytics) pipeline: the OTHER report proto shape
# --------------------------------------------------------------------------

_DEMO_CASE = """CASE user_id % 4 WHEN 0 THEN 'f18-34' WHEN 1 THEN 'f35+'
                WHEN 2 THEN 'm18-34' ELSE 'm35+' END"""

_GA3_PIPE_ORACLE = f"""
WITH base AS (
    SELECT strftime(DATE '1970-01-01'
                    + CAST(epoch_us(ts) // 86400000000 AS INT), '%Y%m') AS ym,
           (epoch_us(ts) % 86400000000) // 3600000000 AS hora,
           {_DEMO_CASE} AS demografico,
           value
    FROM events
),
agg AS (
    SELECT ym, hora, demografico,
           CAST(count(*) AS DOUBLE) AS sesiones,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS minutos
    FROM base GROUP BY 1, 2, 3
),
largo AS (
    SELECT ym, hora, demografico, 'sesiones' AS variable, sesiones AS value FROM agg
    UNION ALL
    SELECT ym, hora, demografico, 'minutos', minutos FROM agg
)
SELECT CAST(strptime(ym || '01' || lpad(CAST(hora AS VARCHAR), 2, '0'),
                     '%Y%m%d%H') AS VARCHAR) AS datetime,
       variable,
       sum(CASE WHEN demografico = 'f18-34' THEN value END) AS "f18-34",
       sum(CASE WHEN demografico = 'f35+' THEN value END) AS "f35+",
       sum(CASE WHEN demografico = 'm18-34' THEN value END) AS "m18-34",
       sum(CASE WHEN demografico = 'm35+' THEN value END) AS "m35+"
FROM largo GROUP BY 1, 2
"""


@register("trafico_ga3_pipeline", oracle=_GA3_PIPE_ORACLE, ops=("S5", "A9", "A10"))
def trafico_ga3_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GA3 (Universal Analytics) traffic pipeline END TO END: a
    Reporting-API-v4-shaped response — ``columnHeader.metricHeader.
    metricHeaderEntries`` + ``data.rows[].dimensions/metrics[].values``,
    the proto HALF the reference's traffic ETL reads (reference
    trafico_digital.py:237-263) — flows through the ga3 flattener, the
    per-agg 'mes hora' datetime reassembly (yearMonth+'01'+hour,
    trafico_digital.py:277-280), the reference's 'unknown' demographic
    filter, then melt → demographic pivot. The fabricated response is a
    driver-side collect of a months×24×4 aggregate — report-API scale;
    all heavy work stays distributed."""
    from etl_python_airflow_bigquery_spark.functions import day_to_date
    from etl_python_airflow_bigquery_spark.sources.connectors import (
        ga3_assemble_datetime,
        ga3_source,
    )

    events = load_table(spark, sf_dir, "events")
    demografico = (
        F.when(F.col("user_id") % 4 == 0, "f18-34")
        .when(F.col("user_id") % 4 == 1, "f35+")
        .when(F.col("user_id") % 4 == 2, "m18-34")
        .otherwise("m35+")
    )
    small = (
        events.select(
            F.date_format(
                day_to_date(event_day_num(events).cast("int")), "yyyyMM"
            ).alias("ym"),
            event_hour(events).alias("hora"),
            demografico.alias("demografico"),
            "value",
        )
        .groupBy("ym", "hora", "demografico")
        .agg(
            F.count(F.lit(1)).cast("double").alias("sesiones"),
            dsum("value").alias("minutos"),
        )
        .collect()
    )
    rows = [
        {
            "dimensions": [r["ym"], str(r["hora"]).zfill(2), r["demografico"]],
            "metrics": [{"values": [repr(r["sesiones"]), repr(r["minutos"])]}],
        }
        for r in sorted(small, key=lambda r: (r["ym"], r["hora"], r["demografico"]))
    ]
    # GA reports carry '(unknown)' demographic rows; the reference drops
    # them post-parse (trafico_digital.py:260-261) — exercise that path.
    rows.append(
        {
            "dimensions": ["209901", "00", "unknown"],
            "metrics": [{"values": ["1.0", "1.0"]}],
        }
    )
    report = {
        "columnHeader": {
            "dimensions": ["ga:yearMonth", "ga:hour", "ga:demografico"],
            "metricHeader": {
                "metricHeaderEntries": [{"name": "sesiones"}, {"name": "minutos"}]
            },
        },
        "data": {"rows": rows},
    }
    parsed = ga3_source(
        spark,
        [report],
        "`ga:yearMonth` STRING, `ga:hour` STRING, `ga:demografico` STRING,"
        " sesiones DOUBLE, minutos DOUBLE",
    )
    parsed = parsed.where(F.col("`ga:demografico`") != "unknown")
    con_fecha = ga3_assemble_datetime(parsed, "mes hora").withColumnRenamed(
        "ga:demografico", "demografico"
    )
    largo = con_fecha.select(
        # NTZ → canonical string: pandas carries Spark timestamps at ns
        # and DuckDB's at µs precision, so the hash compares the rendered
        # wall-clock value instead of a unit-tagged dtype.
        F.col("datetime").cast("string").alias("datetime"),
        "demografico",
        F.expr(
            "stack(2, 'sesiones', sesiones, 'minutos', minutos) AS (variable, value)"
        ),
    )
    return (
        largo.groupBy("datetime", "variable")
        .pivot("demografico", ["f18-34", "f35+", "m18-34", "m35+"])
        .agg(F.sum("value"))
    )


# --------------------------------------------------------------------------
# Segment-behavior affinity — contingency lift + cleared residual test
# --------------------------------------------------------------------------

_AFINIDAD_ORACLE = """
WITH unido AS (
    SELECT c.c_mktsegment AS segmento, e.event_type
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
),
celdas AS (
    SELECT segmento, event_type, count(*) AS o FROM unido GROUP BY 1, 2
),
margenes AS (
    SELECT c.segmento, c.event_type, c.o,
           sum(c.o) OVER (PARTITION BY c.segmento) AS r,
           sum(c.o) OVER (PARTITION BY c.event_type) AS col,
           sum(c.o) OVER () AS t
    FROM celdas c
)
SELECT segmento, event_type, CAST(o AS BIGINT) AS eventos,
       CAST((1000 * o * t) // (r * col) AS BIGINT) AS lift_mili,
       CAST((CAST(o AS HUGEINT) * t - CAST(r AS HUGEINT) * col)
              * (CAST(o AS HUGEINT) * t - CAST(r AS HUGEINT) * col)
            > 4 * CAST(r AS HUGEINT) * col * t
            AND o * t > r * col AS BOOLEAN) AS sobre_representado
FROM margenes
"""


@register("afinidad_segmentos", oracle=_AFINIDAD_ORACLE, ops=("J1", "A3"),
          driver=False)
def afinidad_segmentos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEGMENT × BEHAVIOR AFFINITY — the contingency-table read-out
    marketing asks for ('does BUILDING over-index on purchases?'):
    each cell's lift against independence (floor-milli) plus an
    over-representation flag from the standardized residual CLEARED of
    divisions and square roots — z² > 4 becomes
    (O·T − R·C)² > 4·R·C·T over HUGEINT/decimal38 — the prueba_ab
    discipline applied to an R×C table. Identity mapping user_id =
    c_custkey follows the established registry precedent (core.py's
    registry joins).

    Shape: one fact⋈dim equi join (customer broadcasts at dim scale),
    a cells-sized aggregation, and window margins over R×C rows —
    events never reach the statistic."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    unido = events.join(
        F.broadcast(customer),
        events.user_id == customer.c_custkey,
    ).select(F.col("c_mktsegment").alias("segmento"), "event_type")
    celdas = unido.groupBy("segmento", "event_type").agg(
        F.count(F.lit(1)).alias("o")
    )
    ws = Window.partitionBy("segmento")
    wc = Window.partitionBy("event_type")
    wt = Window.partitionBy()
    d38 = "decimal(38,0)"
    margenes = celdas.select(
        "segmento",
        "event_type",
        "o",
        F.sum("o").over(ws).alias("r"),
        F.sum("o").over(wc).alias("col"),
        F.sum("o").over(wt).alias("t"),
    )
    desvio = (
        F.col("o").cast(d38) * F.col("t") - F.col("r").cast(d38) * F.col("col")
    )
    return margenes.select(
        "segmento",
        "event_type",
        F.col("o").cast("bigint").alias("eventos"),
        F.expr("CAST((1000 * o * t) div (r * col) AS BIGINT)").alias(
            "lift_mili"
        ),
        (
            (desvio * desvio
             > F.lit(4).cast(d38) * F.col("r").cast(d38) * F.col("col") * F.col("t"))
            & (F.col("o").cast(d38) * F.col("t") > F.col("r").cast(d38) * F.col("col"))
        ).alias("sobre_representado"),
    )
