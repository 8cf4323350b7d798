"""Small dimension builders.

These mirror the reference's ``diccionarios.*`` tables (SURVEY.md §1.1) —
vip thresholds, day-part blocks, age brackets, business-day calendars.
All are at most a few thousand rows, so every join against them should be
(and is, via explicit ``F.broadcast``) a broadcast hash join: at 100 TB the
fact side streams through map tasks with zero shuffle for these lookups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.functions import day_to_date

# Reference dicc_vips: minute thresholds for the vip funnel tiers vip0..vip40
# (audio_digital.py:395-396, README.md:9).
VIP_TIERS = [0, 1, 5, 20, 40]

# Reference dicc_tramo_etario: age brackets
# (Complex_user_superposition_by_hour_etl.ipynb cell 7).
AGE_BRACKETS = [
    ("13 a 17", 13, 17),
    ("18 a 24", 18, 24),
    ("25 a 34", 25, 34),
    ("35 a 44", 35, 44),
    ("45 a 54", 45, 54),
    ("55 a 64", 55, 64),
    ("65 o mas", 65, 200),
]

# Reference dicc_bloque: 7 labeled day-part hour ranges, last one wrapping
# past midnight ('21 a 06') (indicadores_cia.py:637-645, 670-714).
DAY_PART_BLOCKS = [
    ("6 a 7", 6, 7),
    ("7 a 9", 7, 9),
    ("9 a 12", 9, 12),
    ("12 a 14", 12, 14),
    ("14 a 18", 14, 18),
    ("18 a 21", 18, 21),
    ("21 a 06", 21, 30),  # wraps: hours 21-23 plus 0-5 (encoded as 24..29)
]

# Deterministic holiday rule for the synthetic calendar: day-of-month 7 and
# 19 are feriados (stands in for dicc_feriados_interferiados,
# indicadores_cia.py:140-143 / the gob.cl holidays API of programas_live.py:278-282).
FERIADO_DAYS_OF_MONTH = (7, 19)

# Reference dicc_programas (Complex_user_superposition_by_program_etl.ipynb
# cell 3): the program-airing dictionary. Each program carries its content
# key, official start/end as MINUTES from midnight (reference stores TIME
# columns `inicio_oficial`/`fin_oficial`), a ``dias`` weekday ARRAY that the
# query consumes via membership (the reference's
# ``EXTRACT(dayofweek FROM fecha) IN (SELECT dias FROM UNNEST(dicc.dias))``
# idiom — SURVEY X8, rewritten as ``array_contains``), and an ``activo``
# flag. ``dias`` uses DuckDB's dayofweek convention 0=Sunday..6=Saturday;
# the Spark side compares ``dayofweek(fecha) - 1``. Boundaries are
# deliberately NOT hour-aligned so the oficial/ipsos timetable switch
# (programas_live.py:104-123) produces genuinely different intervals.
PROGRAMAS = [
    # programa, soporte, content_id, inicio_min, fin_min, dias, activo
    ("Matinal Clicks", "digital", "click", 420, 570, (1, 2, 3, 4, 5), True),
    ("Clicks PM", "digital", "click", 540, 660, (1, 2, 3, 4, 5), True),
    ("Panorama Clicks", "digital", "click", 600, 750, (0, 6), True),
    ("Vista Temprana", "digital", "view", 0, 90, (0, 1, 2, 3, 4, 5, 6), True),
    ("Vista Continua", "digital", "view", 60, 240, (1, 3, 5), True),
    ("Compras Live", "radio", "purchase", 480, 615, (1, 2, 3, 4, 5, 6), True),
    ("Compras Trasnoche", "radio", "purchase", 570, 720, (2, 4), True),
    ("Alta Registro", "radio", "signup", 300, 480, (0, 2, 4, 6), True),
    ("Registro Doble", "radio", "signup", 450, 630, (0, 3, 6), True),
    ("Fallas al Aire", "podcast", "error", 690, 810, (1, 2, 3, 4, 5), True),
    ("Fallas Extendido", "podcast", "error", 750, 900, (3, 5), True),
    ("Archivo Muerto", "podcast", "error", 0, 1440, (0, 1, 2, 3, 4, 5, 6), False),
]


def values_dim(spark: SparkSession, rows: list[tuple], cols: list[str]) -> DataFrame:
    """Tiny literal dim as a SQL VALUES LocalRelation — stays entirely
    JVM-side (a ``spark.createDataFrame`` on Python tuples becomes a
    Python-RDD scan with unknown stats, which defeats broadcast planning
    and re-serializes through Python on every run)."""
    fmt = lambda v: f"'{v}'" if isinstance(v, str) else str(v)  # noqa: E731
    values = ", ".join("(" + ", ".join(fmt(v) for v in row) + ")" for row in rows)
    return spark.sql(f"SELECT * FROM (VALUES {values}) AS t({', '.join(cols)})")


def vips_dim(spark: SparkSession) -> DataFrame:
    return values_dim(spark, [(v,) for v in VIP_TIERS], ["vip"])


def age_brackets_dim(spark: SparkSession) -> DataFrame:
    return values_dim(spark, AGE_BRACKETS, ["tramo", "edad_inf", "edad_sup"])


def day_part_blocks_dim(spark: SparkSession) -> DataFrame:
    return values_dim(spark, DAY_PART_BLOCKS, ["bloque", "hora_inicio", "hora_fin"])


def programas_dim(spark: SparkSession) -> DataFrame:
    """``dicc_programas`` as a literal VALUES LocalRelation, ``dias`` as a
    real ``array<int>`` column (SURVEY §1.2 ARRAY row). Same
    stay-JVM-side rationale as ``values_dim``; arrays need their own
    literal syntax so it gets its own builder."""
    rows = ", ".join(
        f"('{p}', '{s}', '{c}', {i}, {f}, array({', '.join(map(str, d))}), {str(a).lower()})"
        for p, s, c, i, f, d, a in PROGRAMAS
    )
    return spark.sql(
        "SELECT * FROM (VALUES "
        + rows
        + ") AS t(programa, soporte, content_id, inicio_min, fin_min, dias, activo)"
    )


def habil_expr(day_num: Column) -> Column:
    """Business-day flag as a pure column expression on an epoch-day int —
    the unbounded form of ``day_grid``'s ``habil`` column. Queries that
    only need the flag use this instead of joining the bounded calendar
    dim, so sessions outside the grid range are never silently dropped
    (and the broadcast join disappears from the plan)."""
    fecha = day_to_date(day_num)
    return F.dayofweek(fecha).between(2, 6) & ~F.dayofmonth(fecha).isin(
        *FERIADO_DAYS_OF_MONTH
    )


def day_grid(spark: SparkSession, start_day: int, end_day: int) -> DataFrame:
    """All epoch-days in [start_day, end_day] with calendar attributes —
    the engine's dicc_fechas/dicc_feriados stand-in. Generated with
    sequence()+explode (the Spark form of GENERATE_DATE_ARRAY+UNNEST used
    in the superposition notebooks, cell 2)."""
    df = spark.range(1).select(
        F.explode(F.sequence(F.lit(start_day), F.lit(end_day))).alias("day_num")
    )
    fecha = day_to_date(F.col("day_num"))
    return df.select(
        F.col("day_num"),
        fecha.alias("fecha"),
        F.dayofweek(fecha).alias("dow"),  # 1=Sunday .. 7=Saturday
        F.dayofmonth(fecha).isin(*FERIADO_DAYS_OF_MONTH).alias("feriado"),
    ).withColumn(
        # business day = Mon..Fri and not a holiday (reference
        # indicadores_cia.py:143-148: `dia between 2 and 6`, feriado false)
        "habil",
        F.col("dow").between(2, 6) & ~F.col("feriado"),
    )
